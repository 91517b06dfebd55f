"""L7 flight-eval tooling: record -> analyze -> replay round-trip.

The reference's L7 layer (Vicon/MAVLink flight evaluation, SURVEY §2 L7) is
stripped from its mount; this pins our equivalent contract: the CSV flight
log schema, hover metrics, crash detection, and the sim-replay
(system-identification) divergence check."""

import json

import numpy as np

from raptor_tpu.apps import flight_eval
from raptor_tpu.utils import flightlog


def test_record_analyze_replay_roundtrip(tmp_path, capsys):
    log_path = tmp_path / "flight.csv"
    flight_eval.main(
        ["record", str(log_path), "--shipped", "--hover-start",
         "--steps", "120", "--seed", "1"]
    )
    log = flightlog.read_csv(str(log_path))
    # 120 integrated steps + the terminal state row (the frame `analyze`
    # needs to see a crash, were there one)
    assert len(log.t_us) == 121
    assert log.action is not None and log.action.shape == (121, 4)
    # quaternions stay normalized through the CSV round-trip
    np.testing.assert_allclose(
        np.linalg.norm(log.orientation, axis=1), 1.0, atol=1e-4
    )

    report_path = tmp_path / "analysis.json"
    flight_eval.main(
        ["analyze", str(log_path), "--out", str(report_path)]
    )
    report = json.loads(report_path.read_text())
    # the shipped policy hovers: sub-meter RMSE, no crash, 100 Hz log
    assert not report["crashed"]
    assert report["position_rmse_m"] < 0.6
    assert abs(report["rate_hz"] - 100.0) < 1.0
    assert report["n_samples"] == 121

    replay_path = tmp_path / "replay.json"
    flight_eval.main(
        ["replay", str(log_path), "--out", str(replay_path)]
    )
    replay = json.loads(replay_path.read_text())
    # a sim-recorded log replayed through the same dynamics must not
    # diverge (this is the sim2real gap metric; here the "real" system IS
    # the sim, so the gap is numerical only)
    assert replay["divergence_final_m"] < 1e-2, replay


def test_recorded_crash_is_detected(tmp_path):
    """A flight that terminates mid-record must leave its out-of-bounds
    terminal state in the log so analyze reports crashed=True (regression:
    the recorder used to drop the crash frame)."""
    import jax

    from raptor_tpu.checkpoint import h5 as ckpt_h5
    from raptor_tpu.policy import network as student_net

    bad = tmp_path / "untrained.h5"
    ckpt_h5.save_actor(str(bad), student_net.init_params(jax.random.key(7)))
    log_path = tmp_path / "crash_flight.csv"
    flight_eval.main(
        ["record", str(log_path), "--checkpoint", str(bad),
         "--steps", "400", "--seed", "2"]
    )
    log = flightlog.read_csv(str(log_path))
    assert len(log.t_us) < 401  # an untrained policy cannot fly 4 s
    report_path = tmp_path / "crash_analysis.json"
    flight_eval.main(["analyze", str(log_path), "--out", str(report_path)])
    assert json.loads(report_path.read_text())["crashed"]


def test_analyze_detects_crash(tmp_path):
    t = np.arange(50, dtype=np.int64) * 10_000
    pos = np.zeros((50, 3), np.float32)
    pos[40:, 2] = -2.0  # falls out of the arena (bound 0.6 m)
    quat = np.tile(np.array([1, 0, 0, 0], np.float32), (50, 1))
    vel = np.zeros((50, 3), np.float32)
    log = flightlog.FlightLog(
        t_us=t, position=pos, orientation=quat,
        linear_velocity=vel, angular_velocity=vel, action=None,
    )
    path = tmp_path / "crash.csv"
    flightlog.write_csv(str(path), log)
    flight_eval.main(["analyze", str(path), "--out", str(path) + ".json"])
    report = json.loads((tmp_path / "crash.csv.json").read_text())
    assert report["crashed"]
    assert report["position_max_excursion_m"] > 1.9


def test_mocap_only_log_roundtrip(tmp_path):
    """Logs without action columns (pure mocap) read back correctly."""
    t = np.arange(10, dtype=np.int64) * 10_000
    z = np.zeros((10, 3), np.float32)
    quat = np.tile(np.array([1, 0, 0, 0], np.float32), (10, 1))
    log = flightlog.FlightLog(
        t_us=t, position=z, orientation=quat,
        linear_velocity=z, angular_velocity=z, action=None,
    )
    path = tmp_path / "mocap.csv"
    flightlog.write_csv(str(path), log)
    back = flightlog.read_csv(str(path))
    assert back.action is None
    np.testing.assert_array_equal(back.t_us, t)

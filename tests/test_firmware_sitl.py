"""Software-in-the-loop firmware test: the full embedded artifact chain
(policy blob header -> inference executor -> firmware control task) compiled
with gcc/g++ and flown closed-loop against the simulator.

This is the hardware-free counterpart of the reference's
`embedded_platforms/` firmware integrations (reference README:107-167):
the firmware side owns obs assembly from the state estimate, throttle
de-normalization, boot self-test gating, and the failsafe latch; the sim
plays the flight controller's estimator + actuators at a 400 Hz call rate
against the 100 Hz policy (FORCE_SYNC_NATIVE=4, README:146-153)."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.checkpoint import code_export, h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, L2F
from raptor_tpu.env import presets
from raptor_tpu.env.types import InitConfig
from raptor_tpu.inference import Firmware, build_firmware
from raptor_tpu.policy import shipped_checkpoint_path

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("gcc") is None,
    reason="native toolchain not available",
)


@pytest.fixture(scope="module")
def firmware(tmp_path_factory):
    path = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(path)
    ex_in, ex_out = ckpt_h5.load_example_io(path)
    header = tmp_path_factory.mktemp("fw") / "policy_checkpoint.h"
    code_export.export_header_file(
        str(header), params, ex_in, ex_out, checkpoint_name="shipped"
    )
    so = build_firmware(str(header))
    return Firmware(so)


def test_boot_self_test(firmware):
    assert firmware.boot_status == Firmware.OK


def test_step_before_boot_is_failsafe(tmp_path):
    """A control call before boot must keep motors at zero."""
    path = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(path)
    ex_in, ex_out = ckpt_h5.load_example_io(path)
    header = tmp_path / "policy_checkpoint.h"
    code_export.export_header_file(str(header), params, ex_in, ex_out)
    so = build_firmware(str(header), out_path=str(tmp_path / "fw.so"))
    import ctypes

    lib = ctypes.CDLL(so)
    lib.raptor_fw_step.restype = ctypes.c_int
    est = np.zeros(13, np.float32)
    thr = np.ones(4, np.float32)
    status = lib.raptor_fw_step(
        ctypes.c_uint64(0),
        est.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        thr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert status == Firmware.NOT_BOOTED
    np.testing.assert_array_equal(thr, 0.0)


def test_sitl_flight_500_steps(firmware):
    """The compiled firmware flies a crazyflie in our sim for a full
    500-step episode (5 s) from a gentle initial attitude: 4 firmware calls
    per 10 ms sim step (400 Hz), throttle mapped back to the sim's [-1, 1]
    motor command frame."""
    fw = firmware
    fw.reset()
    env = L2F(EnvConfig(init=InitConfig(max_angle=0.5)))
    params = presets.crazyflie()
    es, _ = jax.jit(env.reset)(jax.random.key(4), params)
    step = jax.jit(env.step)

    state = es.dynamics
    t_us = 0
    throttle = np.full(4, 0.5, np.float32)
    for t in range(500):
        # 400 Hz control task; the sim's state estimate is exact
        for j in range(4):
            throttle, status = fw.step(
                t_us,
                np.asarray(state.position),
                np.asarray(state.orientation),
                np.asarray(state.linear_velocity),
                np.asarray(state.angular_velocity),
            )
            assert status == Firmware.OK, f"failsafe at t={t}.{j}"
            t_us += 2500
        action = 2.0 * throttle - 1.0  # back to the sim's motor frame
        es, _, _, done, info = step(params, es, jnp.asarray(action))
        assert not bool(info["terminated"]), f"crashed at step {t}"
        state = es.dynamics
    # flew the full episode and stayed in the arena
    assert float(jnp.linalg.norm(state.position)) < 5.0


def test_timing_fault_latches_failsafe(tmp_path):
    """A gross timing violation (watchdog level 3) must zero the motors and
    latch until raptor_fw_reset()."""
    path = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(path)
    ex_in, ex_out = ckpt_h5.load_example_io(path)
    header = tmp_path / "policy_checkpoint.h"
    code_export.export_header_file(str(header), params, ex_in, ex_out)
    so = build_firmware(str(header), out_path=str(tmp_path / "fw.so"))
    fw = Firmware(so)
    assert fw.boot_status == Firmware.OK
    obs = np.zeros(3, np.float32)
    quat = np.array([1, 0, 0, 0], np.float32)
    vel = np.zeros(3, np.float32)

    thr, status = fw.step(0, obs, quat, vel, vel)
    assert status == Firmware.OK
    # second call 1 s late: interval 400x the 2.5 ms contract -> level 3
    thr, status = fw.step(1_000_000, obs, quat, vel, vel)
    assert status == Firmware.FAILSAFE
    np.testing.assert_array_equal(thr, 0.0)
    # latched: even a perfectly-timed next call stays in failsafe
    thr, status = fw.step(1_002_500, obs, quat, vel, vel)
    assert status == Firmware.FAILSAFE
    np.testing.assert_array_equal(thr, 0.0)
    # reset clears the latch
    fw.reset()
    thr, status = fw.step(1_005_000, obs, quat, vel, vel)
    assert status == Firmware.OK

"""Platform-adapter SITL tests: the reference's embedded_platforms/
integrations (PX4 / Betaflight / Crazyflie / M5StampFly, reference
README:107-110) as a parameterized C99 layer (native/firmware/
raptor_platform.c) driven in each platform's own frame/unit/motor
conventions against the simulator."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raptor_tpu.checkpoint import code_export, h5 as ckpt_h5
from raptor_tpu.env import EnvConfig, L2F, presets
from raptor_tpu.env.maths import quat_to_rotm
from raptor_tpu.env.types import InitConfig
from raptor_tpu.inference import Firmware, PlatformFirmware, build_firmware
from raptor_tpu.policy import shipped_checkpoint_path

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or shutil.which("gcc") is None,
    reason="native toolchain not available",
)


def _build(tmp_path, name):
    path = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(path)
    ex_in, ex_out = ckpt_h5.load_example_io(path)
    header = tmp_path / "policy_checkpoint.h"
    if not header.exists():
        code_export.export_header_file(str(header), params, ex_in, ex_out)
    return build_firmware(str(header), out_path=str(tmp_path / name))


def flu_to_ned_frd(pos, quat_wxyz, vel, gyro_rad):
    """FLU world/body -> NED world / FRD body: conjugation by
    diag(1,-1,-1) (involutive — the same map inverts itself)."""
    flip = np.array([1.0, -1.0, -1.0], np.float32)
    q = np.asarray(quat_wxyz, np.float32)
    return (
        np.asarray(pos, np.float32) * flip,
        np.array([q[0], q[1], -q[2], -q[3]], np.float32),
        np.asarray(vel, np.float32) * flip,
        np.asarray(gyro_rad, np.float32) * flip,
    )


def test_quat_flip_matches_matrix_conjugation():
    """The C adapter's quaternion transform q -> (w, x, -y, -z) IS the
    matrix identity R_flu = C R_ned C with C = diag(1,-1,-1)."""
    key = jax.random.key(0)
    q = jax.random.normal(key, (16, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = jax.vmap(quat_to_rotm)(q)
    q_flip = q * jnp.array([1.0, 1.0, -1.0, -1.0])
    R_flip = jax.vmap(quat_to_rotm)(q_flip)
    C = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    np.testing.assert_allclose(
        np.asarray(R_flip), np.asarray(C @ R @ C), atol=1e-6
    )


def test_px4_adapter_equals_direct_path(tmp_path):
    """Feeding the PX4 adapter NED/FRD-converted state reproduces the
    direct FLU control-task path bit-for-bit (after un-mapping PWM)."""
    so_direct = _build(tmp_path, "fw_direct.so")
    so_px4 = _build(tmp_path, "fw_px4.so")
    direct = Firmware(so_direct)
    px4 = PlatformFirmware(so_px4, PlatformFirmware.PX4)
    assert direct.boot_status == Firmware.OK
    assert px4.boot_status == Firmware.OK
    px4.arm()

    rng = np.random.default_rng(3)
    t_us = 0
    for _ in range(20):
        pos = rng.normal(0, 0.2, 3).astype(np.float32)
        q = rng.normal(0, 1, 4).astype(np.float32)
        q /= np.linalg.norm(q)
        vel = rng.normal(0, 0.3, 3).astype(np.float32)
        gyro = rng.normal(0, 0.5, 3).astype(np.float32)

        thr, st_a = direct.step(t_us, pos, q, vel, gyro)
        n_pos, n_q, n_vel, n_gyro = flu_to_ned_frd(pos, q, vel, gyro)
        pwm, st_b = px4.step(t_us, n_pos, n_q, n_vel, n_gyro)
        assert st_a == st_b == Firmware.OK
        # invert the PX4 output map: PWM 1000..2000 with 5% armed idle floor
        t_norm = (pwm - 1000.0) / 1000.0
        thr_back = (t_norm - 0.05) / 0.95
        np.testing.assert_allclose(thr_back, thr, atol=1e-5)
        t_us += 2500  # the 400 Hz intermediate-call timing contract


def test_crazyflie_units_and_quat_order(tmp_path):
    """Crazyflie conventions: (x,y,z,w) quaternion + deg/s gyro + 16-bit
    motor outputs reproduce the direct path."""
    so_direct = _build(tmp_path, "fw_direct.so")
    so_cf = _build(tmp_path, "fw_cf.so")
    direct = Firmware(so_direct)
    cf = PlatformFirmware(so_cf, PlatformFirmware.CRAZYFLIE)
    assert cf.boot_status == Firmware.OK
    cf.arm()

    rng = np.random.default_rng(5)
    t_us = 0
    for _ in range(10):
        pos = rng.normal(0, 0.2, 3).astype(np.float32)
        q = rng.normal(0, 1, 4).astype(np.float32)
        q /= np.linalg.norm(q)
        vel = rng.normal(0, 0.3, 3).astype(np.float32)
        gyro = rng.normal(0, 0.5, 3).astype(np.float32)

        thr, _ = direct.step(t_us, pos, q, vel, gyro)
        q_xyzw = np.array([q[1], q[2], q[3], q[0]], np.float32)
        duty, st = cf.step(t_us, pos, q_xyzw, vel,
                           np.degrees(gyro).astype(np.float32))
        assert st == Firmware.OK
        np.testing.assert_allclose(duty / 65535.0, thr, atol=1e-4)
        t_us += 2500


def test_arming_state_machine(tmp_path):
    """Disarmed: outputs at the floor and the policy does not advance.
    Disarm clears the recurrent state — a rearm replays a fresh boot."""
    so = _build(tmp_path, "fw_arm.so")
    fw = PlatformFirmware(so, PlatformFirmware.PX4)
    assert fw.boot_status == Firmware.OK

    pos = np.zeros(3, np.float32)
    q = np.array([1, 0, 0, 0], np.float32)
    vel = np.zeros(3, np.float32)
    clock = {"t": 0}

    def native_step():
        """One policy-native 10 ms window = 4 calls at the 2.5 ms
        contract; returns the last output."""
        for _ in range(4):
            out, st = fw.step(clock["t"], pos, q, vel, vel)
            clock["t"] += 2500
        return out, st

    # disarmed: floor output, OK status, no policy advance
    out, st = native_step()
    assert st == Firmware.OK and not fw.armed
    np.testing.assert_array_equal(out, 1000.0)

    # arming resets the timing baseline: even a LATE arm (t well past
    # boot) must not trip the first-interval watchdog
    clock["t"] += 1_000_000
    fw.arm()
    first, st = native_step()
    assert st == Firmware.OK
    assert np.any(first != 1000.0)
    second, _ = native_step()
    # GRU state advanced: same obs, different hidden -> different output
    assert np.any(second != first)

    # disarm + rearm: hidden state cleared, first step reproduces arming
    fw.disarm()
    out, _ = native_step()
    np.testing.assert_array_equal(out, 1000.0)
    fw.arm()
    again, _ = native_step()
    np.testing.assert_allclose(again, first, atol=1e-5)


def test_sitl_flight_px4_ned_conventions(tmp_path):
    """Closed-loop 500-step crazyflie flight entirely through the PX4
    adapter: sim state converted FLU->NED/FRD every call, motor PWM
    converted back — the double frame conversion must be flight-exact."""
    so = _build(tmp_path, "fw_sitl.so")
    fw = PlatformFirmware(so, PlatformFirmware.PX4)
    assert fw.boot_status == Firmware.OK
    fw.arm()

    env = L2F(EnvConfig(init=InitConfig(max_angle=0.5)))
    params = presets.crazyflie()
    es, _ = jax.jit(env.reset)(jax.random.key(4), params)
    step = jax.jit(env.step)

    state = es.dynamics
    t_us = 0
    for t in range(500):
        for _ in range(4):  # 400 Hz platform loop
            n_pos, n_q, n_vel, n_gyro = flu_to_ned_frd(
                np.asarray(state.position),
                np.asarray(state.orientation),
                np.asarray(state.linear_velocity),
                np.asarray(state.angular_velocity),
            )
            pwm, status = fw.step(t_us, n_pos, n_q, n_vel, n_gyro)
            assert status == Firmware.OK, f"failsafe at t={t}"
            t_us += 2500
        throttle = ((pwm - 1000.0) / 1000.0 - 0.05) / 0.95
        action = 2.0 * throttle - 1.0
        es, _, _, done, info = step(params, es, jnp.asarray(action))
        assert not bool(info["terminated"]), f"crashed at step {t}"
        state = es.dynamics
    assert float(jnp.linalg.norm(state.position)) < 5.0

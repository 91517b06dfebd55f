"""Build + ctypes binding for the native (C++) inference executor.

Pipeline: export the policy to a standalone C++ header
(`checkpoint.code_export`), compile `native/executor.cpp` against it with
g++ into a shared library, and drive it through ctypes — the same artifact
chain as the reference's firmware deployment (policy.h blob + executor +
C ABI, README:107-167), testable on the host.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_EXECUTOR_CPP = os.path.join(_REPO_ROOT, "native", "executor.cpp")
_FIRMWARE_DIR = os.path.join(_REPO_ROOT, "native", "firmware")
_BUILD_DIR = os.path.join(_REPO_ROOT, ".cache", "native")


def _content_tag(*paths: str) -> str:
    """Cache key over ALL compiled sources (a stale .so keyed only on the
    policy header would silently ignore executor/firmware C edits)."""
    h = hashlib.sha256()
    for p in paths:
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def build_executor(policy_header_path: str, out_path: Optional[str] = None) -> str:
    """Compile the executor against a generated policy header; returns the
    .so path (cached by content hash)."""
    tag = _content_tag(policy_header_path, _EXECUTOR_CPP)
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = out_path or os.path.join(_BUILD_DIR, f"libraptor_executor_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-include", policy_header_path,
        _EXECUTOR_CPP, "-o", so_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def build_firmware(policy_header_path: str, out_path: Optional[str] = None) -> str:
    """Compile the firmware control task (C99, `native/firmware/`) together
    with the inference executor against a generated policy header.

    This is the full firmware artifact chain of the reference's
    `embedded_platforms/` integrations (README:107-167): policy blob header
    + inference executor + firmware-side control task (obs assembly, mixer
    de-normalization, boot self-test, failsafe), built host-side so the
    software-in-the-loop test can fly it against the simulator."""
    task_c = os.path.join(_FIRMWARE_DIR, "raptor_control_task.c")
    task_h = os.path.join(_FIRMWARE_DIR, "raptor_control_task.h")
    platform_c = os.path.join(_FIRMWARE_DIR, "raptor_platform.c")
    platform_h = os.path.join(_FIRMWARE_DIR, "raptor_platform.h")
    tag = _content_tag(policy_header_path, _EXECUTOR_CPP, task_c, task_h,
                       platform_c, platform_h)
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = out_path or os.path.join(_BUILD_DIR, f"libraptor_firmware_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    obj_task = so_path + ".task.o"
    obj_platform = so_path + ".platform.o"
    obj_exec = so_path + ".exec.o"
    # the control task + platform adapters are firmware-grade C99 (-Os,
    # static allocation only); the executor is C++17 carrying the policy blob
    for src, obj in ((task_c, obj_task), (platform_c, obj_platform)):
        subprocess.run(
            ["gcc", "-Os", "-std=c99", "-fPIC", "-I", _FIRMWARE_DIR,
             "-c", src, "-o", obj],
            check=True, capture_output=True,
        )
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-fPIC", "-include", policy_header_path,
         "-c", _EXECUTOR_CPP, "-o", obj_exec],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["g++", "-shared", obj_task, obj_platform, obj_exec, "-o", so_path],
        check=True, capture_output=True,
    )
    for obj in (obj_task, obj_platform, obj_exec):
        os.remove(obj)
    return so_path


class Firmware:
    """ctypes wrapper over the compiled firmware control task (SITL side)."""

    OK, SELF_TEST_FAILED, NOT_BOOTED, FAILSAFE = 0, 1, 2, 3

    def __init__(self, so_path: str, skip_self_test: bool = False):
        self.lib = ctypes.CDLL(so_path)
        self.lib.raptor_fw_boot.argtypes = [ctypes.c_int]
        self.lib.raptor_fw_boot.restype = ctypes.c_int
        self.lib.raptor_fw_step.argtypes = [
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.raptor_fw_step.restype = ctypes.c_int
        self.lib.raptor_fw_last_inference_status.restype = ctypes.c_int
        self.boot_status = self.lib.raptor_fw_boot(1 if skip_self_test else 0)

    def step(
        self,
        time_us: int,
        position: np.ndarray,
        orientation_wxyz: np.ndarray,
        linear_velocity: np.ndarray,
        angular_velocity: np.ndarray,
    ) -> tuple[np.ndarray, int]:
        """One control-loop call; returns ([4] throttle in [0,1], status)."""
        est = np.concatenate(
            [position, orientation_wxyz, linear_velocity, angular_velocity]
        ).astype(np.float32)
        throttle = np.zeros(4, np.float32)
        status = self.lib.raptor_fw_step(
            int(time_us),
            est.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            throttle.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return throttle, status

    def reset(self):
        self.lib.raptor_fw_reset()

    @property
    def last_inference_status(self) -> int:
        return int(self.lib.raptor_fw_last_inference_status())


class PlatformFirmware:
    """ctypes wrapper over the platform-adapter layer (raptor_platform.h):
    the reference's embedded_platforms/ integrations (PX4 / Betaflight /
    Crazyflie / M5StampFly, reference README:107-110) driven SITL in each
    platform's own frame/unit/motor conventions."""

    PX4, BETAFLIGHT, CRAZYFLIE, M5STAMPFLY = 0, 1, 2, 3

    def __init__(self, so_path: str, platform: int,
                 skip_self_test: bool = False):
        self.lib = ctypes.CDLL(so_path)
        self.lib.raptor_platform_boot.argtypes = [ctypes.c_int, ctypes.c_int]
        self.lib.raptor_platform_boot.restype = ctypes.c_int
        self.lib.raptor_platform_step.argtypes = [
            ctypes.c_uint64] + [ctypes.POINTER(ctypes.c_float)] * 5
        self.lib.raptor_platform_step.restype = ctypes.c_int
        self.lib.raptor_platform_is_armed.restype = ctypes.c_int
        self.boot_status = self.lib.raptor_platform_boot(
            platform, 1 if skip_self_test else 0
        )

    def arm(self):
        self.lib.raptor_platform_arm()

    def disarm(self):
        self.lib.raptor_platform_disarm()

    @property
    def armed(self) -> bool:
        return bool(self.lib.raptor_platform_is_armed())

    def step(
        self,
        time_us: int,
        position: np.ndarray,
        quat: np.ndarray,
        velocity: np.ndarray,
        gyro: np.ndarray,
    ) -> tuple[np.ndarray, int]:
        """One call in the PLATFORM's conventions; returns ([4] motor
        outputs in the platform's range/order, status)."""
        fp = ctypes.POINTER(ctypes.c_float)
        arrs = [np.ascontiguousarray(a, np.float32)
                for a in (position, quat, velocity, gyro)]
        motor = np.zeros(4, np.float32)
        status = self.lib.raptor_platform_step(
            int(time_us), *(a.ctypes.data_as(fp) for a in arrs),
            motor.ctypes.data_as(fp),
        )
        return motor, status


class NativeExecutor:
    """ctypes wrapper over the compiled executor shared library."""

    STATUS_TIMING_L1 = 1 << 0
    STATUS_TIMING_L2 = 1 << 1
    STATUS_TIMING_L3 = 1 << 2
    STATUS_SELF_TEST_FAILED = 1 << 3

    def __init__(self, so_path: str, skip_test: bool = False):
        self.lib = ctypes.CDLL(so_path)
        self.lib.raptor_inference_init.argtypes = [ctypes.c_int]
        self.lib.raptor_inference_init.restype = ctypes.c_int
        self.lib.raptor_inference_l2f_control.argtypes = [
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.raptor_inference_l2f_control.restype = ctypes.c_int
        self.lib.raptor_inference_self_test.restype = ctypes.c_float
        self.lib.raptor_inference_timing_stats.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        self.lib.raptor_inference_call_count.restype = ctypes.c_uint64
        self.lib.raptor_inference_configure.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint32,
        ]
        status = self.lib.raptor_inference_init(1 if skip_test else 0)
        if status:
            raise RuntimeError(f"native executor init failed: status={status}")

    def configure(
        self,
        intermediate_ns: int = 2_500_000,
        native_ns: int = 10_000_000,
        force_sync_native: int = 4,
        timing_window: int = 100,
    ):
        self.lib.raptor_inference_configure(
            intermediate_ns, native_ns, force_sync_native, timing_window
        )

    def reset(self):
        self.lib.raptor_inference_reset()

    def control(self, time_us: int, observation: np.ndarray) -> tuple[np.ndarray, int]:
        obs = np.ascontiguousarray(observation, np.float32)
        action = np.zeros(4, np.float32)
        status = self.lib.raptor_inference_l2f_control(
            int(time_us),
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            action.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return action, status

    def self_test(self) -> float:
        return float(self.lib.raptor_inference_self_test())

    def timing_stats(self) -> tuple[float, float]:
        mean = ctypes.c_double()
        mx = ctypes.c_double()
        self.lib.raptor_inference_timing_stats(
            ctypes.byref(mean), ctypes.byref(mx)
        )
        return mean.value, mx.value

    @property
    def call_count(self) -> int:
        return int(self.lib.raptor_inference_call_count())

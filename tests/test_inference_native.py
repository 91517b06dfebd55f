"""Native deployment chain: code export -> g++ compile -> C ABI executor,
verified against the shipped checkpoint's golden I/O and the Python
executor mirror (SURVEY §3.6, §4.5)."""

import shutil

import numpy as np
import pytest

from raptor_tpu.checkpoint import code_export, h5 as ckpt_h5
from raptor_tpu.inference import Executor, ExecutorConfig, NativeExecutor, build_executor
from raptor_tpu.policy import shipped_checkpoint_path

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="g++ not available"
)


@pytest.fixture(scope="module")
def native(tmp_path_factory):
    path = shipped_checkpoint_path()
    params = ckpt_h5.load_actor(path)
    ex_in, ex_out = ckpt_h5.load_example_io(path)
    header = tmp_path_factory.mktemp("export") / "policy_checkpoint.h"
    code_export.export_header_file(
        str(header), params, ex_in, ex_out, checkpoint_name="shipped"
    )
    so = build_executor(str(header))
    return NativeExecutor(so), params, ex_in, ex_out


def test_compiled_self_test_passes_golden_io(native):
    ex, params, ex_in, ex_out = native
    err = ex.self_test()
    assert err <= 1e-4, f"native self-test max err {err}"


def test_native_matches_python_executor_multirate(native):
    """400 Hz calls with FORCE_SYNC_NATIVE=4: native == Python mirror, and
    the GRU state advances only at 100 Hz."""
    ex, params, ex_in, ex_out = native
    ex.reset()
    py = Executor(params, ExecutorConfig())
    t_us = 0
    obs = ex_in[0, 0]
    for i in range(16):
        a_native, s_native = ex.control(t_us, obs)
        a_py, s_py = py.control(t_us, obs)
        np.testing.assert_allclose(a_native, a_py, atol=1e-5)
        assert s_native == 0 and s_py == 0
        t_us += 2500  # perfect 400 Hz timing
    # intra-native-interval outputs are constant (hidden not advanced)
    ex.reset()
    outs = [ex.control(i * 2500, obs)[0] for i in range(8)]
    np.testing.assert_allclose(outs[1], outs[2], atol=1e-7)
    np.testing.assert_allclose(outs[1], outs[3], atol=1e-7)
    # but the 100 Hz commits change the output across native intervals
    assert np.max(np.abs(outs[0] - outs[4])) > 1e-6 or np.max(np.abs(outs[4] - outs[7])) > 1e-7


def test_first_interval_checked_from_t0(native):
    """Boot clocks start at 0: the first interval must still be watched
    (regression — a last_call==0 sentinel silently skipped it)."""
    ex, *_ = native
    ex.reset()
    obs = np.zeros(22, np.float32)
    _, s = ex.control(0, obs)
    assert s == 0
    _, s = ex.control(12_000, obs)  # 12 ms on a 2.5 ms contract -> L3
    assert s & NativeExecutor.STATUS_TIMING_L3
    mean_ns, _ = ex.timing_stats()
    assert mean_ns == 12_000_000.0


def test_timing_watchdog_levels(native):
    ex, *_ = native
    ex.reset()
    obs = np.zeros(22, np.float32)
    ex.control(0, obs)
    _, s = ex.control(2500, obs)  # on time
    assert s == 0
    _, s = ex.control(2500 + 2700, obs)  # ~8% late -> L1
    assert s & NativeExecutor.STATUS_TIMING_L1
    _, s = ex.control(2500 + 2700 + 6000, obs)  # >2x late -> L3
    assert s & NativeExecutor.STATUS_TIMING_L3
    mean_ns, max_ns = ex.timing_stats()
    assert max_ns >= 6000 * 1000


def test_sequence_parity_at_native_rate(native):
    """Driving the native executor at exactly 100 Hz (force_sync 1) replays
    the golden sequence."""
    ex, params, ex_in, ex_out = native
    ex.configure(intermediate_ns=10_000_000, force_sync_native=1)
    ex.reset()
    errs = []
    for t in range(100):
        action, _ = ex.control(t * 10_000, ex_in[t, 0])
        errs.append(np.max(np.abs(action - np.clip(ex_out[t, 0], -1, 1))))
    assert max(errs) <= 1e-4
    ex.configure()  # restore defaults

"""True multi-process `jax.distributed` test (VERDICT r3 missing #4;
SURVEY §5.3 asks for simulated N-process meshes).

Launches TWO OS processes, each with 4 virtual CPU devices, joined through
a local coordinator with gloo collectives — the first time
`initialize_distributed` / `host_key` / `make_global_array` run in the mode
they exist for (`jax.process_count() == 2`). A third single-process run of
the identical program (8 local devices) provides the reference result.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(num_processes, devices_per_proc, tmpdir, timeout=420):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # total CPU isolation (NOTES.md)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs, outs = [], []
    for rank in range(num_processes):
        out = os.path.join(tmpdir, f"rank{rank}_n{num_processes}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER, "--rank", str(rank),
                 "--num-processes", str(num_processes),
                 "--port", str(port), "--out", out],
                env=env, cwd=_REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for proc in procs:
        try:
            stdout, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
        assert proc.returncode == 0, (
            f"worker failed (rc={proc.returncode}):\n{logs[-1][-3000:]}"
        )
    return [json.load(open(o)) for o in outs]


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    two = _run_workers(2, 4, str(tmp_path))
    one = _run_workers(1, 8, str(tmp_path))[0]

    # the distributed runtime really had two processes
    for r in two:
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
    assert one["process_count"] == 1 and one["global_devices"] == 8

    # host_key gives each process an independent stream
    assert two[0]["host_key_draw"] != two[1]["host_key_draw"]
    # rank 0's stream is the same one the single-process run draws
    assert two[0]["host_key_draw"] == pytest.approx(one["host_key_draw"])

    # replicated global checksum agrees across ranks bit-for-bit (it is one
    # SPMD computation) ...
    assert two[0]["checksum"] == pytest.approx(two[1]["checksum"], rel=0)
    assert two[0]["critic_loss"] == pytest.approx(two[1]["critic_loss"], rel=0)
    # ... and the 2-process training result matches the single-process run
    # (same program, same global device count; cross-process reduction order
    # may differ at float tolerance)
    assert two[0]["checksum"] == pytest.approx(one["checksum"], rel=1e-5)
    assert two[0]["critic_loss"] == pytest.approx(one["critic_loss"], rel=1e-4)

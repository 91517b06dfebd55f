"""Roofline accounting sanity (SURVEY §6 perf methodology).

The roofline app attributes bench rates to useful algorithmic work via
XLA cost analysis; this pins that the per-step flop counts stay in the
expected range (a dynamics rewrite that silently 10x'd the per-step cost
would otherwise inflate the 'useful FLOP/s' claim)."""

from raptor_tpu.apps.roofline import flop_counts


def test_flop_counts_sane():
    c = flop_counts()
    # RK4 over 13-dim quad state + 4 rotors: order 3k flops.
    assert 1_000 <= c["dynamics_step_flops"] <= 20_000
    # full step adds obs composition, reward, termination, reset sampling
    assert c["env_step_flops"] >= c["dynamics_step_flops"]
    assert c["env_step_flops"] <= 50_000
    # transcendental count is what makes the kernel partially SFU-bound;
    # track it so it can't silently explode
    assert 1 <= c["dynamics_step_transcendentals"] <= 64
    assert c["env_step_transcendentals"] <= 256

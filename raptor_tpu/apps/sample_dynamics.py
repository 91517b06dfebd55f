"""CLI: sample the airframe population -> dynamics_parameters/{i}.json.

Mirror of `foundation_policy_pre_training_sample_dynamics_parameters`
(reference README:206-207).

    python -m raptor_tpu.apps.sample_dynamics --n 1000 --out src/foundation_policy/dynamics_parameters
"""

from __future__ import annotations

import argparse
import os

import jax

from raptor_tpu.env.io import save_params_json
from raptor_tpu.env.randomization import RandomizationConfig, sample_dynamics_params


def main(argv=None):
    from raptor_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1000)
    p.add_argument("--out", default="dynamics_parameters")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    keys = jax.random.split(jax.random.key(args.seed), args.n)
    cfg = RandomizationConfig()
    for i in range(args.n):
        params = sample_dynamics_params(keys[i], cfg)
        save_params_json(os.path.join(args.out, f"{i}.json"), params)
    print(f"wrote {args.n} airframes to {args.out}/")


if __name__ == "__main__":
    main()

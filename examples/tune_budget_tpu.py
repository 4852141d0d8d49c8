"""On-TPU budget pin for the bf16-preconditioned production preset
(the CPU budget test cannot compile bf16 programs — CLAUDE.md): at
cavity 128^2 f32, 50 steps, compare each candidate against the
converged rtol-1e-5 solve. The acceptance bar is the repo's own
production pin: max deviation <= 2e-4 * U_lid
(tests/test_fastpath.py::test_production_budget_at_production_size).

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
      python examples/tune_budget_tpu.py
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    import jax.numpy as jnp

    from fluca_tpu.models.cavity import setup_cavity_2d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    def run(cfg):
        ns = setup_cavity_2d(
            N=128, Re=100.0, dt=0.005, max_steps=60,
            dtype=jnp.float32,
        )
        ns.impl.cfg = cfg
        ns.advance(50)
        return [np.asarray(f, np.float64) for f in ns.state["v"]] + [
            np.asarray(ns.state["p"], np.float64)
        ]

    ref = run(CNLinearConfig())  # converged rtol 1e-5
    out = {}

    def dev(label, cfg):
        got = run(cfg)
        d = max(
            float(np.max(np.abs(a - b))) for a, b in zip(got, ref)
        )
        out[label] = d
        print(f"{label:28s}: max dev {d:.3e} "
              f"({'PASS' if d < 2e-4 else 'FAIL'} at 2e-4*U)",
              flush=True)
        return d

    dev("production_o3_f32", CNLinearConfig.production())
    for o in (3, 4, 5):
        c = CNLinearConfig.production(o, 8, 6)
        c.precond_dtype = "bfloat16"
        dev(f"production_o{o}_bf16", c)

    with open("/root/repo/TUNE_BUDGET_TPU.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

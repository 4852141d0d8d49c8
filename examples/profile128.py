"""Stage-by-stage slope timing of the production step at channel
128^3 f32 (the BENCH channel config): where do the 69 ms go?

Run on TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/profile128.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def slope(fn, x, lo=20, hi=100, repeats=3):
    ts = {}
    for iters in (lo, hi):
        g = jax.jit(
            lambda x, it=iters: sum(
                jnp.sum(leaf)
                for leaf in jax.tree_util.tree_leaves(
                    lax.fori_loop(0, it, lambda i, a: fn(a), x)
                )
            )
        )
        float(g(x))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(g(x))
            best = min(best, time.perf_counter() - t0)
        ts[iters] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    N = 128
    ns = setup_channel_3d(
        N=(N, N, N), dt=2e-3, max_steps=10**9, dtype=jnp.float32
    )
    impl = ns.impl
    ops = impl.ops
    impl.cfg = CNLinearConfig.production()
    print(
        f"chain3d={ops._chain3d is not None} "
        f"mom3d={ops._mom_kernel3d is not None} "
        f"mg_pallas={[l.pallas_apply is not None for l in impl.mg.levels]}",
        flush=True,
    )

    state = ns.state
    t = jnp.asarray(0.0, jnp.float32)
    sol0 = state
    dim = ops.dim
    Bv0 = ops.apply_B(sol0["v"])
    bcB = ops.bc_B(t)
    v0f = tuple(
        tuple(Bv0[d][c] + bcB[d][c] for c in range(dim))
        for d in range(dim)
    )
    U0 = sol0["U"]
    diagA = ops.diag_A(U0, v0f)
    if ops.has_momentum_kernel3d:
        Acoeffs = ops.build_momentum_factors_3d(U0, v0f)
    else:
        Acoeffs = ops.build_momentum_coeffs(U0, v0f)
    rhs = impl._form_rhs(sol0, state["phalf"], t, False)
    rhs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.random.default_rng(0).standard_normal(
            a.shape), a.dtype) * 1e-3, rhs)

    x0 = {"v": rhs["v"], "U": rhs["U"], "p": rhs["p"]}

    def wrapped_state(f):
        # keep tree structure stable for fori_loop: f: x -> x-like
        return f

    field = jnp.zeros((N, N, N), jnp.float32)

    stages = []

    # momentum A-apply (fused 3-D kernel)
    stages.append((
        "A-apply (mom, fused)",
        lambda v: ops.apply_A_coeffs(v, Acoeffs),
        rhs["v"],
    ))
    # coupled apply (fused chain kernel + A-apply)
    stages.append((
        "coupled_apply",
        lambda x: impl._coupled_apply(x, Acoeffs),
        x0,
    ))
    # chain-free coupled apply
    ch = ops._chain3d

    def coupled_xla(x):
        ops._chain3d = None
        try:
            return impl._coupled_apply(x, Acoeffs)
        finally:
            ops._chain3d = ch

    stages.append(("coupled_apply (XLA chain)", coupled_xla, x0))
    # MG pieces
    mg = impl.mg
    lvl0 = mg.levels[0]
    stages.append(("poisson apply (lvl0)", mg.apply_op, field))
    stages.append(("V-cycle (precondition)", mg.precondition, field))
    # schur solve (cg6 + MG)
    stages.append((
        "schur solve (cg6+MG)",
        lambda b: impl._solve_schur(b),
        field,
    ))
    # momentum solve (bicgstab 8)
    stages.append((
        "mom solve (bicgstab8)",
        lambda b: impl._solve_momentum(b, Acoeffs, diagA),
        rhs["v"],
    ))
    # abf apply
    stages.append((
        "abf_apply",
        lambda r: impl._abf_apply(r, Acoeffs, diagA),
        x0,
    ))

    for name, fn, arg in stages:
        try:
            t_s = slope(wrapped_state(fn), arg)
            print(f"  {name:28s}: {t_s*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"  {name:28s}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # full step for reference
    from functools import partial

    stepfn = jax.jit(partial(impl._step_impl, is_first_step=False))
    out = stepfn(state, t)
    jax.block_until_ready(out)

    def run_step(s):
        new, _ = impl._step_impl(s, t, is_first_step=False)
        return new

    t_s = slope(run_step, state, lo=10, hi=40)
    print(f"  {'FULL STEP':28s}: {t_s*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

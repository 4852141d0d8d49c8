"""Decompose the Poisson-SpMV bandwidth gap at the channel512 shape
(VERDICT r4 item 2a: 211 of the 330 GB/s per-shape roofline; the 2-D
kernel runs 92-97% of ITS roofline, so the loss is 3-D/shape
specific).

Timing-only kernel variants with identical in_specs/grid but stripped
bodies isolate WHERE the time goes:
  copy_tm8        — pure copy, same tiling (the roofline)
  stencil_full    — the real kernel (baseline)
  stencil_noroll  — full compute but in-plane rolls replaced by p
                    (isolates Mosaic roll cost)
  stencil_nocomp  — inputs identical, body = scale only (isolates
                    input-structure/DMA overhead: ue/de planes,
                    slivers, SMEM, VMEM-resident w planes)

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/probe_poisson512.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.bc import zero_velocity_bc
from fluca_tpu.ops.pallas_stencil import (
    _roll,
    poisson3d_coeffs,
    poisson3d_tile_edges,
)
from fluca_tpu.solvers.mg import PoissonMG


def slope(fn, x, lo=20, hi=80, repeats=3):
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


def variant_call(N0, N1, N2, dtype, body, tile_slabs=8):
    """pallas_call with the REAL kernel's in_specs but a custom
    body(s, block, w..., ue, de, le1, re1, le2, re2) -> plane."""
    TM = tile_slabs
    ntiles = N0 // TM

    def kernel(a0t, h0t, block, w1r, w2r, h12r, ue, de,
               le1, re1, le2, re2, out_ref):
        base = pl.program_id(0) * TM
        for s in range(TM):
            out_ref[s] = body(
                s, base, block, a0t, h0t, w1r, w2r, h12r, ue, de,
                le1, re1, le2, re2,
            ).astype(dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    ), TM, ntiles


def main():
    N = (512, 256, 256)
    N0, N1, N2 = N
    dtype = jnp.float32
    mesh = CartMesh.create(N, (True, False, True))
    mesh.set_uniform_coordinates(0, 4, 0, 2, 0, 2)
    from fluca_tpu.ns.bc import BCType, BoundaryCondition
    per = BoundaryCondition(BCType.PERIODIC)
    wall = zero_velocity_bc()
    mg = PoissonMG(mesh, [per, per, wall, wall, per, per],
                   scale=1.0, dtype=dtype)
    lvl = mg.levels[0]
    A0, H0, W1, W2, H12 = poisson3d_coeffs(lvl)
    a0 = jnp.asarray(A0, dtype)
    h0 = jnp.asarray(H0, dtype)
    w1 = jnp.asarray(W1, dtype)
    w2 = jnp.asarray(W2, dtype)
    h12 = jnp.asarray(H12, dtype)

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(N), dtype) * 1e-3
    out = {}
    gb = 2 * N0 * N1 * N2 * 4 / 1e9

    def rec(name, t):
        out[name] = {"ms": round(t * 1e3, 4),
                     "eff_gbps": round(gb / t, 1)}
        print(f"  {name:18s}: {t*1e3:8.3f} ms  "
              f"{gb/t:6.1f} GB/s-effective", flush=True)

    # roofline: plain copy, same tiling
    TM = 8
    copy_call = pl.pallas_call(
        lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
        out_shape=jax.ShapeDtypeStruct(N, dtype),
        grid=(N0 // TM,),
        in_specs=[pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    rec("copy_tm8", slope(copy_call, x))

    # the real kernel (via the installed MG level)
    assert lvl.pallas_apply is not None
    rec("stencil_full", slope(lvl.pallas_apply, x))

    rows = None

    def full_body(s, base, block, a0t, h0t, w1r, w2r, h12r, ue, de,
                  le1, re1, le2, re2, *, noroll=False):
        rows = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
        p = block[s]
        up = ue[0] if s == 0 else block[s - 1]
        dn = de[0] if s == TM - 1 else block[s + 1]
        c0m = a0t[0, base + s]
        c00 = a0t[1, base + s]
        c0p = a0t[2, base + s]
        term0 = (c0m * up + c00 * p + c0p * dn) * h12r[...]
        if noroll:
            left = right = fwd = bwd = p
        else:
            left = _roll(p, 1, 0)
            right = _roll(p, N1 - 1, 0)
            fwd = _roll(p, 1, 1)
            bwd = _roll(p, N2 - 1, 1)
        left = jnp.where(rows == 0, le1[s], left)
        right = jnp.where(rows == N1 - 1, re1[s], right)
        term1 = w1r[0] * left + w1r[1] * p + w1r[2] * right
        fwd = jnp.where(cols == 0, le2[s], fwd)
        bwd = jnp.where(cols == N2 - 1, re2[s], bwd)
        term2 = w2r[0] * fwd + w2r[1] * p + w2r[2] * bwd
        return term0 + h0t[base + s] * (term1 + term2)

    def run_variant(name, body):
        call, TMv, ntiles = variant_call(N0, N1, N2, dtype, body)
        ue, de = poisson3d_tile_edges(x, TMv, ntiles, True, dtype)
        le1 = jnp.zeros((N0, 1, N2), dtype)
        re1 = jnp.zeros((N0, 1, N2), dtype)
        le2 = jnp.zeros((N0, N1, 1), dtype)
        re2 = jnp.zeros((N0, N1, 1), dtype)

        def f(p):
            ue, de = poisson3d_tile_edges(p, TMv, ntiles, True, dtype)
            return call(a0, h0, p, w1, w2, h12, ue, de,
                        le1, re1, le2, re2)

        rec(name, slope(f, x))

    run_variant("stencil_rebuilt", lambda *a: full_body(*a))
    run_variant("stencil_noroll",
                lambda *a: full_body(*a, noroll=True))
    run_variant(
        "stencil_nocomp",
        lambda s, base, block, *rest: block[s] * 1.0000001,
    )

    with open("/root/repo/PROBE_POISSON512.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Is the >=134MB HBM cliff (PROBE512.json: ~330 GB/s vs ~670 for
<=67MB buffers) per-BUFFER or per-working-set?

If a kernel moving the same 268 MB total as two 67 MB inputs + two
67 MB outputs streams at ~670 GB/s, the cliff is per-buffer and
slab-splitting the 512x256x256 f32 fields doubles the whole step's
bandwidth; if it streams at ~330, the cliff is aggregate and
splitting buys nothing.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/probe512split.py
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


def copy_call(shape, dtype, TM):
    return pl.pallas_call(
        lambda a, o: o.__setitem__(..., a[...] * 1.0000001),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        grid=(shape[0] // TM,),
        in_specs=[pl.BlockSpec((TM,) + shape[1:],
                               lambda i: (i,) + (0,) * (len(shape) - 1),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM,) + shape[1:],
                               lambda i: (i,) + (0,) * (len(shape) - 1),
                               memory_space=pltpu.VMEM),
    )


def main():
    dtype = jnp.float32
    out = {}

    # 1. single 134 MB buffer (the cliff baseline)
    shape = (512, 256, 256)
    x = jnp.ones(shape, dtype)
    c = copy_call(shape, dtype, 8)
    t = slope(c, x)
    gb = 2 * np.prod(shape) * 4 / 1e9
    out["copy_134MB_single"] = round(gb / t, 1)
    print("copy_134MB_single:", out["copy_134MB_single"], "GB/s",
          flush=True)

    # 2. two 67 MB buffers in ONE kernel launch (same 268 MB moved)
    half = (256, 256, 256)
    ca = copy_call(half, dtype, 8)

    def two(ab):
        a, b = ab
        return ca(a), ca(b)

    xa = jnp.ones(half, dtype)
    xb = jnp.ones(half, dtype) * 2
    t = slope(two, (xa, xb))
    out["copy_2x67MB_two_kernels"] = round(gb / t, 1)
    print("copy_2x67MB_two_kernels:", out["copy_2x67MB_two_kernels"],
          "GB/s", flush=True)

    # 3. two 67 MB inputs + two outputs in one pallas_call
    def k2(a, b, oa, ob):
        oa[...] = a[...] * 1.0000001
        ob[...] = b[...] * 1.0000001

    TM = 8
    call2 = pl.pallas_call(
        k2,
        out_shape=(jax.ShapeDtypeStruct(half, dtype),
                   jax.ShapeDtypeStruct(half, dtype)),
        grid=(half[0] // TM,),
        in_specs=[pl.BlockSpec((TM, 256, 256), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((TM, 256, 256), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),) * 2,
    )
    t = slope(lambda ab: call2(*ab), (xa, xb))
    out["copy_2x67MB_one_kernel"] = round(gb / t, 1)
    print("copy_2x67MB_one_kernel:", out["copy_2x67MB_one_kernel"],
          "GB/s", flush=True)

    # 4. control: one 67 MB buffer (the fast side of the cliff)
    t = slope(ca, xa)
    gb1 = 2 * np.prod(half) * 4 / 1e9
    out["copy_67MB_single"] = round(gb1 / t, 1)
    print("copy_67MB_single:", out["copy_67MB_single"], "GB/s",
          flush=True)

    # 5. XLA (non-pallas) elementwise on 134 MB: does the cliff hit
    # plain XLA fusions equally?
    t = slope(lambda a: a * 1.0000001, x)
    out["xla_scale_134MB"] = round(gb / t, 1)
    t = slope(lambda a: a * 1.0000001, xa)
    out["xla_scale_67MB"] = round(gb1 / t, 1)
    print("xla_scale 134/67:", out["xla_scale_134MB"],
          out["xla_scale_67MB"], flush=True)

    with open("/root/repo/PROBE512SPLIT.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

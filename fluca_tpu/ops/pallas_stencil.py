"""Fused Pallas TPU kernel for the pressure-Poisson stencil SpMV.

The XLA lowering of the banded apply materializes every shifted copy
of the input (measured ~100 GB/s effective on a v5e vs 819 GB/s
roofline); this kernel reads each input tile once, applies the
separable 5-point stencil in VMEM, and writes the output once — the
minimum-traffic form.

Operator (2-D): Shat p = vol .* (-(D Gst)) * scale with per-axis
tridiagonal bands b_o. Separability lets every term factor into
(row vector) x (col vector):

  out[i,j] = CY[j] * sum_o RX_o[i] * p[i+o, j]      (x bands)
           + RY[i] * sum_o CY_o[j] * p[i, j+o]      (y bands)

with RX_o = -scale*hx*bx_o, CY = hy, RY = hx, CY_o = -scale*hy*by_o.

Mosaic alignment strategy: the grid is tiled in aligned (TM, N1) row
blocks (BlockSpec pipelining); row-neighbor access inside a tile uses
sublane rolls, and the two rows crossing tile boundaries are supplied
by tiny "edge row" arrays (ntiles, N1) prepared with XLA outside the
kernel (negligible traffic). Column neighbors are lane rolls; wrapped
reads across non-periodic edges are annihilated by the zero boundary
coefficients baked into the tables (and the edge rows are zeroed /
wrapped explicitly), so no unaligned slicing is needed anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift, axis):
    """pltpu.roll for any element width. Mosaic's dynamic_rotate
    only supports 32-bit lanes ("Rotate with non-32-bit data" for
    bf16), so sub-32-bit planes roll through an f32 round-trip —
    lossless for bf16 (a subset of f32) and VPU-only (the kernels
    are HBM-bound, so the extra converts are free)."""
    if x.dtype.itemsize < 4:
        return pltpu.roll(
            x.astype(jnp.float32), shift, axis
        ).astype(x.dtype)
    return pltpu.roll(x, shift, axis)


def _coef_dtype(dtype):
    """Coefficient/band arrays stay f32 in sub-32-bit kernels: SMEM
    scalar reads want 32-bit, the coefficients deserve the
    precision, and their traffic is negligible — only the big
    streamed fields carry the bf16 byte savings. Products
    f32 x bf16 accumulate in f32; outputs cast at the store."""
    dt = jnp.dtype(dtype)
    return jnp.float32 if dt.itemsize < 4 else dt


def poisson2d_coeffs(level):
    """Host-precomputed separable coefficient arrays (numpy f64):
    RX (3, N0), RY (N0,), CY (N1,), CYb (3, N1). Shared by the local
    and sharded (shard_map) kernel paths — under sharding each array
    is sliced along its grid axis by the shard_map in_specs."""
    mesh = level.mesh
    N0, N1 = mesh.N

    def bands_1d(device_bands, n):
        out = {}
        for off, w in device_bands:
            out[off] = np.asarray(w).reshape(-1)
            assert out[off].shape == (n,)
        z = np.zeros(n)
        assert set(out) <= {-1, 0, 1}, set(out)
        return out.get(-1, z), out.get(0, z), out.get(1, z)

    bx = bands_1d(level.dgst_bands[0], N0)
    by = bands_1d(level.dgst_bands[1], N1)
    hy = mesh.widths(1)
    volrow = np.asarray(level.vol)[:, 0] / hy[0]  # = scale * hx
    RX = np.stack([-volrow * b for b in bx], 0)  # (3, N0)
    CY = hy
    RY = volrow
    CYb = np.stack([-hy * b for b in by], 0)  # (3, N1)
    return RX, RY, CY, CYb


def poisson2d_raw_call(N0, N1, dtype, *, mode="apply", omega=0.8,
                       tile_rows=128, interpret=False):
    """Bare pallas_call for the fused 2-D Poisson kernels, with every
    position-dependent input (coefficients AND halo edges) passed as
    an argument:

      call(p, rx(3,N0), ry2(1,N0), cy(N1,), cyb(3,N1),
           ue(ntiles,1,N1), de(ntiles,1,N1), le(N0,1), re(N0,1)
           [, b][, w])

    ue/de supply the rows crossing tile (and shard) boundaries along
    axis 0; le/re the columns crossing axis-1 boundaries (wrapped lane
    rolls inside; the le/re patch makes the kernel decomposition-
    agnostic — under shard_map the caller fills them with ppermute'd
    neighbor slabs, single-device callers with wrap/zero columns).

    mode="apply":    f(p)       = Shat p
    mode="residual": f(p, b)    = b - Shat p
    mode="smooth":   f(p, b, w) = p + omega * w * (b - Shat p)

    All variants read each HBM tile exactly once.
    """
    # the smoother holds 3 input tiles + out + roll temporaries in
    # VMEM; halve the tile rows to stay under the 16 MB budget at
    # large N1 (see CLAUDE.md VMEM note)
    if mode == "smooth" and N1 >= 2048:
        tile_rows = min(tile_rows, 64)
    elif mode == "residual" and N1 >= 4096:
        tile_rows = min(tile_rows, 64)
    TM = min(tile_rows, N0)
    while N0 % TM:
        TM //= 2
    ntiles = N0 // TM
    omega = float(omega)

    def kernel(block, rxt, ryt, cy_ref, cyb_ref, ue, de, le, re,
               *rest):
        # block: (TM, N1) tile of p; rxt: (3, TM) row coeffs for this
        # tile; ryt: (TM,); ue/de: (1, N1) edge rows; le/re: (TM, 1)
        # edge columns
        out_ref = rest[-1]
        p = block[...]
        up = _roll(p, 1, 0)
        dn = _roll(p, TM - 1, 0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TM, N1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TM, N1), 1)
        up = jnp.where(rows == 0, ue[0], up)
        dn = jnp.where(rows == TM - 1, de[0], dn)

        rxm = rxt[0, :][:, None]
        rx0 = rxt[1, :][:, None]
        rxp = rxt[2, :][:, None]
        ryv = ryt[0, :][:, None]
        cyv = cy_ref[...][None, :]
        xterm = (rxm * up + rx0 * p + rxp * dn) * cyv

        left = _roll(p, 1, 1)
        right = _roll(p, N1 - 1, 1)
        left = jnp.where(cols == 0, le[...], left)
        right = jnp.where(cols == N1 - 1, re[...], right)
        cybm = cyb_ref[0, :][None, :]
        cyb0 = cyb_ref[1, :][None, :]
        cybp = cyb_ref[2, :][None, :]
        sp = xterm + ryv * (cybm * left + cyb0 * p + cybp * right)

        if mode == "apply":
            out_ref[...] = sp.astype(dtype)
        elif mode == "residual":
            b_ref = rest[0]
            out_ref[...] = (b_ref[...] - sp).astype(dtype)
        else:  # smooth
            b_ref, w_ref = rest[0], rest[1]
            out_ref[...] = (
                p + omega * w_ref[...] * (b_ref[...] - sp)
            ).astype(dtype)

    n_extra = {"apply": 0, "residual": 1, "smooth": 2}[mode]
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N0, N1), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((TM, N1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TM), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cy (N1,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cyb (3, N1)
            pl.BlockSpec((1, 1, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # up edges
            pl.BlockSpec((1, 1, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # down edges
            pl.BlockSpec((TM, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # left edge col
            pl.BlockSpec((TM, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # right edge col
        ] + [
            pl.BlockSpec((TM, N1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_extra)
        ],
        out_specs=pl.BlockSpec(
            (TM, N1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(10 + 3 * n_extra) * N0 * N1,
            bytes_accessed=(2 + n_extra) * N0 * N1
            * np.dtype(np.float32).itemsize,
            transcendentals=0,
        ),
    )
    return call, TM, ntiles


def poisson2d_tile_edges(p, TM, ntiles, periodic0, dtype):
    """Axis-0 edge rows crossing TILE boundaries, from local data;
    tile 0 / last-tile outer rows wrap (periodic) or zero."""
    N0, N1 = p.shape
    p4 = p.reshape(ntiles, TM, N1)
    ue = jnp.zeros((ntiles, N1), dtype)
    de = jnp.zeros((ntiles, N1), dtype)
    if ntiles > 1:
        ue = ue.at[1:].set(p4[:-1, TM - 1, :])
        de = de.at[:-1].set(p4[1:, 0, :])
    if periodic0:
        ue = ue.at[0].set(p[N0 - 1, :])
        de = de.at[ntiles - 1].set(p[0, :])
    return (
        ue.reshape(ntiles, 1, N1),
        de.reshape(ntiles, 1, N1),
    )


def _build_poisson_2d(level, *, mode="apply", omega=0.8,
                      tile_rows=128, interpret=False):
    """Single-device wrapper over poisson2d_raw_call (the historical
    builder API used by solvers.mg)."""
    mesh = level.mesh
    assert mesh.dim == 2
    N0, N1 = mesh.N
    per0, per1 = mesh.periodic
    dtype = level.vol.dtype

    RX, RY, CY, CYb = poisson2d_coeffs(level)
    call, TM, ntiles = poisson2d_raw_call(
        N0, N1, dtype, mode=mode, omega=omega, tile_rows=tile_rows,
        interpret=interpret,
    )

    cdt = _coef_dtype(dtype)
    rx = jnp.asarray(RX, cdt)
    ry2 = jnp.asarray(RY, cdt)[None, :]  # (1, N0): tile block (1, TM)
    cy = jnp.asarray(CY, cdt)
    cyb = jnp.asarray(CYb, cdt)

    def lr_edges(p):
        if per1:
            return p[:, N1 - 1:N1], p[:, 0:1]
        z = jnp.zeros((N0, 1), dtype)
        return z, z

    def run(p, *extra):
        ue, de = poisson2d_tile_edges(p, TM, ntiles, per0, dtype)
        le, re = lr_edges(p)
        return call(p, rx, ry2, cy, cyb, ue, de, le, re, *extra)

    if mode == "apply":
        return jax.jit(lambda p: run(p))
    if mode == "residual":
        return jax.jit(lambda p, b: run(p, b))
    return jax.jit(lambda p, b, w: run(p, b, w))


def build_poisson_apply_2d(level, *, tile_rows=128, interpret=False):
    """Returns f(p) computing vol .* (-(D Gst) p) for one MG level via
    a fused Pallas kernel. Bands must be tridiagonal (offsets -1..1),
    which gst/div composition guarantees."""
    return _build_poisson_2d(level, mode="apply", tile_rows=tile_rows,
                             interpret=interpret)


def build_poisson_residual_2d(level, *, tile_rows=128,
                              interpret=False):
    """Returns f(p, b) computing b - Shat p in one fused pass."""
    return _build_poisson_2d(level, mode="residual",
                             tile_rows=tile_rows, interpret=interpret)


def build_poisson_smooth_2d(level, omega, *, tile_rows=128,
                            interpret=False):
    """Returns f(p, b, w) = p + omega * w * (b - Shat p): one fused
    damped-Jacobi sweep (w = 1/diag(Shat))."""
    return _build_poisson_2d(level, mode="smooth", omega=omega,
                             tile_rows=tile_rows, interpret=interpret)


def poisson3d_coeffs(level):
    """Host-precomputed coefficient arrays for the 3-D kernel:
    A0 (3, N0), H0 (N0,), W1 (3, N1, N2), W2 (3, N1, N2),
    H12 (N1, N2). Under shard_map, A0/H0 slice along gx and
    W1/W2/H12 along (gy, gz) via in_specs."""
    mesh = level.mesh
    N0, N1, N2 = mesh.N

    def bands_1d(device_bands, n):
        out = {}
        for off, w in device_bands:
            out[off] = np.asarray(w).reshape(-1)
            assert out[off].shape == (n,)
        z = np.zeros(n)
        assert set(out) <= {-1, 0, 1}, set(out)
        return out.get(-1, z), out.get(0, z), out.get(1, z)

    b0 = bands_1d(level.dgst_bands[0], N0)
    b1 = bands_1d(level.dgst_bands[1], N1)
    b2 = bands_1d(level.dgst_bands[2], N2)
    h0 = mesh.widths(0)
    h1 = mesh.widths(1)
    h2 = mesh.widths(2)
    scale = float(
        np.asarray(level.vol)[0, 0, 0] / (h0[0] * h1[0] * h2[0])
    )
    A0 = np.stack([-scale * h0 * b for b in b0], 0)  # (3, N0)
    W1 = np.stack(
        [(-scale * h1 * b)[:, None] * h2[None, :] for b in b1], 0
    )  # (3, N1, N2)
    W2 = np.stack(
        [h1[:, None] * (-scale * h2 * b)[None, :] for b in b2], 0
    )  # (3, N1, N2)
    H12 = h1[:, None] * h2[None, :]  # (N1, N2)
    return A0, h0, W1, W2, H12


def poisson3d_raw_call(N0, N1, N2, dtype, *, mode="apply", omega=0.8,
                       tile_slabs=16, interpret=False,
                       self_edges=False):
    """Bare pallas_call for the fused 3-D Poisson kernels.

    Two edge conventions:

    self_edges=False (the shard_map form):
      call(a0(3,N0)[SMEM], h0(N0,)[SMEM], p, w1, w2, h12,
           ue(ntiles,N1,N2), de(ntiles,N1,N2),
           le1(N0,1,N2), re1(N0,1,N2), le2(N0,N1,1), re2(N0,N1,1)
           [, b][, w])
      le1/re1 patch the axis-1 sublane rolls at rows 0/N1-1, le2/re2
      the axis-2 lane rolls at cols 0/N2-1 — ppermute'd neighbor
      slabs under shard_map (decomposition-invariant hot path,
      cnlinearcart2d.c:618-622).

    self_edges=True (the single-device fast form):
      call(a0, h0, p, w1, w2, h12, p, p [, b][, w])
      The axis-0 cross-tile planes are read DIRECTLY from p via
      shifted block-index maps (tile i's up edge = plane i*TM-1,
      wrapping to N0-1 at i=0), so no host-side edge building and no
      sliver inputs. In-plane rolls need no patches at all: on a
      periodic axis the Mosaic roll wrap IS the periodic neighbor,
      and on a non-periodic axis the boundary band entries are zero
      by BC folding (ns/tables discipline), annihilating the wrapped
      values — measured r5: the per-call lane-column slivers + edge
      builds were the 211-vs-296 GB/s gap at 512x256x256
      (PROBE_POISSON512.json).

    Raises ValueError when the cross-section exceeds the VMEM budget.
    """
    n_big = 2 + {"apply": 0, "residual": 1, "smooth": 2}[mode]
    plane = N1 * N2 * np.dtype(np.float32).itemsize
    budget = (14 << 20) - 17 * plane
    if budget <= 2 * n_big * plane:
        raise ValueError(
            f"poisson3d kernel: cross-section {N1}x{N2} exceeds the "
            f"VMEM budget (mode={mode})"
        )
    tm_max = max(1, budget // (2 * n_big * plane))
    TM = int(min(tile_slabs, tm_max, N0))
    while N0 % TM:
        TM -= 1
    ntiles = N0 // TM
    omega = float(omega)

    def kernel(a0t, h0t, block, w1r, w2r, h12r, ue, de, *rest):
        # a0t: (3, N0) SMEM scalars (full, indexed via program_id);
        # h0t: (N0,) SMEM; block: (TM, N1, N2); w1r/w2r: (3, N1, N2);
        # h12r: (N1, N2); ue/de: (1, N1, N2) edge planes;
        # explicit-edge form adds le1/re1: (TM, 1, N2) and
        # le2/re2: (TM, N1, 1) roll patches
        if self_edges:
            le1 = re1 = le2 = re2 = None
        else:
            le1, re1, le2, re2 = rest[:4]
            rest = rest[4:]
        out_ref = rest[-1]
        base = pl.program_id(0) * TM
        w1m, w10, w1p = w1r[0], w1r[1], w1r[2]
        w2m, w20, w2p = w2r[0], w2r[1], w2r[2]
        h12v = h12r[...]
        if not self_edges:
            rows = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
        for s in range(TM):
            p = block[s]
            up = ue[0] if s == 0 else block[s - 1]
            dn = de[0] if s == TM - 1 else block[s + 1]
            c0m = a0t[0, base + s]
            c00 = a0t[1, base + s]
            c0p = a0t[2, base + s]
            term0 = (c0m * up + c00 * p + c0p * dn) * h12v

            left = _roll(p, 1, 0)
            right = _roll(p, N1 - 1, 0)
            if not self_edges:
                left = jnp.where(rows == 0, le1[s], left)
                right = jnp.where(rows == N1 - 1, re1[s], right)
            term1 = w1m * left + w10 * p + w1p * right

            fwd = _roll(p, 1, 1)
            bwd = _roll(p, N2 - 1, 1)
            if not self_edges:
                fwd = jnp.where(cols == 0, le2[s], fwd)
                bwd = jnp.where(cols == N2 - 1, re2[s], bwd)
            term2 = w2m * fwd + w20 * p + w2p * bwd

            sp = term0 + h0t[base + s] * (term1 + term2)
            if mode == "apply":
                out_ref[s] = sp.astype(dtype)
            elif mode == "residual":
                out_ref[s] = (rest[0][s] - sp).astype(dtype)
            else:  # smooth
                b_ref, w_ref = rest[0], rest[1]
                out_ref[s] = (
                    p + omega * w_ref[s] * (b_ref[s] - sp)
                ).astype(dtype)

    n_extra = {"apply": 0, "residual": 1, "smooth": 2}[mode]
    if self_edges:
        # ue/de are (1, N1, N2) views INTO p itself (passed again as
        # operands 7/8, block shape (1, N1, N2) in plane units): tile
        # i's up edge is plane i*TM-1 (wrapping to the last plane at
        # i=0 — correct for periodic axis 0, annihilated by the zero
        # boundary scalar a0[0, 0] otherwise), down edge is plane
        # (i+1)*TM (wrapping to plane 0 at the last tile).
        edge_specs = [
            pl.BlockSpec(
                (1, N1, N2),
                lambda i: (jnp.where(i == 0, N0 - 1, i * TM - 1),
                           0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N1, N2),
                lambda i: (jnp.where(i == ntiles - 1, 0,
                                     (i + 1) * TM), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        edge_specs = [
            pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # up edge planes
            pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # down edges
            pl.BlockSpec((TM, 1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # le1
            pl.BlockSpec((TM, 1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # re1
            pl.BlockSpec((TM, N1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # le2
            pl.BlockSpec((TM, N1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # re2
        ]
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # a0 (3, N0)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # h0 (N0,)
            pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1 (3, N1, N2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 (3, N1, N2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h12 (N1, N2)
        ] + edge_specs + [
            pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_extra)
        ],
        out_specs=pl.BlockSpec(
            (TM, N1, N2), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(16 + 3 * n_extra) * N0 * N1 * N2,
            bytes_accessed=(2 + n_extra) * N0 * N1 * N2
            * np.dtype(np.float32).itemsize,
            transcendentals=0,
        ),
    )
    return call, TM, ntiles


def poisson3d_tile_edges(p, TM, ntiles, periodic0, dtype):
    """Axis-0 edge planes crossing TILE boundaries (local data)."""
    N0, N1, N2 = p.shape
    p4 = p.reshape(ntiles, TM, N1, N2)
    ue = jnp.zeros((ntiles, N1, N2), dtype)
    de = jnp.zeros((ntiles, N1, N2), dtype)
    if ntiles > 1:
        ue = ue.at[1:].set(p4[:-1, TM - 1])
        de = de.at[:-1].set(p4[1:, 0])
    if periodic0:
        ue = ue.at[0].set(p[N0 - 1])
        de = de.at[ntiles - 1].set(p[0])
    return ue, de


def _build_poisson_3d(level, *, mode="apply", omega=0.8,
                      tile_slabs=16, interpret=False):
    """Shared builder for the fused 3-D Poisson kernels (7-point).

    Mosaic layout strategy (v5e-validated): the tile is (TM, N1, N2)
    slabs; the kernel unrolls over the TM leading slabs and works on
    2-D (N1, N2) planes only — sublane/lane rolls for the j/k
    neighbors (exactly the proven 2-D pattern), plain leading-index
    reads for the i neighbors (edge slabs supply cross-tile planes),
    and per-slab SCALAR axis-0 coefficients read from SMEM. This
    avoids the (1,TM)->(TM,1,1) vector shape cast that Mosaic's
    infer-vector-layout rejects.

    Separable coefficient planes are precomputed on host:
      W1[o][j,k] = -scale*h1[j]*b1_o[j] * h2[k]     (axis-1 term)
      W2[o][j,k] = h1[j] * -scale*h2[k]*b2_o[k]     (axis-2 term)
      H12[j,k]   = h1[j]*h2[k]
    so slab s contributes
      out[s] = (c0m[s]*up + c00[s]*p + c0p[s]*dn) * H12
             + h0[s] * (W1 rolls + W2 rolls)
    with c0*[s] = -scale*h0[s]*b0_o[s].

    mode="apply"/"residual"/"smooth" as in _build_poisson_2d.
    """
    mesh = level.mesh
    assert mesh.dim == 3
    N0, N1, N2 = mesh.N
    per0, per1, per2 = mesh.periodic
    dtype = level.vol.dtype

    A0, H0, W1, W2, H12 = poisson3d_coeffs(level)
    # single-device fast form (r5): edges read from p itself via
    # shifted block-index maps, roll wraps unpatched. Safe because on
    # a non-periodic axis the wrapped values meet zero boundary band
    # entries (BC folding); assert that here so a future table change
    # cannot silently corrupt the kernel.
    if not per0:
        assert not np.any(A0[0, 0]) and not np.any(A0[2, N0 - 1])
    if not per1:
        assert not np.any(W1[0, 0, :]) and not np.any(W1[2, N1 - 1, :])
    if not per2:
        assert not np.any(W2[0, :, 0]) and not np.any(W2[2, :, N2 - 1])
    call, TM, ntiles = poisson3d_raw_call(
        N0, N1, N2, dtype, mode=mode, omega=omega,
        tile_slabs=tile_slabs, interpret=interpret, self_edges=True,
    )

    cdt = _coef_dtype(dtype)
    a0 = jnp.asarray(A0, cdt)                       # (3, N0)
    h0j = jnp.asarray(H0, cdt)                      # (N0,)
    w1 = jnp.asarray(W1, cdt)
    w2 = jnp.asarray(W2, cdt)
    h12 = jnp.asarray(H12, cdt)

    def run(p, *extra):
        return call(a0, h0j, p, w1, w2, h12, p, p, *extra)

    if mode == "apply":
        return jax.jit(lambda p: run(p))
    if mode == "residual":
        return jax.jit(lambda p, b: run(p, b))
    return jax.jit(lambda p, b, w: run(p, b, w))


def build_poisson_apply_3d(level, *, tile_slabs=16, interpret=False):
    """3-D fused 7-point Poisson apply (see _build_poisson_3d)."""
    return _build_poisson_3d(level, mode="apply",
                             tile_slabs=tile_slabs,
                             interpret=interpret)


def build_poisson_residual_3d(level, *, tile_slabs=16,
                              interpret=False):
    """Returns f(p, b) computing b - Shat p in one fused pass (3-D)."""
    return _build_poisson_3d(level, mode="residual",
                             tile_slabs=tile_slabs,
                             interpret=interpret)


def build_poisson_smooth_3d(level, omega, *, tile_slabs=16,
                            interpret=False):
    """Returns f(p, b, w) = p + omega*w*(b - Shat p) (3-D sweep)."""
    return _build_poisson_3d(level, mode="smooth", omega=omega,
                             tile_slabs=tile_slabs,
                             interpret=interpret)


def momentum2d_raw_call(N0, N1, dtype, *, tile_rows=64,
                        interpret=False, halo1=False):
    """Bare pallas_call for the fused 2-D momentum A-apply, shared by
    the single-device and shard_map paths (see build_momentum_apply_2d
    for the coefficient-plane layout).

    (N0, N1) are the KERNEL (local-block) dims. ``halo1``: the
    in-plane axis-1 (lane) rolls cross shard boundaries, so the
    kernel takes 4 extra column inputs (u_locol/u_hicol/
    v_locol/v_hicol, (N0, 1) blocked (TM, 1)) and patches the +-1
    lane shifts at the first/last column — the
    decomposition-invariant form (reference anchor: identical sweeps
    on 1 and N ranks, cnlinearcart2d.c:618-622). The +-2 lane shifts
    stay plain rolls: their coefficient planes are nonzero only at
    global boundary columns (owned by the first/last shard, reads
    in-shard for local N1 >= 4); interior-shard wraps are annihilated
    by the zero planes.

    Returns (call, TM, ntiles).
    """
    TM = min(tile_rows, N0)
    while N0 % TM:
        TM //= 2
    ntiles = N0 // TM
    assert TM >= 4

    def kernel(w, u, v, uue, ude, vue, vde, *rest):
        if halo1:
            (u_locol, u_hicol, v_locol, v_hicol,
             out_u, out_v) = rest
        else:
            out_u, out_v = rest
            u_locol = u_hicol = v_locol = v_hicol = None
        rows = jax.lax.broadcasted_iota(jnp.int32, (TM, N1), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TM, N1), 1)

        def xshifts(p, ue, de):
            up = _roll(p[...], 1, 0)
            dn = _roll(p[...], TM - 1, 0)
            up = jnp.where(rows == 0, ue[0], up)
            dn = jnp.where(rows == TM - 1, de[0], dn)
            return up, dn

        def yshifts(p, locol, hicol):
            l = _roll(p[...], 1, 1)
            r = _roll(p[...], N1 - 1, 1)
            if halo1:
                l = jnp.where(cols == 0, locol[...], l)
                r = jnp.where(cols == N1 - 1, hicol[...], r)
            return l, r

        uu = u[...]
        vv = v[...]
        u_up, u_dn = xshifts(u, uue, ude)
        v_up, v_dn = xshifts(v, vue, vde)
        u_l, u_r = yshifts(u, u_locol, u_hicol)
        v_l, v_r = yshifts(v, v_locol, v_hicol)
        # +-2 shifts (boundary-row one-sided terms only)
        u_up2 = _roll(uu, 2, 0)
        u_dn2 = _roll(uu, TM - 2, 0)
        v_up2 = _roll(vv, 2, 0)
        v_dn2 = _roll(vv, TM - 2, 0)
        u_l2 = _roll(uu, 2, 1)
        u_r2 = _roll(uu, N1 - 2, 1)
        v_l2 = _roll(vv, 2, 1)
        v_r2 = _roll(vv, N1 - 2, 1)

        out_u[...] = (
            w[0] * u_up + w[1] * uu + w[2] * u_dn
            + w[3] * u_l + w[4] * uu + w[5] * u_r
            + w[6] * v_l + w[7] * vv + w[8] * v_r
            + w[18] * u_up2 + w[19] * u_dn2
            + w[20] * u_l2 + w[21] * u_r2
        )
        out_v[...] = (
            w[9] * v_up + w[10] * vv + w[11] * v_dn
            + w[12] * v_l + w[13] * vv + w[14] * v_r
            + w[15] * u_up + w[16] * uu + w[17] * u_dn
            + w[22] * v_up2 + w[23] * v_dn2
            + w[24] * v_l2 + w[25] * v_r2
        )

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N0, N1), dtype),
            jax.ShapeDtypeStruct((N0, N1), dtype),
        ),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((26, TM, N1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, 1, N1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ] + ([
            pl.BlockSpec((TM, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ] if halo1 else []),
        out_specs=(
            pl.BlockSpec((TM, N1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, N1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=56 * N0 * N1,
            bytes_accessed=30 * N0 * N1
            * np.dtype(np.float32).itemsize,
            transcendentals=0,
        ),
    )
    return call, TM, ntiles


def build_momentum_apply_2d(N0, N1, periodic0, periodic1, dtype,
                            *, tile_rows=64, interpret=False):
    """Fused A-apply for the 2-D momentum block.

    Computes, from a (26, N0, N1) stacked coefficient array W (built
    once per step by NSOperators.build_momentum_coeffs_stacked):

      out_u = sum_o W[0+o] u_xs(o) + W[3+o] u_ys(o) + W[6+o]  v_ys(o)
      out_v = sum_o W[9+o] v_xs(o) + W[12+o] v_ys(o) + W[15+o] u_xs(o)
      + the one-sided boundary-row +-2 Laplacian terms:
        W[18] u_xs(-2), W[19] u_xs(+2), W[20] u_ys(-2), W[21] u_ys(+2)
        W[22] v_xs(-2), W[23] v_xs(+2), W[24] v_ys(-2), W[25] v_ys(+2)

    (o in {0,1,2} for offsets {-1,0,+1}; xs = shift along axis 0 via
    sublane rolls + cross-tile edge rows, ys = lane rolls). Boundary
    coefficient rows are zero for non-periodic wrap reads by
    construction; the +-2 planes are nonzero only at global boundary
    rows, whose reads stay within the first/last tile (TM >= 8), so
    plain rolls suffice (wrapped garbage annihilated by zeros).
    """
    call, TM, ntiles = momentum2d_raw_call(
        N0, N1, dtype, tile_rows=tile_rows, interpret=interpret,
    )

    def edges(p):
        p4 = p.reshape(ntiles, TM, N1)
        ue = jnp.zeros((ntiles, N1), dtype)
        de = jnp.zeros((ntiles, N1), dtype)
        if ntiles > 1:
            ue = ue.at[1:].set(p4[:-1, TM - 1, :])
            de = de.at[:-1].set(p4[1:, 0, :])
        if periodic0:
            ue = ue.at[0].set(p[N0 - 1, :])
            de = de.at[ntiles - 1].set(p[0, :])
        return (
            ue.reshape(ntiles, 1, N1),
            de.reshape(ntiles, 1, N1),
        )

    @jax.jit
    def apply(w_stack, u, v):
        uue, ude = edges(u)
        vue, vde = edges(v)
        return call(w_stack, u, v, uue, ude, vue, vde)

    return apply


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ======================================================================
# Fused 3-D momentum A-apply
# ======================================================================
#
# Computes A v = v + dt C(U0, v0f) v - (mu dt / 2 rho) L v (the
# momentum block of cnlinearcart3d.c's coupled system) in ONE pass.
# Unlike the 2-D kernel (which reads 26 precomputed dense coefficient
# planes), coefficients are formed IN-KERNEL from:
#   - per-axis 1-D bands (Laplacian x 3 components, convection
#     tang/norm variants), held in SMEM (axis 0) / broadcast from
#     small VMEM arrays (axes 1, 2), and
#   - the per-step face-factor fields: U0 (3 face arrays) and
#     v0f[d][c] (9 face arrays), passed as cell-shaped LO slices with
#     the HI factor derived by roll + boundary patch.
# Traffic per apply: 3 v reads + 12 factor reads + 3 writes = 18
# streams, vs ~63 dense coefficient planes for a stacked-plane design
# (the reason 3-D stayed on XLA in round 1).
#
# Band row packing (shared by all three axes):
#   lap rows   L(c, off) = c*5 + off+2            (off in -2..2)
#   conv rows  CV(var, lr, off) = 15 + var*6 + lr*3 + off+1
#     var: 0 = tangential variant (col_is_normal=False),
#          1 = normal variant; lr: 0 = low face (wl), 1 = high (wr)
# Laplacian rows carry -(mu dt / 2 rho); conv rows carry dt.


def _mom3d_L(c, off):
    return c * 5 + off + 2


def _mom3d_CV(var, lr, off):
    return 15 + var * 6 + lr * 3 + off + 1


_MOM3D_NROWS = 27


def build_momentum_bands_3d(mesh, axbcs, rho, mu, dt):
    """(B0, B1, B2) packed numpy band arrays, one per axis."""
    from fluca_tpu.ns import tables as T_

    b = 0.5 * mu * dt / rho
    out = []
    for a in range(mesh.dim):
        B = np.zeros((_MOM3D_NROWS, mesh.N[a]))
        for c in range(mesh.dim):
            st, _, _ = T_.lap_tables(mesh, a, axbcs[a], c)
            for off, w in st.as_dict().items():
                B[_mom3d_L(c, off)] = -b * np.asarray(w)
        for var in (0, 1):
            wl, wr = T_.conv_tables(mesh, a, axbcs[a], bool(var))
            for lr, wd in enumerate((wl, wr)):
                for off, w in wd.items():
                    B[_mom3d_CV(var, lr, off)] = dt * np.asarray(w)
        out.append(B)
    return out


def momentum3d_raw_calls(N0, N1, N2, periodic, B0, B1, B2, dtype, *,
                         tile_slabs=8, interpret=False,
                         force_split=False, halo=(False, False),
                         self_edges=False):
    """Bare pallas_calls for the fused 3-D momentum A-apply, shared
    by the single-device and shard_map paths.

    (N0, N1, N2) are the KERNEL (local-block) dims; B0/B1/B2 are the
    band arrays whose CONTENT drives compile-time term skipping (the
    global bands under sharding — a term live anywhere must be live
    in the one program all shards share). ``halo=(h1, h2)``: the
    in-plane axis-1/axis-2 rolls cross shard boundaries, so the
    kernel takes extra per-V-field neighbor column/row patch inputs
    (VL1/VR1, VL2/VR2, appended after the standard refs) and ALWAYS
    patches the factor hi-rolls — the decomposition-invariant form
    (reference anchor: identical sweeps on 1 and N ranks,
    cnlinearcart2d.c:618-622).

    Returns (calls, split, TM, ntiles): calls = [full] or three
    per-component kernels (VMEM-driven; see build_momentum_apply_3d).
    """
    per = periodic
    h1, h2 = halo
    if N0 < 8 or N1 % 8 or N2 % 128:
        raise ValueError("momentum3d kernel: unaligned grid")

    # VMEM model in the KERNEL dtype: bf16 planes are half-size, so
    # the full fusion often fits where f32 must split
    plane = N1 * N2 * np.dtype(dtype).itemsize
    n_halo = (6 if h1 else 0) + (6 if h2 else 0)  # sliver planes

    def tm_for(nbig, nfixed):
        # nbig blocked big refs (double-buffered) + nfixed edge/patch
        # planes + roll temporaries
        budget = (14 << 20) - (nfixed + n_halo) * plane
        return budget // (2 * nbig * plane)

    # full fusion: 18 blocked big refs + ~42 fixed planes
    tm_max = tm_for(18, 42)
    split = tm_max < 1 or force_split
    if split:
        # split mode: 10 big refs (3 v + 3 FU + 3 FV + 1 out), edges
        # 3+3+2 double-buffered + p2/m2 + rolls ~ 26 planes
        tm_max = tm_for(10, 26)
        if tm_max < 1:
            raise ValueError(
                f"momentum3d kernel: cross-section {N1}x{N2} "
                f"exceeds VMEM even per-component"
            )
    TM = int(min(tile_slabs, tm_max, N0))
    while N0 % TM:
        TM -= 1
    ntiles = N0 // TM

    # Band-content-driven skipping: every roll/patch whose
    # coefficients are identically zero for this grid/BC combination
    # is elided at trace time (e.g. periodic axes have no one-sided
    # +-2 Laplacian rows; VELOCITY boundaries zero the boundary-face
    # convection row, making the hi-factor patch a no-op).
    def _nz(B, r, i=None):
        w = B[r] if i is None else B[r][i]
        return bool(np.any(w != 0.0))

    p2_used = [_nz(B0, _mom3d_L(c, 2)) for c in range(3)]
    m2_used = [_nz(B0, _mom3d_L(c, -2)) for c in range(3)]
    l2m_used = [_nz(B1, _mom3d_L(c, -2)) for c in range(3)]
    l2p_used = [_nz(B1, _mom3d_L(c, 2)) for c in range(3)]
    k2m_used = [_nz(B2, _mom3d_L(c, -2)) for c in range(3)]
    k2p_used = [_nz(B2, _mom3d_L(c, 2)) for c in range(3)]
    conv_rows = [_mom3d_CV(var, 1, off)
                 for var in (0, 1) for off in (-1, 0, 1)]
    gN1 = B1.shape[1]  # global extent (flags use global content)
    gN2 = B2.shape[1]
    need_patch1 = h1 or ((not per[1]) and any(
        _nz(B1, r, gN1 - 1) for r in conv_rows
    ))
    need_patch2 = h2 or ((not per[2]) and any(
        _nz(B2, r, gN2 - 1) for r in conv_rows
    ))

    def make_kernel(comps):
        ncomp = len(comps)
        nfv = 9 if ncomp == 3 else ncomp * 3

        def kernel(b0r, b1r, b2r, *refs):
            i = 0
            V = refs[i:i + 3]; i += 3          # blocked (TM, N1, N2)
            FU = refs[i:i + 3]; i += 3         # lo factors of U0
            FV = refs[i:i + nfv]; i += nfv     # lo factors v0f[d][c]
            VUE = refs[i:i + 3]; i += 3        # v up edges (1,N1,N2)
            VDE = refs[i:i + 3]; i += 3        # v down edges
            P2 = refs[i:i + ncomp]; i += ncomp   # v[2] planes
            M2 = refs[i:i + ncomp]; i += ncomp   # v[N0-3] planes
            FE0 = refs[i:i + 1 + ncomp]; i += 1 + ncomp  # ax-0 hi edges
            PA1 = refs[i:i + 1 + ncomp]; i += 1 + ncomp  # ax-1 patches
            PA2 = refs[i:i + 1 + ncomp]; i += 1 + ncomp  # ax-2 patches
            VL1 = VR1 = VL2 = VR2 = None
            if h1:
                VL1 = refs[i:i + 3]; i += 3  # (TM,1,N2) low-nb rows
                VR1 = refs[i:i + 3]; i += 3  # high-neighbor rows
            if h2:
                VL2 = refs[i:i + 3]; i += 3  # (TM,N1,1) low-nb cols
                VR2 = refs[i:i + 3]; i += 3
            OUT = refs[i:i + ncomp]

            def fv(d, c):
                # v0f[d][c] lo-factor ref: axis-major (3d+c) in the
                # full layout, comp-major (3*ci+d) in split layouts
                if ncomp == 3:
                    return FV[3 * d + c]
                return FV[comps.index(c) * 3 + d]

            base = pl.program_id(0) * TM
            rows = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
            lastrow = rows == N1 - 1
            lastcol = cols == N2 - 1

            def hi1(lo, patch):
                # axis-1 high factor: shift -1 on sublanes; last-row
                # patch only when its coeffs can be nonzero there
                r = _roll(lo, N1 - 1, 0)
                return jnp.where(lastrow, patch, r) \
                    if need_patch1 else r

            def hi2(lo, patch):
                r = _roll(lo, N2 - 1, 1)
                return jnp.where(lastcol, patch, r) \
                    if need_patch2 else r

            for s in range(TM):
                P = [V[e][s] for e in range(3)]
                UP = [VUE[e][0] if s == 0 else V[e][s - 1]
                      for e in range(3)]
                DN = [VDE[e][0] if s == TM - 1 else V[e][s + 1]
                      for e in range(3)]
                # in-plane +-1 shifts (axis1 = sublanes, axis2 =
                # lanes), built LAZILY so a split kernel only
                # materializes the rolls its component needs;
                # wrapped reads are annihilated by zero boundary
                # band entries (non-periodic) or correct (periodic)
                roll_cache = {}

                def rolled(kind, e):
                    key = (kind, e)
                    if key not in roll_cache:
                        sh = {"1m": (1, 0), "1p": (N1 - 1, 0),
                              "2m": (1, 1), "2p": (N2 - 1, 1)}[kind]
                        r = _roll(P[e], *sh)
                        # shard-halo patches: the in-plane roll wraps
                        # at the SHARD boundary where coefficients
                        # are nonzero, so substitute the ppermuted
                        # neighbor row/column (zeros at global
                        # non-periodic boundaries)
                        if h1 and kind == "1m":
                            r = jnp.where(rows == 0, VL1[e][s], r)
                        elif h1 and kind == "1p":
                            r = jnp.where(lastrow, VR1[e][s], r)
                        elif h2 and kind == "2m":
                            r = jnp.where(cols == 0, VL2[e][s], r)
                        elif h2 and kind == "2p":
                            r = jnp.where(lastcol, VR2[e][s], r)
                        roll_cache[key] = r
                    return roll_cache[key]

                # face factors at this slab: lo directly, hi derived
                FlU0 = FU[0][s]
                FrU0 = FE0[0][0] if s == TM - 1 else FU[0][s + 1]
                FlU1 = FU[1][s]
                FrU1 = hi1(FU[1][s], PA1[0][s])
                FlU2 = FU[2][s]
                FrU2 = hi2(FU[2][s], PA2[0][s])
                Flv0 = {c: fv(0, c)[s] for c in comps}
                Frv0 = {
                    c: (FE0[1 + comps.index(c)][0] if s == TM - 1
                        else fv(0, c)[s + 1])
                    for c in comps
                }
                Flv1 = {c: fv(1, c)[s] for c in comps}
                Frv1 = {
                    c: hi1(fv(1, c)[s], PA1[1 + comps.index(c)][s])
                    for c in comps
                }
                Flv2 = {c: fv(2, c)[s] for c in comps}
                Frv2 = {
                    c: hi2(fv(2, c)[s], PA2[1 + comps.index(c)][s])
                    for c in comps
                }

                # ---- axis 0: bands are SMEM scalars at base+s ------
                def s0(r):
                    return b0r[r, base + s]

                def sum0(weights_row, e):
                    # weighted (off -1, 0, +1) combo along axis 0
                    return (weights_row[0] * UP[e]
                            + weights_row[1] * P[e]
                            + weights_row[2] * DN[e])

                # norm-variant convection sums on v_0 (shared by all c)
                nl0 = sum0(
                    [s0(_mom3d_CV(1, 0, o)) for o in (-1, 0, 1)], 0
                )
                nr0 = sum0(
                    [s0(_mom3d_CV(1, 1, o)) for o in (-1, 0, 1)], 0
                )
                tl0w = [s0(_mom3d_CV(0, 0, o)) for o in (-1, 0, 1)]
                tr0w = [s0(_mom3d_CV(0, 1, o)) for o in (-1, 0, 1)]

                # ---- axis 1: bands broadcast over sublanes ---------
                def w1(r):
                    return b1r[r, :][:, None]

                def sum1(rowfn, var, lr, e):
                    return (rowfn(_mom3d_CV(var, lr, -1))
                            * rolled("1m", e)
                            + rowfn(_mom3d_CV(var, lr, 0)) * P[e]
                            + rowfn(_mom3d_CV(var, lr, 1))
                            * rolled("1p", e))

                nl1 = sum1(w1, 1, 0, 1)
                nr1 = sum1(w1, 1, 1, 1)

                # ---- axis 2: bands broadcast over lanes ------------
                def w2(r):
                    return b2r[r, :][None, :]

                def sum2(rowfn, var, lr, e):
                    return (rowfn(_mom3d_CV(var, lr, -1))
                            * rolled("2m", e)
                            + rowfn(_mom3d_CV(var, lr, 0)) * P[e]
                            + rowfn(_mom3d_CV(var, lr, 1))
                            * rolled("2p", e))

                nl2 = sum2(w2, 1, 0, 2)
                nr2 = sum2(w2, 1, 1, 2)

                for c in comps:
                    ci = comps.index(c)
                    acc = P[c]

                    # Laplacian, axis 0 (+-2 one-sided rows via the
                    # dedicated planes; coefficients are zero away
                    # from the global boundary rows)
                    acc = (acc + s0(_mom3d_L(c, -1)) * UP[c]
                           + s0(_mom3d_L(c, 0)) * P[c]
                           + s0(_mom3d_L(c, 1)) * DN[c])
                    if s == 0 and p2_used[c]:
                        acc = acc + s0(_mom3d_L(c, 2)) * P2[ci][0]
                    if s == TM - 1 and m2_used[c]:
                        acc = acc + s0(_mom3d_L(c, -2)) * M2[ci][0]

                    # Laplacian, axes 1/2 (-1..1 always; one-sided
                    # +-2 rolls only when the band rows are nonzero)
                    acc = (acc
                           + w1(_mom3d_L(c, -1)) * rolled("1m", c)
                           + w1(_mom3d_L(c, 0)) * P[c]
                           + w1(_mom3d_L(c, 1)) * rolled("1p", c))
                    if l2m_used[c]:
                        acc = acc + w1(_mom3d_L(c, -2)) * _roll(
                            P[c], 2, 0)
                    if l2p_used[c]:
                        acc = acc + w1(_mom3d_L(c, 2)) * _roll(
                            P[c], N1 - 2, 0)
                    acc = (acc
                           + w2(_mom3d_L(c, -1)) * rolled("2m", c)
                           + w2(_mom3d_L(c, 0)) * P[c]
                           + w2(_mom3d_L(c, 1)) * rolled("2p", c))
                    if k2m_used[c]:
                        acc = acc + w2(_mom3d_L(c, -2)) * _roll(
                            P[c], 2, 1)
                    if k2p_used[c]:
                        acc = acc + w2(_mom3d_L(c, 2)) * _roll(
                            P[c], N2 - 2, 1)

                    # convection, axis 0
                    al = Flv0[c] + (FlU0 if c == 0 else 0.0)
                    ar = Frv0[c] + (FrU0 if c == 0 else 0.0)
                    acc = acc + al * nl0 + ar * nr0
                    if c != 0:
                        acc = (acc + FlU0 * sum0(tl0w, c)
                               + FrU0 * sum0(tr0w, c))

                    # convection, axis 1
                    al = Flv1[c] + (FlU1 if c == 1 else 0.0)
                    ar = Frv1[c] + (FrU1 if c == 1 else 0.0)
                    acc = acc + al * nl1 + ar * nr1
                    if c != 1:
                        acc = (acc + FlU1 * sum1(w1, 0, 0, c)
                               + FrU1 * sum1(w1, 0, 1, c))

                    # convection, axis 2
                    al = Flv2[c] + (FlU2 if c == 2 else 0.0)
                    ar = Frv2[c] + (FrU2 if c == 2 else 0.0)
                    acc = acc + al * nl2 + ar * nr2
                    if c != 2:
                        acc = (acc + FlU2 * sum2(w2, 0, 0, c)
                               + FrU2 * sum2(w2, 0, 1, c))

                    OUT[ci][s] = acc.astype(dtype)

        return kernel

    big = pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    edge = pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    if self_edges:
        # v up/down edge planes read DIRECTLY from the v arrays via
        # shifted block-index maps (no host-side edge building — the
        # r5 Poisson-kernel finding, PROBE_POISSON512.json): tile i's
        # up edge is plane i*TM-1, wrapping to N0-1 at i=0 (correct
        # for periodic axis 0; annihilated by the zero boundary band
        # entries otherwise — asserted by build_momentum_apply_3d),
        # and the down edge is plane (i+1)*TM, wrapping to 0.
        ue_self = pl.BlockSpec(
            (1, N1, N2),
            lambda i: (jnp.where(i == 0, N0 - 1, i * TM - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        de_self = pl.BlockSpec(
            (1, N1, N2),
            lambda i: (jnp.where(i == ntiles - 1, 0, (i + 1) * TM),
                       0, 0),
            memory_space=pltpu.VMEM,
        )
        vedge_specs = [ue_self] * 3 + [de_self] * 3
    else:
        vedge_specs = [edge] * 6
    fixplane = pl.BlockSpec((1, N1, N2), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    pa1 = pl.BlockSpec((TM, 1, N2), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    pa2 = pl.BlockSpec((TM, N1, 1), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    def make_call(comps):
        ncomp = len(comps)
        nfv = 9 if ncomp == 3 else ncomp * 3
        return pl.pallas_call(
            make_kernel(comps),
            out_shape=tuple(
                jax.ShapeDtypeStruct((N0, N1, N2), dtype)
                for _ in range(ncomp)
            ),
            grid=(ntiles,),
            in_specs=(
                [pl.BlockSpec(memory_space=pltpu.SMEM)]       # b0
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2  # b1 b2
                + [big] * (6 + nfv)                # v + FU + FV
                + vedge_specs                      # v ue/de
                + [fixplane] * (2 * ncomp)         # p2/m2
                + [edge] * (1 + ncomp)             # FE0
                + [pa1] * (1 + ncomp) + [pa2] * (1 + ncomp)
                + ([pa1] * 6 if h1 else [])        # VL1/VR1
                + ([pa2] * 6 if h2 else [])        # VL2/VR2
            ),
            out_specs=tuple(big for _ in range(ncomp)),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=150 * ncomp * N0 * N1 * N2,
                bytes_accessed=(7 + ncomp * 4) * N0 * N1 * N2
                * np.dtype(np.float32).itemsize,
                transcendentals=0,
            ),
        )

    calls = (
        [make_call((0, 1, 2))] if not split
        else [make_call((c,)) for c in range(3)]
    )
    return calls, split, TM, ntiles


def build_momentum_apply_3d(mesh, axbcs, rho, mu, dt, dtype,
                            *, tile_slabs=8, interpret=False,
                            force_split=False):
    """Returns (prep, apply):
      factors = prep(U0, v0f)   -- once per step (inside the jitted
                                   step program)
      Av      = apply(v, factors)

    Two fusion modes, chosen by the VMEM model:
      - full: one kernel writes all 3 components (18 big streams,
        ~36 live planes/slab) — the fastest form, needs a small
        cross-section (up to ~128x256 f32).
      - split: one kernel PER component (10 big streams each, ~20
        live planes) — 30/21 more HBM traffic, but fits the
        256x256 cross-section of the BASELINE #5 channel where the
        full fusion VMEM-clamps (VERDICT r3 item 2: no
        size-conditional XLA fallback on the hot path).

    Raises ValueError when the grid does not fit either mode's
    alignment/VMEM constraints (callers fall back to the XLA path).
    """
    N0, N1, N2 = mesh.N
    per = mesh.periodic
    B0, B1, B2 = build_momentum_bands_3d(mesh, axbcs, rho, mu, dt)
    # self-edge form safety (see momentum3d_raw_calls): on a
    # non-periodic axis 0 the tile-0 up edge / last-tile down edge
    # wrap to the opposite boundary plane, which is only correct if
    # every -1-offset band entry is zero at row 0 and every +1-offset
    # entry at row N0-1 (BC folding guarantees this; assert so a
    # table change cannot silently corrupt the kernel).
    if not per[0]:
        m1_rows = [_mom3d_L(c, -1) for c in range(3)] + [
            _mom3d_CV(var, lr, -1) for var in (0, 1) for lr in (0, 1)
        ]
        p1_rows = [_mom3d_L(c, 1) for c in range(3)] + [
            _mom3d_CV(var, lr, 1) for var in (0, 1) for lr in (0, 1)
        ]
        assert not any(np.any(B0[r][..., 0]) for r in m1_rows)
        assert not any(np.any(B0[r][..., N0 - 1]) for r in p1_rows)
    calls, split, TM, ntiles = momentum3d_raw_calls(
        N0, N1, N2, per, B0, B1, B2, dtype,
        tile_slabs=tile_slabs, interpret=interpret,
        force_split=force_split, self_edges=True,
    )
    band_dt = _coef_dtype(dtype)
    b0 = jnp.asarray(B0, band_dt)   # SMEM (27, N0)
    b1 = jnp.asarray(B1, band_dt)   # VMEM (27, N1)
    b2 = jnp.asarray(B2, band_dt)   # VMEM (27, N2)

    def lo_and_hilast(F, a):
        """Cell-shaped lo slice of face array F along axis a, plus the
        plane of high-face values at the top boundary (for periodic
        axes the face array is already cell-shaped and the 'top'
        wraps to index 0)."""
        if per[a]:
            lo = F
            hilast = jax.lax.index_in_dim(F, 0, axis=a)
        else:
            n = mesh.N[a]
            lo = jax.lax.slice_in_dim(F, 0, n, axis=a)
            hilast = jax.lax.index_in_dim(F, n, axis=a)
        return lo, hilast

    def fe0_edges(lo, hilast):
        """de-style axis-0 hi edges: fe[i] = lo[(i+1)*TM] for
        i < ntiles-1; fe[-1] = hilast."""
        lo4 = lo.reshape(ntiles, TM, N1, N2)
        fe = jnp.concatenate(
            [lo4[1:, 0], hilast.reshape(1, N1, N2)], axis=0
        )
        return fe

    def prep(U0, v0f):
        """Once per step: slice the 12 face-factor arrays into the
        kernel's lo/edge/patch buffers."""
        srcs = [U0[0], v0f[0][0], v0f[0][1], v0f[0][2]]
        lo0, fe0 = [], []
        for F in srcs:
            lo, hilast = lo_and_hilast(F, 0)
            lo0.append(lo.astype(dtype))
            fe0.append(fe0_edges(lo.astype(dtype),
                                 hilast.astype(dtype)))
        lo1, pa1v = [], []
        for F in [U0[1], v0f[1][0], v0f[1][1], v0f[1][2]]:
            lo, hilast = lo_and_hilast(F, 1)
            lo1.append(lo.astype(dtype))
            pa1v.append(hilast.reshape(N0, 1, N2).astype(dtype))
        lo2, pa2v = [], []
        for F in [U0[2], v0f[2][0], v0f[2][1], v0f[2][2]]:
            lo, hilast = lo_and_hilast(F, 2)
            lo2.append(lo.astype(dtype))
            pa2v.append(hilast.reshape(N0, N1, 1).astype(dtype))
        return {
            "FU": (lo0[0], lo1[0], lo2[0]),
            "FV": tuple(lo0[1:]) + tuple(lo1[1:]) + tuple(lo2[1:]),
            "FE0": tuple(fe0),
            "PA1": (pa1v[0],) + tuple(pa1v[1:]),
            "PA2": (pa2v[0],) + tuple(pa2v[1:]),
        }

    def apply(v, factors):
        v = tuple(x.astype(dtype) for x in v)
        # self-edge form: the kernels read the cross-tile edge planes
        # directly from v via shifted block-index maps — pass the v
        # arrays again as the ue/de operands (no host-side edge
        # building; r5 finding, PROBE_POISSON512.json)
        p2 = tuple(x[2:3] for x in v)
        m2 = tuple(x[N0 - 3:N0 - 2] for x in v)
        if not split:
            return calls[0](
                b0, b1, b2,
                *v, *factors["FU"], *factors["FV"],
                *v, *v, *p2, *m2,
                *factors["FE0"], *factors["PA1"], *factors["PA2"],
            )
        outs = []
        for c in range(3):
            fv_c = tuple(factors["FV"][3 * d + c] for d in range(3))
            (out_c,) = calls[c](
                b0, b1, b2,
                *v, *factors["FU"], *fv_c,
                *v, *v, p2[c], m2[c],
                factors["FE0"][0], factors["FE0"][1 + c],
                factors["PA1"][0], factors["PA1"][1 + c],
                factors["PA2"][0], factors["PA2"][1 + c],
            )
            outs.append(out_c)
        return tuple(outs)

    return prep, apply

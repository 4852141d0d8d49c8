"""Fused 3-D interp/div/grad chain kernels (VERDICT r2 item 2).

The coupled-apply epilogue and the ABF pre/post stages each chain
4-6 banded operators over the (v, U, p) state (reference blocks G, T,
R=TG-Gst, D, Gst of cnlinearcart3d.c). On the XLA path every banded
sweep materializes shifted copies and re-reads its operands from HBM;
at 128^3 the chains cost more than the fused momentum kernel itself.
These kernels compute each stage in ONE pass over the state:

  coupled(Av, v, U, p):  out_v = Av + G p
                         out_U = U - T v - R p          (face arrays)
                         out_p = D U
  abf_pre(v, rU, rp):    Ustar = rU + T v
                         out_rp = rp - D rU - (D.T) v   (D∘T composed
                                                         on host to a
                                                         cell tridiag)
  abf_post(vs, Ust, p):  out_v = vs - G p
                         out_U = Ust - Gst p

Layout strategy is the proven momentum-kernel pattern
(ops/pallas_stencil.build_momentum_apply_3d): grid over axis-0 slab
tiles, per-slab 2-D plane arithmetic with sublane/lane rolls for the
axis-1/2 neighbors (wrapped reads annihilated by the zero boundary
coefficients the BC fold bakes into the tables), SMEM scalar bands
for axis 0 with explicit cross-tile edge planes, and face arrays in
"lo" form (faces 0..N-1, cell-shaped) with the top boundary face
produced by a tiny XLA epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fluca_tpu.ops.banded import compose_axis_stencils
from fluca_tpu.ops.pallas_stencil import _roll

# band-row packing (per axis, rows x N). Offsets are those that can
# be NONZERO in the lo-face rows (0..N-1) across all BC types —
# enumerated empirically over every lo/hi combination of VELOCITY,
# PRESSURE_OUTLET, SYMMETRY, PERIODIC on non-uniform grids; the wider
# one-sided stencils of the top boundary face live only at face N,
# which the XLA epilogue produces. build_chain_bands raises when a
# band falls outside these ranges (callers fall back to XLA).
#   G   cell->cell   offsets -2..2 -> rows 0..4   (x dt/rho)
#   T   cell->face   offsets -1..1 -> rows 5..7
#   R   cell->face   offsets -2..2 -> rows 8..12  (x dt/rho)
#   D   face->cell   offsets 0,1   -> rows 13..14
#   Gst cell->face   offsets -1..1 -> rows 15..17 (x dt/rho)
#   DT  cell->cell   offsets -1..1 -> rows 18..20 (D compose T)
_NROWS = 21


def _rG(off):
    return off + 2


def _rT(off):
    return off + 6


def _rR(off):
    return off + 10


def _rD(off):
    return off + 13


def _rGst(off):
    return off + 16


def _rDT(off):
    return off + 19


def build_chain_bands(mesh, axbcs, rho, dt):
    """Packed per-axis numpy band arrays + the host stencils needed
    for the top-face XLA epilogues."""
    from fluca_tpu.ns import tables as T_

    s_g = dt / rho
    bands, host = [], []
    for a in range(mesh.dim):
        Na = mesh.N[a]
        B = np.zeros((_NROWS, Na))

        def put(rowfn, lo, hi, off, w, scale, trim):
            w = np.asarray(w, dtype=np.float64)
            if trim:
                w = w[:Na]
            if not np.any(w != 0.0):
                return
            if not lo <= off <= hi:
                raise ValueError(
                    f"chain3d: unsupported band offset {off} "
                    f"(axis {a})"
                )
            B[rowfn(off)] = scale * w

        g, _, _ = T_.grad_cell_tables(mesh, a, axbcs[a])
        for off, w in g.as_dict().items():
            put(_rG, -2, 2, off, w, s_g, False)
        ti, _, _ = T_.interp_tables(mesh, a, axbcs[a], a)
        for off, w in ti.as_dict().items():
            put(_rT, -1, 1, off, w, 1.0, True)
        gst, _, _ = T_.gst_tables(mesh, a, axbcs[a])
        comp = compose_axis_stencils(ti, g)
        rb = {off: np.array(w) for off, w in comp.as_dict().items()}
        for off, w in gst.as_dict().items():
            rb[off] = rb.get(off, np.zeros(mesh.nfaces(a))) - w
        for off, w in rb.items():
            put(_rR, -2, 2, off, w, s_g, True)
        dv = T_.div_tables(mesh, a)
        for off, w in dv.as_dict().items():
            put(_rD, 0, 1, off, w, 1.0, False)
        for off, w in gst.as_dict().items():
            put(_rGst, -1, 1, off, w, s_g, True)
        dtc = compose_axis_stencils(dv, ti)
        for off, w in dtc.as_dict().items():
            put(_rDT, -1, 1, off, w, 1.0, False)
        bands.append(B)
        host.append({
            "T": ti, "Gst": gst, "R": rb, "D": dv, "s_g": s_g,
        })
    return bands, host


def _face_top_plane(stencil_dict, scale, x, d, nf, N):
    """Apply the face-banded operator at its LAST face (index nf-1):
    the one row the lo-form kernels do not produce. Returns a size-1
    plane along axis d."""
    acc = None
    for off, w in stencil_dict.items():
        j = nf - 1 + off
        wv = float(np.asarray(w)[nf - 1])
        if 0 <= j < N and wv != 0.0:
            t = wv * lax.slice_in_dim(x, j, j + 1, axis=d)
            acc = t if acc is None else acc + t
    if acc is None:
        shape = list(x.shape)
        shape[d] = 1
        return jnp.zeros(shape, x.dtype)
    return scale * acc


class Chain3D:
    """Fused chain stages for one (mesh, bcs, rho, dt, dtype).

    Raises ValueError at build time when the grid does not fit the
    kernel's alignment/VMEM constraints (callers fall back to the
    XLA banded path).
    """

    def __init__(self, mesh, axbcs, rho, dt, dtype, *,
                 tile_slabs=8, interpret=False):
        N0, N1, N2 = mesh.N
        if not interpret and (N0 < 8 or N1 % 8 or N2 % 128):
            # Mosaic in-plane roll/iota alignment (interpret mode has
            # no layout constraints)
            raise ValueError("chain3d kernel: unaligned grid")
        self.mesh = mesh
        self.dtype = dtype
        self.per = mesh.periodic
        self.interpret = interpret

        BANDS, self.host = build_chain_bands(mesh, axbcs, rho, dt)
        self.b0 = jnp.asarray(BANDS[0], dtype)  # SMEM (18, N0)
        self.b1 = jnp.asarray(BANDS[1], dtype)  # VMEM (18, N1)
        self.b2 = jnp.asarray(BANDS[2], dtype)  # VMEM (18, N2)
        self.BANDS = BANDS

        # VMEM sizing: worst mode (coupled) has 17 blocked big refs
        plane = N1 * N2 * np.dtype(np.float32).itemsize
        budget = (14 << 20) - 40 * plane
        tm_max = budget // (2 * 17 * plane)
        if tm_max < 2:
            raise ValueError(
                f"chain3d kernel: cross-section {N1}x{N2} exceeds VMEM"
            )
        TM = int(min(tile_slabs, tm_max, N0))
        while N0 % TM or TM < 2:
            TM -= 1
            if TM < 2:
                raise ValueError("chain3d kernel: no valid tile size")
        self.TM = TM
        self.ntiles = N0 // TM

        # band-content flags (elide dead rolls at trace time)
        def nz(B, r):
            return bool(np.any(B[r] != 0.0))

        self.gm2 = [nz(BANDS[a], _rG(-2)) for a in range(3)]
        self.gp2 = [nz(BANDS[a], _rG(2)) for a in range(3)]
        self.rm2 = [nz(BANDS[a], _rR(-2)) for a in range(3)]
        self.rp1 = [nz(BANDS[a], _rR(1)) for a in range(3)]
        self.rp2 = [nz(BANDS[a], _rR(2)) for a in range(3)]
        self.tp1 = [nz(BANDS[a], _rT(1)) for a in range(3)]
        self.gstp1 = [nz(BANDS[a], _rGst(1)) for a in range(3)]

        self._coupled = self._build("coupled")
        self._abf_pre = self._build("abf_pre")
        self._abf_post = self._build("abf_post")

    # ------------------------------------------------------------------
    # edge-plane helpers (XLA side)
    # ------------------------------------------------------------------
    def _cell_edges(self, x, *, up1=False, up2=False, dn1=False,
                    dn2=False):
        """(ntiles, N1, N2) planes of x at the rows just outside each
        tile: up1[i] = x[i*TM-1], up2[i] = x[i*TM-2],
        dn1[i] = x[(i+1)*TM], dn2[i] = x[(i+1)*TM+1]; zero
        (non-periodic) or wrapped (periodic) at the global ends."""
        N0, N1, N2 = self.mesh.N
        TM, ntiles = self.TM, self.ntiles
        per0 = self.per[0]
        x4 = x.reshape(ntiles, TM, N1, N2)
        out = []
        if up1:
            e = jnp.zeros((ntiles, N1, N2), self.dtype)
            e = e.at[1:].set(x4[:-1, TM - 1])
            if per0:
                e = e.at[0].set(x[N0 - 1])
            out.append(e)
        if up2:
            e = jnp.zeros((ntiles, N1, N2), self.dtype)
            e = e.at[1:].set(x4[:-1, TM - 2])
            if per0:
                e = e.at[0].set(x[N0 - 2])
            out.append(e)
        if dn1:
            e = jnp.zeros((ntiles, N1, N2), self.dtype)
            e = e.at[:-1].set(x4[1:, 0])
            if per0:
                e = e.at[ntiles - 1].set(x[0])
            out.append(e)
        if dn2:
            e = jnp.zeros((ntiles, N1, N2), self.dtype)
            if TM >= 2:
                e = e.at[:-1].set(x4[1:, 1])
            if per0:
                e = e.at[ntiles - 1].set(x[1 % N0])
            out.append(e)
        return out

    def _face_lo_dn1(self, F, d0_full):
        """dn1 edges for a face array along axis 0: dn1[i] =
        F_full[(i+1)*TM] — the top face exists in the full array, so
        no zero case."""
        TM, ntiles = self.TM, self.ntiles
        N0 = self.mesh.N[0]
        if self.per[0]:
            lo = F
            rows = [(i + 1) * TM % N0 for i in range(ntiles)]
        else:
            lo = lax.slice_in_dim(F, 0, N0, axis=0)
            rows = [(i + 1) * TM for i in range(ntiles)]
        planes = [
            lax.slice_in_dim(F, r, r + 1, axis=0) for r in rows
        ]
        return lo, jnp.concatenate(planes, axis=0)

    def _face_lo_patch(self, F, d):
        """(lo, top_patch) for an in-plane face axis d in {1,2}: lo is
        cell-shaped; top_patch is the face-N plane used where the
        in-plane roll wraps (periodic: wrap is already correct, patch
        unused)."""
        n = self.mesh.N[d]
        if self.per[d]:
            return F, lax.slice_in_dim(F, 0, 1, axis=d)
        return (
            lax.slice_in_dim(F, 0, n, axis=d),
            lax.slice_in_dim(F, n, n + 1, axis=d),
        )

    def _p_boundary_planes(self, p):
        """p[2] and p[N0-3] planes for the one-sided axis-0 G rows
        (zero-coefficient away from the boundary, momentum-kernel
        trick)."""
        N0 = self.mesh.N[0]
        return p[2:3], p[N0 - 3:N0 - 2]

    # ------------------------------------------------------------------
    def _build(self, which):
        mesh = self.mesh
        N0, N1, N2 = mesh.N
        TM, ntiles = self.TM, self.ntiles
        dtype = self.dtype
        per = self.per
        gm2, gp2 = self.gm2, self.gp2
        rm2, rp1, rp2 = self.rm2, self.rp1, self.rp2
        tp1, gstp1 = self.tp1, self.gstp1
        need_patch1 = not per[1]
        need_patch2 = not per[2]

        n_big = {"coupled": 17, "abf_pre": 11, "abf_post": 13}[which]

        def kernel(b0r, b1r, b2r, *refs):
            base = pl.program_id(0) * TM
            rows = lax.broadcasted_iota(jnp.int32, (N1, N2), 0)
            cols = lax.broadcasted_iota(jnp.int32, (N1, N2), 1)
            lastrow = rows == N1 - 1
            lastcol = cols == N2 - 1

            def s0(r, s):
                return b0r[r, base + s]

            def w1(r):
                return b1r[r, :][:, None]

            def w2(r):
                return b2r[r, :][None, :]

            def hi1(lo, patch):
                r = _roll(lo, N1 - 1, 0)
                return (
                    jnp.where(lastrow, patch, r) if need_patch1 else r
                )

            def hi2(lo, patch):
                r = _roll(lo, N2 - 1, 1)
                return (
                    jnp.where(lastcol, patch, r) if need_patch2 else r
                )

            def gradG(c, s, P, up1, dn1, P2, M2, A1m, A1p, A2m, A2p):
                """G_c p contribution (scaled bands)."""
                if c == 0:
                    acc = (s0(_rG(-1), s) * up1 + s0(_rG(0), s) * P
                           + s0(_rG(1), s) * dn1)
                    if gp2[0] and s == 0:
                        acc = acc + s0(_rG(2), s) * P2[0]
                    if gp2[0] and s != 0 and s + 2 < TM:
                        pass  # interior +2 rows are zero by fold
                    if gm2[0] and s == TM - 1:
                        acc = acc + s0(_rG(-2), s) * M2[0]
                    return acc
                if c == 1:
                    acc = (w1(_rG(-1)) * A1m + w1(_rG(0)) * P
                           + w1(_rG(1)) * A1p)
                    if gm2[1]:
                        acc = acc + w1(_rG(-2)) * _roll(P, 2, 0)
                    if gp2[1]:
                        acc = acc + w1(_rG(2)) * _roll(
                            P, N1 - 2, 0)
                    return acc
                acc = (w2(_rG(-1)) * A2m + w2(_rG(0)) * P
                       + w2(_rG(1)) * A2p)
                if gm2[2]:
                    acc = acc + w2(_rG(-2)) * _roll(P, 2, 1)
                if gp2[2]:
                    acc = acc + w2(_rG(2)) * _roll(P, N2 - 2, 1)
                return acc

            if which == "coupled":
                AV = refs[0:3]
                V = refs[3:6]
                Pp = refs[6]
                UL = refs[7:10]
                v0ue, v0de = refs[10], refs[11]
                pue1, pue2, pde1, pde2 = (
                    refs[12], refs[13], refs[14], refs[15]
                )
                u0de = refs[16]
                P2, M2 = refs[17], refs[18]
                u1top, u2top = refs[19], refs[20]
                OUTV = refs[21:24]
                OUTU = refs[24:27]
                OUTP = refs[27]
                for s in range(TM):
                    P = Pp[s]
                    p_up1 = pue1[0] if s == 0 else Pp[s - 1]
                    p_up2 = (
                        pue2[0] if s == 0
                        else (pue1[0] if s == 1 else Pp[s - 2])
                    )
                    p_dn1 = pde1[0] if s == TM - 1 else Pp[s + 1]
                    p_dn2 = (
                        pde1[0] if s == TM - 2
                        else (pde2[0] if s == TM - 1 else Pp[s + 2])
                    )
                    A1m = _roll(P, 1, 0)
                    A1p = _roll(P, N1 - 1, 0)
                    A2m = _roll(P, 1, 1)
                    A2p = _roll(P, N2 - 1, 1)

                    # out_v = Av + G p
                    for c in range(3):
                        OUTV[c][s] = AV[c][s] + gradG(
                            c, s, P, p_up1, p_dn1, P2, M2,
                            A1m, A1p, A2m, A2p,
                        )

                    # out_U = U - T v - R p (lo faces)
                    v0_up = v0ue[0] if s == 0 else V[0][s - 1]
                    v0_dn = v0de[0] if s == TM - 1 else V[0][s + 1]
                    t0 = (s0(_rT(-1), s) * v0_up
                          + s0(_rT(0), s) * V[0][s])
                    if tp1[0]:
                        t0 = t0 + s0(_rT(1), s) * v0_dn
                    r0 = (s0(_rR(-1), s) * p_up1
                          + s0(_rR(0), s) * P)
                    if rm2[0]:
                        r0 = r0 + s0(_rR(-2), s) * p_up2
                    if rp1[0]:
                        r0 = r0 + s0(_rR(1), s) * p_dn1
                    if rp2[0]:
                        r0 = r0 + s0(_rR(2), s) * p_dn2
                    OUTU[0][s] = UL[0][s] - t0 - r0

                    v1 = V[1][s]
                    t1 = (w1(_rT(-1)) * _roll(v1, 1, 0)
                          + w1(_rT(0)) * v1)
                    if tp1[1]:
                        t1 = t1 + w1(_rT(1)) * _roll(
                            v1, N1 - 1, 0)
                    r1 = w1(_rR(-1)) * A1m + w1(_rR(0)) * P
                    if rm2[1]:
                        r1 = r1 + w1(_rR(-2)) * _roll(P, 2, 0)
                    if rp1[1]:
                        r1 = r1 + w1(_rR(1)) * A1p
                    if rp2[1]:
                        r1 = r1 + w1(_rR(2)) * _roll(P, N1 - 2, 0)
                    OUTU[1][s] = UL[1][s] - t1 - r1

                    v2 = V[2][s]
                    t2 = (w2(_rT(-1)) * _roll(v2, 1, 1)
                          + w2(_rT(0)) * v2)
                    if tp1[2]:
                        t2 = t2 + w2(_rT(1)) * _roll(
                            v2, N2 - 1, 1)
                    r2 = w2(_rR(-1)) * A2m + w2(_rR(0)) * P
                    if rm2[2]:
                        r2 = r2 + w2(_rR(-2)) * _roll(P, 2, 1)
                    if rp1[2]:
                        r2 = r2 + w2(_rR(1)) * A2p
                    if rp2[2]:
                        r2 = r2 + w2(_rR(2)) * _roll(P, N2 - 2, 1)
                    OUTU[2][s] = UL[2][s] - t2 - r2

                    # out_p = D U
                    u0_dn = u0de[0] if s == TM - 1 else UL[0][s + 1]
                    dp = (s0(_rD(0), s) * UL[0][s]
                          + s0(_rD(1), s) * u0_dn)
                    dp = dp + (w1(_rD(0)) * UL[1][s]
                               + w1(_rD(1)) * hi1(UL[1][s], u1top[s]))
                    dp = dp + (w2(_rD(0)) * UL[2][s]
                               + w2(_rD(1)) * hi2(UL[2][s], u2top[s]))
                    OUTP[s] = dp

            elif which == "abf_pre":
                V = refs[0:3]
                RU = refs[3:6]
                RP = refs[6]
                v0ue, v0de = refs[7], refs[8]
                ru0de = refs[9]
                ru1top, ru2top = refs[10], refs[11]
                OUTU = refs[12:15]
                OUTRP = refs[15]
                for s in range(TM):
                    v0_up = v0ue[0] if s == 0 else V[0][s - 1]
                    v0_dn = v0de[0] if s == TM - 1 else V[0][s + 1]
                    # Ustar = rU + T v
                    t0 = (s0(_rT(-1), s) * v0_up
                          + s0(_rT(0), s) * V[0][s])
                    if tp1[0]:
                        t0 = t0 + s0(_rT(1), s) * v0_dn
                    OUTU[0][s] = RU[0][s] + t0
                    v1 = V[1][s]
                    t1 = (w1(_rT(-1)) * _roll(v1, 1, 0)
                          + w1(_rT(0)) * v1)
                    if tp1[1]:
                        t1 = t1 + w1(_rT(1)) * _roll(
                            v1, N1 - 1, 0)
                    OUTU[1][s] = RU[1][s] + t1
                    v2 = V[2][s]
                    t2 = (w2(_rT(-1)) * _roll(v2, 1, 1)
                          + w2(_rT(0)) * v2)
                    if tp1[2]:
                        t2 = t2 + w2(_rT(1)) * _roll(
                            v2, N2 - 1, 1)
                    OUTU[2][s] = RU[2][s] + t2
                    # out_rp = rp - D rU - DT v
                    ru0_dn = (
                        ru0de[0] if s == TM - 1 else RU[0][s + 1]
                    )
                    acc = (s0(_rD(0), s) * RU[0][s]
                           + s0(_rD(1), s) * ru0_dn
                           + s0(_rDT(-1), s) * v0_up
                           + s0(_rDT(0), s) * V[0][s]
                           + s0(_rDT(1), s) * v0_dn)
                    acc = acc + (
                        w1(_rD(0)) * RU[1][s]
                        + w1(_rD(1)) * hi1(RU[1][s], ru1top[s])
                        + w1(_rDT(-1)) * _roll(v1, 1, 0)
                        + w1(_rDT(0)) * v1
                        + w1(_rDT(1)) * _roll(v1, N1 - 1, 0)
                    )
                    acc = acc + (
                        w2(_rD(0)) * RU[2][s]
                        + w2(_rD(1)) * hi2(RU[2][s], ru2top[s])
                        + w2(_rDT(-1)) * _roll(v2, 1, 1)
                        + w2(_rDT(0)) * v2
                        + w2(_rDT(1)) * _roll(v2, N2 - 1, 1)
                    )
                    OUTRP[s] = RP[s] - acc

            else:  # abf_post
                VS = refs[0:3]
                UST = refs[3:6]
                Pp = refs[6]
                pue1, pde1 = refs[7], refs[8]
                P2, M2 = refs[9], refs[10]
                OUTV = refs[11:14]
                OUTU = refs[14:17]
                for s in range(TM):
                    P = Pp[s]
                    p_up1 = pue1[0] if s == 0 else Pp[s - 1]
                    p_dn1 = pde1[0] if s == TM - 1 else Pp[s + 1]
                    A1m = _roll(P, 1, 0)
                    A1p = _roll(P, N1 - 1, 0)
                    A2m = _roll(P, 1, 1)
                    A2p = _roll(P, N2 - 1, 1)
                    for c in range(3):
                        OUTV[c][s] = VS[c][s] - gradG(
                            c, s, P, p_up1, p_dn1, P2, M2,
                            A1m, A1p, A2m, A2p,
                        )
                    g0 = (s0(_rGst(-1), s) * p_up1
                          + s0(_rGst(0), s) * P)
                    if gstp1[0]:
                        g0 = g0 + s0(_rGst(1), s) * p_dn1
                    OUTU[0][s] = UST[0][s] - g0
                    g1 = w1(_rGst(-1)) * A1m + w1(_rGst(0)) * P
                    if gstp1[1]:
                        g1 = g1 + w1(_rGst(1)) * A1p
                    OUTU[1][s] = UST[1][s] - g1
                    g2 = w2(_rGst(-1)) * A2m + w2(_rGst(0)) * P
                    if gstp1[2]:
                        g2 = g2 + w2(_rGst(1)) * A2p
                    OUTU[2][s] = UST[2][s] - g2

        big = pl.BlockSpec((TM, N1, N2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        edge = pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        fixplane = pl.BlockSpec((1, N1, N2), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        pa1 = pl.BlockSpec((TM, 1, N2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        pa2 = pl.BlockSpec((TM, N1, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

        if which == "coupled":
            in_specs = ([smem, vmem, vmem] + [big] * 10
                        + [edge] * 7 + [fixplane] * 2 + [pa1, pa2])
            n_out = 7
        elif which == "abf_pre":
            in_specs = ([smem, vmem, vmem] + [big] * 7
                        + [edge] * 3 + [pa1, pa2])
            n_out = 4
        else:
            in_specs = ([smem, vmem, vmem] + [big] * 7
                        + [edge] * 2 + [fixplane] * 2)
            n_out = 6

        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((N0, N1, N2), dtype)
                for _ in range(n_out)
            ),
            grid=(ntiles,),
            in_specs=in_specs,
            out_specs=tuple(big for _ in range(n_out)),
            interpret=self.interpret,
            cost_estimate=pl.CostEstimate(
                flops=60 * n_big * N1 * N2 * N0 // 4,
                bytes_accessed=n_big * N0 * N1 * N2
                * np.dtype(np.float32).itemsize,
                transcendentals=0,
            ),
        )

    # ------------------------------------------------------------------
    # public stages (lo-kernel + top-face XLA epilogue)
    # ------------------------------------------------------------------
    def _assemble_face(self, lo, top, d):
        if self.per[d]:
            return lo
        return jnp.concatenate([lo, top], axis=d)

    def _top_T(self, v, d):
        h = self.host[d]
        return _face_top_plane(
            {o: np.asarray(w) for o, w in h["T"].as_dict().items()},
            1.0, v, d, self.mesh.nfaces(d), self.mesh.N[d],
        )

    def _top_R(self, p, d):
        h = self.host[d]
        return _face_top_plane(
            h["R"], h["s_g"], p, d, self.mesh.nfaces(d),
            self.mesh.N[d],
        )

    def _top_Gst(self, p, d):
        h = self.host[d]
        return _face_top_plane(
            {o: np.asarray(w) for o, w in h["Gst"].as_dict().items()},
            h["s_g"], p, d, self.mesh.nfaces(d), self.mesh.N[d],
        )

    def coupled(self, Av, v, U, p):
        """(out_v, out_U, out_p) of the coupled apply given Av."""
        d = self.dtype
        p = p.astype(d)
        v = tuple(x.astype(d) for x in v)
        U = tuple(x.astype(d) for x in U)
        v0ue, v0de = self._cell_edges(v[0], up1=True, dn1=True)
        pue1, pue2, pde1, pde2 = self._cell_edges(
            p, up1=True, up2=True, dn1=True, dn2=True
        )
        U0lo, u0de = self._face_lo_dn1(U[0], 0)
        U1lo, u1top = self._face_lo_patch(U[1], 1)
        U2lo, u2top = self._face_lo_patch(U[2], 2)
        P2, M2 = self._p_boundary_planes(p)
        outs = self._coupled(
            self.b0, self.b1, self.b2,
            *Av, *v, p, U0lo, U1lo, U2lo,
            v0ue, v0de, pue1, pue2, pde1, pde2, u0de, P2, M2,
            u1top, u2top,
        )
        out_v = outs[0:3]
        out_Ulo = outs[3:6]
        out_p = outs[6]
        out_U = []
        for dd in range(3):
            if self.per[dd]:
                out_U.append(out_Ulo[dd])
            else:
                n = self.mesh.N[dd]
                top = (
                    lax.slice_in_dim(U[dd], n, n + 1, axis=dd)
                    - self._top_T(v[dd], dd)
                    - self._top_R(p, dd)
                )
                out_U.append(
                    self._assemble_face(out_Ulo[dd], top, dd)
                )
        return tuple(out_v), tuple(out_U), out_p

    def abf_pre(self, v, rU, rp):
        """(Ustar, out_rp): Ustar = rU + T v; out_rp = rp - D Ustar."""
        d = self.dtype
        v = tuple(x.astype(d) for x in v)
        rU = tuple(x.astype(d) for x in rU)
        rp = rp.astype(d)
        v0ue, v0de = self._cell_edges(v[0], up1=True, dn1=True)
        RU0lo, ru0de = self._face_lo_dn1(rU[0], 0)
        RU1lo, ru1top = self._face_lo_patch(rU[1], 1)
        RU2lo, ru2top = self._face_lo_patch(rU[2], 2)
        outs = self._abf_pre(
            self.b0, self.b1, self.b2,
            *v, RU0lo, RU1lo, RU2lo, rp,
            v0ue, v0de, ru0de, ru1top, ru2top,
        )
        Ulo = outs[0:3]
        out_rp = outs[3]
        Ustar = []
        for dd in range(3):
            if self.per[dd]:
                Ustar.append(Ulo[dd])
            else:
                n = self.mesh.N[dd]
                top = (
                    lax.slice_in_dim(rU[dd], n, n + 1, axis=dd)
                    + self._top_T(v[dd], dd)
                )
                Ustar.append(self._assemble_face(Ulo[dd], top, dd))
        return tuple(Ustar), out_rp

    def abf_post(self, vstar, Ustar, p):
        """(v, U): v = vstar - G p; U = Ustar - Gst p."""
        d = self.dtype
        vstar = tuple(x.astype(d) for x in vstar)
        Ustar = tuple(x.astype(d) for x in Ustar)
        p = p.astype(d)
        pue1, pde1 = self._cell_edges(p, up1=True, dn1=True)
        P2, M2 = self._p_boundary_planes(p)
        U0lo, _ = self._face_lo_dn1(Ustar[0], 0)
        U1lo, _ = self._face_lo_patch(Ustar[1], 1)
        U2lo, _ = self._face_lo_patch(Ustar[2], 2)
        outs = self._abf_post(
            self.b0, self.b1, self.b2,
            *vstar, U0lo, U1lo, U2lo, p,
            pue1, pde1, P2, M2,
        )
        v = outs[0:3]
        Ulo = outs[3:6]
        U = []
        for dd in range(3):
            if self.per[dd]:
                U.append(Ulo[dd])
            else:
                n = self.mesh.N[dd]
                top = (
                    lax.slice_in_dim(Ustar[dd], n, n + 1, axis=dd)
                    - self._top_Gst(p, dd)
                )
                U.append(self._assemble_face(Ulo[dd], top, dd))
        return tuple(v), tuple(U)

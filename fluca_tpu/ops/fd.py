"""Composable finite-difference operator algebra (FlucaFD equivalent).

TPU-native re-design of the reference's general-purpose discretization
layer (fluca/src/fd/*): symbolic stencil operators over staggered
Cartesian grids with five combinators — derivative, sum, scale,
composition, second-order TVD (fluca/src/fd/impls/*) — and per-boundary
NONE/DIRICHLET/NEUMANN condition folding
(fluca/src/fd/utils/fdutils.c:252-464).

Design translation: instead of per-point stencil queries
(FlucaFDGetStencil) feeding a matrix-free sweep or matrix assembly,
an operator here IS a static banded stencil: a dict mapping offset
tuples to dense coefficient arrays over the output grid, plus a
constant array carrying folded boundary values. Application is fused
shifted-slice arithmetic (one XLA kernel); "GetOperator" (assembly)
is replaced by ``to_dense`` for tests. Boundary folding happens at
build time via the same Vandermonde construction the reference uses
(derivative.c:84-107), yielding identical stencils for matching
configurations; stencils never depend on the parallel decomposition
(unlike the reference, where folding happens at ghosted local-grid
boundaries).

Grid locations: each axis of input/output is either cell-centered or
face-staggered (the reference's ELEMENT/LEFT/DOWN/BACK combinations,
fdutils.c:15-33) — encoded as a tuple of booleans ``stag[d]``.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ops.banded import shifted
from fluca_tpu.ops.fdcoeffs import fd_weights


class FDBCType(enum.Enum):
    """Reference: FlucaFDBoundaryConditionType (flucafd.h)."""

    NONE = "none"
    DIRICHLET = "dirichlet"
    NEUMANN = "neumann"


@dataclass(frozen=True)
class FDBC:
    type: FDBCType = FDBCType.NONE
    value: float = 0.0


def _loc_shape(mesh: CartMesh, stag) -> tuple[int, ...]:
    return tuple(
        mesh.nfaces(d) if stag[d] else mesh.N[d] for d in range(mesh.dim)
    )


def _loc_coords(mesh: CartMesh, d: int, stag_d: bool) -> np.ndarray:
    return mesh.face_coords(d) if stag_d else mesh.centers(d)


@dataclass
class StencilOp:
    """A static linear stencil operator + boundary-value constant."""

    mesh: CartMesh
    in_stag: tuple[bool, ...]
    out_stag: tuple[bool, ...]
    bands: dict  # {offset tuple: np.ndarray of out shape}
    const: np.ndarray  # out shape

    # -- application ---------------------------------------------------
    def apply(self, x, include_const: bool = True):
        """y = S x (+ const). x: device array at the input location."""
        mesh = self.mesh
        out_shape = _loc_shape(mesh, self.out_stag)
        y = None
        for off, w in sorted(self.bands.items()):
            xs = x
            for d in range(mesh.dim):
                xs = shifted(
                    xs, d, off[d], out_shape[d], mesh.periodic[d]
                )
            term = jnp.asarray(w, x.dtype) * xs
            y = term if y is None else y + term
        if y is None:
            y = jnp.zeros(out_shape, x.dtype)
        if include_const and np.any(self.const != 0.0):
            y = y + jnp.asarray(self.const, x.dtype)
        return y

    def __call__(self, x):
        return self.apply(x)

    # -- introspection (golden-style tests) ---------------------------
    def row(self, idx: tuple[int, ...]):
        """Sorted [(col_index_tuple, coeff)] for one output point, plus
        the constant term — the analogue of the reference's printed
        stencil tables (fluca/tests/fd/fdtest.h:9-41)."""
        mesh = self.mesh
        n_in = _loc_shape(mesh, self.in_stag)
        entries = []
        for off, w in self.bands.items():
            col = []
            ok = True
            for d in range(mesh.dim):
                j = idx[d] + off[d]
                if mesh.periodic[d]:
                    j %= n_in[d]
                elif not (0 <= j < n_in[d]):
                    ok = False
                    break
                col.append(j)
            if not ok:
                continue
            coeff = float(w[idx])
            if coeff != 0.0:
                entries.append((tuple(col), coeff))
        merged: dict = {}
        for col, v in entries:
            merged[col] = merged.get(col, 0.0) + v
        rows = sorted((c, v) for c, v in merged.items() if v != 0.0)
        return rows, float(self.const[idx])

    def to_dense(self) -> np.ndarray:
        mesh = self.mesh
        n_in = _loc_shape(mesh, self.in_stag)
        n_out = _loc_shape(mesh, self.out_stag)
        A = np.zeros((int(np.prod(n_out)), int(np.prod(n_in))))
        for out_idx in np.ndindex(*n_out):
            r = np.ravel_multi_index(out_idx, n_out)
            rows, _ = self.row(out_idx)
            for col, v in rows:
                A[r, np.ravel_multi_index(col, n_in)] += v
        return A


# ----------------------------------------------------------------------
# derivative (fluca/src/fd/impls/derivative/derivative.c)
# ----------------------------------------------------------------------


def derivative(
    mesh: CartMesh,
    direction: int,
    deriv_order: int,
    accu_order: int = 2,
    in_stag=None,
    out_stag=None,
    bcs: Optional[list] = None,
) -> StencilOp:
    """d^m/dx_d^m with given accuracy on (possibly non-uniform) grids.

    Stencil width = deriv_order + accu_order points, centered
    (derivative.c:54-58), window shifted for cell<->face transitions
    (derivative.c:59). Near non-periodic boundaries the stencil is
    folded per the axis BCs:
      NONE      — window shifted inward (the off-grid points'
                  polynomial extrapolation, fdutils.c:300-360, reduces
                  to the one-sided rule on the same interior points)
      DIRICHLET — the boundary face point joins the point set; its
                  weight times the bc value becomes a constant term
                  (fdutils.c:362-420)
      NEUMANN   — the polynomial fit is constrained by the prescribed
                  boundary-normal derivative; the constraint weight
                  times the bc value becomes a constant term
                  (fdutils.c:422-464)

    ``bcs`` is a list of 2*dim FDBC (boundary order: left,right,
    down,up,back,front — cart.c:564-591); only the two entries of
    ``direction`` are used by this operator.
    """
    dim = mesh.dim
    d = direction
    in_stag = tuple(in_stag or (False,) * dim)
    out_stag = tuple(out_stag or in_stag)
    for a in range(dim):
        if a != d:
            assert in_stag[a] == out_stag[a], (
                "input/output locations may differ only along the "
                "derivative direction (derivative.c:24-37)"
            )
    bcs = bcs or [FDBC()] * (2 * dim)
    bc_lo, bc_hi = bcs[2 * d], bcs[2 * d + 1]

    size = deriv_order + accu_order
    # C-style truncation: -(size-1)/2 (derivative.c:58)
    offset_start = -((size - 1) // 2)
    if (not in_stag[d]) and out_stag[d]:
        offset_start -= 1  # derivative.c:59

    periodic = mesh.periodic[d]
    xin = _loc_coords(mesh, d, in_stag[d])
    xout = _loc_coords(mesh, d, out_stag[d])
    n_in, n_out = len(xin), len(xout)
    L = mesh.length(d)
    xb_lo = mesh.faces[d][0]
    xb_hi = mesh.faces[d][-1]

    # per-output-index weights keyed by input index (may include the
    # bc condition as a pseudo-point)
    band_cols: dict[int, np.ndarray] = {}
    const_1d = np.zeros(n_out)

    def set_w(i_out, col, w):
        off = col - i_out
        if off not in band_cols:
            band_cols[off] = np.zeros(n_out)
        band_cols[off][i_out] += w

    for i in range(n_out):
        x0 = xout[i]
        cols = [i + offset_start + c for c in range(size)]
        if periodic:
            xs = [xin[c % n_in] + (c // n_in) * L for c in cols]
            w = fd_weights(xs, x0, deriv_order)
            for c, wc in zip(cols, w):
                set_w(i, c, wc)
            continue

        lo_out = min(cols) < 0
        hi_out = max(cols) > n_in - 1
        if not lo_out and not hi_out:
            w = fd_weights([xin[c] for c in cols], x0, deriv_order)
            for c, wc in zip(cols, w):
                set_w(i, c, wc)
            continue

        side = 0 if lo_out else 1
        bc = bc_lo if side == 0 else bc_hi
        xb = xb_lo if side == 0 else xb_hi

        if bc.type == FDBCType.NONE:
            # shift window inward; same point count
            start = 0 if side == 0 else n_in - size
            cols = list(range(start, start + size))
            w = fd_weights([xin[c] for c in cols], x0, deriv_order)
            for c, wc in zip(cols, w):
                set_w(i, c, wc)
        elif bc.type == FDBCType.DIRICHLET:
            # nearest size-1 interior points + boundary face point.
            # Skip the boundary point if it coincides with an input
            # point (staggered input: the face IS a grid point).
            if side == 0:
                cols = list(range(0, size - 1))
            else:
                cols = list(range(n_in - (size - 1), n_in))
            pts = [xin[c] for c in cols]
            if any(abs(p - xb) < 1e-14 for p in pts):
                # boundary face already a stencil point: Dirichlet
                # value replaces it
                keep = [
                    (c, p) for c, p in zip(cols, pts)
                    if abs(p - xb) >= 1e-14
                ]
                cols = [c for c, _ in keep]
                pts = [p for _, p in keep]
            w = fd_weights(pts + [xb], x0, deriv_order)
            for c, wc in zip(cols, w[:-1]):
                set_w(i, c, wc)
            const_1d[i] += w[-1] * bc.value
        elif bc.type == FDBCType.NEUMANN:
            # constrained polynomial fit: p'(xb) = value plus size-1
            # interior samples; stencil = d^m of that fit at x0
            if side == 0:
                cols = list(range(0, size - 1))
            else:
                cols = list(range(n_in - (size - 1), n_in))
            npts = len(cols)
            ncoef = npts + 1
            M = np.zeros((ncoef, ncoef))
            for r_, c_ in enumerate(cols):
                h = xin[c_] - x0
                M[r_] = [h**k / math.factorial(k) for k in range(ncoef)]
            hb = xb - x0
            M[npts] = [
                (hb ** (k - 1) / math.factorial(k - 1)) if k >= 1 else 0.0
                for k in range(ncoef)
            ]
            rhs_sel = np.zeros(ncoef)
            rhs_sel[deriv_order] = 1.0
            # weights: w = rhs_sel^T M^{-1} -> last entry multiplies
            # the Neumann value
            w = np.linalg.solve(M.T, rhs_sel)
            for c_, wc in zip(cols, w[:npts]):
                set_w(i, c_, wc)
            const_1d[i] += w[npts] * bc.value
        else:  # pragma: no cover
            raise ValueError(bc.type)

    # lift 1-D bands/const to full-dim arrays
    out_shape = _loc_shape(mesh, out_stag)
    bands = {}
    for off, w1 in band_cols.items():
        if not np.any(w1 != 0.0):
            continue
        off_full = tuple(off if a == d else 0 for a in range(dim))
        shape = [1] * dim
        shape[d] = -1
        bands[off_full] = np.broadcast_to(
            w1.reshape(shape), out_shape
        ).copy()
    shape = [1] * dim
    shape[d] = -1
    const = np.broadcast_to(const_1d.reshape(shape), out_shape).copy()
    return StencilOp(mesh, in_stag, out_stag, bands, const)


# ----------------------------------------------------------------------
# combinators (fluca/src/fd/impls/{sum,scale,composition}/*)
# ----------------------------------------------------------------------


def fd_sum(*ops: StencilOp) -> StencilOp:
    """Operator sum; dedups identical stencil points
    (fluca/src/fd/impls/sum/sum.c:36-53)."""
    assert ops
    first = ops[0]
    for op in ops[1:]:
        assert op.in_stag == first.in_stag
        assert op.out_stag == first.out_stag
    bands: dict = {}
    const = np.zeros_like(first.const)
    for op in ops:
        for off, w in op.bands.items():
            if off in bands:
                bands[off] = bands[off] + w
            else:
                bands[off] = w.copy()
        const += op.const
    return StencilOp(first.mesh, first.in_stag, first.out_stag, bands, const)


def fd_scale(op: StencilOp, factor) -> StencilOp:
    """Pointwise scaling by a constant or by a field sampled at the
    output location (fluca/src/fd/impls/scale/scale.c). The constant
    term scales too (it is part of the operator's action)."""
    factor = np.asarray(factor, dtype=np.float64)
    bands = {off: w * factor for off, w in op.bands.items()}
    const = op.const * factor
    return StencilOp(op.mesh, op.in_stag, op.out_stag, bands, const)


def fd_compose(outer: StencilOp, inner: StencilOp) -> StencilOp:
    """outer ∘ inner: stencil-of-stencil expansion
    (fluca/src/fd/impls/composition/composition.c:48-72). The inner
    constant term flows through the outer operator into the composed
    constant."""
    assert inner.out_stag == outer.in_stag
    mesh = outer.mesh
    dim = mesh.dim
    n_mid = _loc_shape(mesh, inner.out_stag)
    out_shape = _loc_shape(mesh, outer.out_stag)
    bands: dict = {}
    for aoff, aw in outer.bands.items():
        for boff, bw in inner.bands.items():
            off = tuple(aoff[d] + boff[d] for d in range(dim))
            # inner coeff read at (out_idx + aoff), 0 outside / wrapped
            bw_shift = bw
            for d in range(dim):
                bw_shift = np.asarray(
                    shifted(
                        jnp.asarray(bw_shift), d, aoff[d], out_shape[d],
                        mesh.periodic[d],
                    )
                )
            w = aw * bw_shift
            if off in bands:
                bands[off] = bands[off] + w
            else:
                bands[off] = w
    # composed constant: outer applied to inner.const, plus outer.const
    tmp = StencilOp(mesh, outer.in_stag, outer.out_stag, outer.bands,
                    np.zeros(out_shape))
    const = np.asarray(tmp.apply(jnp.asarray(inner.const))) + outer.const
    bands = {o: w for o, w in bands.items() if np.any(w != 0.0)}
    return StencilOp(mesh, inner.in_stag, outer.out_stag, bands, const)


def parse_loc(name: str, dim: int) -> tuple[bool, ...]:
    """DMStag-style location names -> stag tuple: 'element', 'left'
    (x-face), 'down' (y-face), 'back' (z-face) and '_'-combinations
    (reference stencil locations, fdutils.c:15-33)."""
    stag = [False] * dim
    if name.lower() in ("element", "elem", ""):
        return tuple(stag)
    for part in name.lower().split("_"):
        axis = {"left": 0, "down": 1, "back": 2}[part]
        assert axis < dim, f"location {part} invalid in {dim}D"
        stag[axis] = True
    return tuple(stag)


def fd_from_options(mesh: CartMesh, opts, prefix: str = "flucafd_"):
    """Build an FD operator from the options database (reference:
    FlucaFDSetFromOptions, fdopts.c:65-108 + per-type options:
    -flucafd_type, -flucafd_dir, -flucafd_deriv_order,
    -flucafd_accu_order, -flucafd_{input,output}_loc,
    -flucafd_<boundary>_bc_type/_value, -flucafd_limiter)."""
    o = opts.sub(prefix)
    fd_type = o.get_str("type", "derivative")
    dim = mesh.dim
    names = ["left", "right", "down", "up", "back", "front"][: 2 * dim]
    bcs = []
    for n in names:
        t = o.get_str(f"{n}_bc_type", "none").lower()
        v = o.get_real(f"{n}_bc_value", 0.0)
        bcs.append(FDBC(FDBCType(t), v))
    in_loc = parse_loc(o.get_str("input_loc", "element"), dim)
    out_loc = parse_loc(o.get_str("output_loc", "element"), dim)
    direction = {"x": 0, "y": 1, "z": 2}[o.get_str("dir", "x").lower()]
    if fd_type == "derivative":
        return derivative(
            mesh, direction,
            o.get_int("deriv_order", 1), o.get_int("accu_order", 2),
            in_stag=in_loc, out_stag=out_loc, bcs=bcs,
        )
    if fd_type == "secondordertvd":
        from fluca_tpu.ops.tvd import TVDOp

        return TVDOp(
            mesh, direction, limiter=o.get_str("limiter", "vanleer"),
            bcs=bcs,
        )
    raise ValueError(f"unknown flucafd type {fd_type!r}")


class ScaledFieldOp:
    """Runtime scaling by a device field (reference:
    FlucaFDScaleSetVector, scale.c:256-329): apply = field ⊙ op(x).
    Used where the scale field changes per step (e.g. Burgers
    nonlinearity, tutorials/fd/ex4.c)."""

    def __init__(self, op: StencilOp):
        self.op = op
        self.field = None

    def set_field(self, field):
        self.field = field

    def apply(self, x):
        y = self.op.apply(x)
        return y if self.field is None else self.field * y

    __call__ = apply

"""Matrix-free NS operators over per-axis stencil tables.

TPU-native equivalent of the reference's assembled MATNEST blocks
(fluca/src/ns/impl/linearcn/cnlinearcart2d.c builders; 3-D:
cnlinearcart3d.c). Each operator is a closure over precomputed device
coefficient bands; application is fused shifted-slice arithmetic.

Field layout conventions (see fluca_tpu.mesh.cart):
  cell scalar  p  : (N0, N1[, N2])
  cell vector  v  : tuple of dim cell arrays
  face scalar  U  : tuple per axis, U[d] has face_shape(d)
  face vector  vf : nested tuple vf[d][c]

Operators (reference THEORY_GUIDE.md:136-198):
  G   : cell scalar -> cell vector, (dt/rho) * grad p
  L   : cell vector -> cell vector, Laplacian (unscaled)
  C   : cell vector -> cell vector, linearized convection
        (C v)_c = (1/2) d/dx_d (v_c U0_d + v0f_c v_d)   [unscaled]
  B   : cell vector -> face vector, linear interpolation
  T   : cell vector -> face scalar, normal component of B
  Gst : cell scalar -> face scalar, (dt/rho) * face-normal grad
  D   : face scalar -> cell scalar, divergence
  R   : = T G - Gst (Rhie-Chow correction)
  A   : = I + dt C - (mu dt / 2 rho) L (momentum block,
        cnlinearcart2d.c:2056-2067)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns import tables as T_
from fluca_tpu.ns.bc import BCType, validate_bcs
from fluca_tpu.ops.banded import (
    AxisStencil,
    apply_axis_stencil,
    compose_axis_stencils,
    shifted,
    _broadcast_1d,
)


def _bcast(w, ndim, axis, dtype):
    return _broadcast_1d(jnp.asarray(np.asarray(w), dtype), ndim, axis)


class NSOperators:
    def __init__(self, mesh: CartMesh, bcs, rho, mu, dt, dtype):
        validate_bcs(mesh, bcs)
        self.mesh = mesh
        self.bcs = list(bcs)
        self.rho = float(rho)
        self.mu = float(mu)
        self.dt = float(dt)
        self.dtype = dtype
        dim = mesh.dim
        ndim = dim  # array rank of scalar fields
        self.dim = dim
        axbcs = T_.axis_bcs(mesh, bcs)
        self.axbcs = axbcs

        # -- build host tables, convert to device bands ----------------
        def dev(stencil):
            return stencil.device_bands(ndim, dtype)

        # G (cell gradient) per axis
        self.g_bands, self.g_bc = [], []
        # L per (comp, axis); bc coef per (comp, axis, side)
        self.l_bands = [[None] * dim for _ in range(dim)]
        self.l_bc = [[None] * dim for _ in range(dim)]
        # interp (B rows) per (face axis, comp); insert flags
        self.b_bands = [[None] * dim for _ in range(dim)]
        self.b_insert = [[None] * dim for _ in range(dim)]
        # Gst, D, composed R per axis
        self.gst_bands, self.gst_bc, self.d_bands = [], [], []
        self.r_bands = []
        # convection weights per axis, for col_is_normal False/True
        self.conv_w = []

        for d in range(dim):
            st, lo, hi = T_.grad_cell_tables(mesh, d, axbcs[d])
            self.g_bands.append(dev(st))
            # store bc coefficients as Python floats: numpy f64
            # scalars are strong-typed in JAX and would promote the
            # f32 bc vectors to f64 (scatter dtype mismatch)
            self.g_bc.append((float(lo), float(hi)))

            for c in range(dim):
                st, blo, bhi = T_.lap_tables(mesh, d, axbcs[d], c)
                self.l_bands[c][d] = dev(st)
                self.l_bc[c][d] = (float(blo), float(bhi))

                sti, ilo, ihi = T_.interp_tables(mesh, d, axbcs[d], c)
                self.b_bands[d][c] = dev(sti)
                self.b_insert[d][c] = (ilo, ihi)

            st, lo, hi = T_.gst_tables(mesh, d, axbcs[d])
            self.gst_bands.append(dev(st))
            self.gst_bc.append((float(lo), float(hi)))
            self.d_bands.append(dev(T_.div_tables(mesh, d)))

            # Rhie-Chow correction composed into ONE banded operator
            # per axis: R_d = T_d ∘ G_d - Gst_d (all three act along
            # axis d only, so the band product is exact). Replaces the
            # three-sweep apply_G + apply_T + apply_Gst chain in every
            # coupled apply (THEORY_GUIDE eq. 11).
            g_st, _, _ = T_.grad_cell_tables(mesh, d, axbcs[d])
            ti_st, _, _ = T_.interp_tables(mesh, d, axbcs[d], d)
            comp = compose_axis_stencils(ti_st, g_st)
            rb = {
                off: np.array(w)
                for off, w in comp.as_dict().items()
            }
            for off, w in st.as_dict().items():
                rb[off] = rb.get(off, np.zeros(mesh.nfaces(d))) - w
            r_st = AxisStencil.from_dict(
                d, mesh.nfaces(d), mesh.periodic[d], rb
            )
            self.r_bands.append(dev(r_st))

            variants = {}
            for col_is_normal in (False, True):
                wl, wr = T_.conv_tables(mesh, d, axbcs[d], col_is_normal)
                variants[col_is_normal] = tuple(
                    {
                        o: _bcast(w, ndim, d, dtype)
                        for o, w in wd.items()
                        if np.any(np.asarray(w) != 0.0)
                    }
                    for wd in (wl, wr)
                )
            self.conv_w.append(variants)

        # Laplacian diagonal per component (for Jacobi preconditioning)
        diagL = []
        for c in range(dim):
            tot = np.zeros(mesh.cell_shape)
            for d in range(dim):
                st, _, _ = T_.lap_tables(mesh, d, axbcs[d], c)
                w0 = st.as_dict().get(0, np.zeros(mesh.N[d]))
                shape = [1] * dim
                shape[d] = -1
                tot = tot + w0.reshape(shape)
            diagL.append(jnp.asarray(tot, dtype))
        self.diag_L = tuple(diagL)

        # boundary plane coordinates (cell-transverse positions at the
        # boundary face), one per (axis, side); arrays keep a size-1
        # boundary axis for direct broadcast into boundary slices.
        self.plane_coords = [[None, None] for _ in range(dim)]
        for d in range(dim):
            if mesh.periodic[d]:
                continue
            for side in (0, 1):
                coords = []
                for a in range(dim):
                    if a == d:
                        val = mesh.faces[d][0 if side == 0 else mesh.N[d]]
                        arr = np.full((1,), val)
                    else:
                        arr = mesh.centers(a)
                    shape = [1] * dim
                    shape[a] = -1
                    coords.append(
                        jnp.asarray(arr.reshape(shape), dtype)
                    )
                self.plane_coords[d][side] = tuple(coords)

        # per-axis boundary cell widths (for convection bc vector)
        self.h_bnd = [
            (float(mesh.widths(d)[0]), float(mesh.widths(d)[-1]))
            for d in range(dim)
        ]

        # optional fused Pallas momentum kernel (2-D, TPU); covers
        # the tridiagonal part plus the +-2 boundary-row Laplacian
        # planes (see ops/pallas_stencil.build_momentum_apply_2d)
        self._mom_kernel = None
        # 3-D fused A-apply: coefficients formed in-kernel from the
        # 1-D bands + face-factor fields (build_momentum_apply_3d);
        # (prep, apply) pair, or None -> XLA banded path
        self._mom_kernel3d = None
        # fused interp/div/grad chain stages (ops/pallas_chain3d):
        # coupled epilogue + ABF pre/post in one pass each
        self._chain3d = None
        # kernel liveness/causes for diagnostics (bench, -log_view):
        # name -> "live" | "off: <reason>" | "error: <exception>"
        self.kernel_status = {}
        self._build_kernels()

    def _build_kernels(self) -> None:
        """(Re)build every single-device fused Pallas kernel this
        operator set can use. Called at construction and again by
        CNLinearSolver.set_device_grid(None) to restore the
        single-device kernels after an un-shard (shard_map wrappers /
        nulled kernels are replaced wholesale).

        A kernel builder failure is recorded in ``kernel_status``
        (never silently swallowed: a Mosaic regression otherwise
        downgrades the hot path to the XLA banded apply with no
        signal but a slower bench). Set FLUCA_TPU_STRICT_KERNELS=1 to
        raise instead of falling back."""
        import os

        mesh, axbcs, dtype, dim = (
            self.mesh, self.axbcs, self.dtype, self.dim
        )
        strict = os.environ.get("FLUCA_TPU_STRICT_KERNELS") == "1"
        self._mom_kernel = None
        self._mom_kernel3d = None
        self._chain3d = None

        if os.environ.get("FLUCA_TPU_DISABLE_PALLAS") == "1":
            self.kernel_status = {"all": "off: FLUCA_TPU_DISABLE_PALLAS"}
            return

        def build(name, fn):
            try:
                out = fn()
            except Exception as e:  # noqa: BLE001 - cause recorded
                if strict:
                    raise
                self.kernel_status[name] = (
                    f"error: {type(e).__name__}: {e}"
                )
                return None
            self.kernel_status[name] = (
                "live" if out is not None
                else self.kernel_status.get(name, "off: unavailable")
            )
            return out

        if dim == 2:
            def mk2d():
                from fluca_tpu.ops.pallas_stencil import (
                    build_momentum_apply_2d,
                    pallas_available,
                )

                if not pallas_available():
                    self.kernel_status["mom2d"] = "off: no TPU"
                    return None
                if mesh.N[0] % 8:
                    self.kernel_status["mom2d"] = (
                        f"off: N0={mesh.N[0]} not 8-aligned"
                    )
                    return None
                return build_momentum_apply_2d(
                    mesh.N[0], mesh.N[1],
                    mesh.periodic[0], mesh.periodic[1], dtype,
                )

            self._mom_kernel = build("mom2d", mk2d)
        elif dim == 3:
            def mk3d():
                from fluca_tpu.ops.pallas_stencil import (
                    build_momentum_apply_3d,
                    pallas_available,
                )

                if not pallas_available():
                    self.kernel_status["mom3d"] = "off: no TPU"
                    return None
                return build_momentum_apply_3d(
                    mesh, axbcs, self.rho, self.mu, self.dt, dtype,
                )

            self._mom_kernel3d = build("mom3d", mk3d)
            # opt-in (FLUCA_TPU_CHAIN3D=1): stage-level slope timing on
            # v5e (2026-08-20, examples/profile128.py) shows the fused
            # chain makes the coupled apply SLOWER than the XLA
            # shifted-slice path at 128^3 (0.618 vs 0.513 ms) and cost
            # ~2 steps/s on the cavity3d bench — XLA already fuses the
            # interp/div/grad sweeps well at these op intensities. The
            # kernels stay correct (tests/test_chain3d.py) for shapes
            # where a future measurement flips the verdict.
            if os.environ.get("FLUCA_TPU_CHAIN3D") == "1":
                def mkchain():
                    from fluca_tpu.ops.pallas_chain3d import Chain3D
                    from fluca_tpu.ops.pallas_stencil import (
                        pallas_available,
                    )

                    if not pallas_available():
                        self.kernel_status["chain3d"] = "off: no TPU"
                        return None
                    return Chain3D(
                        mesh, axbcs, self.rho, self.dt, dtype
                    )

                self._chain3d = build("chain3d", mkchain)

    # ------------------------------------------------------------------
    # slice helpers
    # ------------------------------------------------------------------
    def _cell_boundary_slice(self, d, side):
        idx = [slice(None)] * self.dim
        idx[d] = slice(0, 1) if side == 0 else slice(self.mesh.N[d] - 1, None)
        return tuple(idx)

    def _face_boundary_slice(self, d, side):
        nf = self.mesh.nfaces(d)
        idx = [slice(None)] * self.dim
        idx[d] = slice(0, 1) if side == 0 else slice(nf - 1, None)
        return tuple(idx)

    def _face_factors(self, F, d):
        """Low/high face factor arrays (cell shape) from face array F
        along axis d."""
        if self.mesh.periodic[d]:
            return F, jnp.roll(F, -1, axis=d)
        n = self.mesh.N[d]
        lo = lax.slice_in_dim(F, 0, n, axis=d)
        hi = lax.slice_in_dim(F, 1, n + 1, axis=d)
        return lo, hi

    # ------------------------------------------------------------------
    # operator applications
    # ------------------------------------------------------------------
    def apply_G(self, p):
        """(dt/rho) grad p at cell centers -> cell vector."""
        s = self.dt / self.rho
        return tuple(
            s
            * apply_axis_stencil(
                self.g_bands[d], p, d, self.mesh.N[d], self.mesh.periodic[d]
            )
            for d in range(self.dim)
        )

    def apply_L(self, v):
        """Laplacian of each velocity component (unscaled)."""
        out = []
        for c in range(self.dim):
            acc = None
            for d in range(self.dim):
                t = apply_axis_stencil(
                    self.l_bands[c][d], v[c], d, self.mesh.N[d],
                    self.mesh.periodic[d],
                )
                acc = t if acc is None else acc + t
            out.append(acc)
        return tuple(out)

    def _conv_band(self, x, wdict, d):
        acc = None
        for off, w in wdict.items():
            t = w * shifted(x, d, off, self.mesh.N[d], self.mesh.periodic[d])
            acc = t if acc is None else acc + t
        return acc if acc is not None else jnp.zeros_like(x)

    def apply_C(self, v, U0, v0f):
        """Linearized convection (unscaled):
        (C v)_c = sum_d [ d/dx_d (v_c U0_d)/2 + d/dx_d (v0f_c v_d)/2 ].
        Reference: ComputeConvectionOperator_Private
        (cnlinearcart2d.c:601-897)."""
        out = []
        for c in range(self.dim):
            acc = None
            for d in range(self.dim):
                wl1, wr1 = self.conv_w[d][c == d]
                wl2, wr2 = self.conv_w[d][True]
                FlU, FrU = self._face_factors(U0[d], d)
                Flv, Frv = self._face_factors(v0f[d][c], d)
                t = (
                    FlU * self._conv_band(v[c], wl1, d)
                    + FrU * self._conv_band(v[c], wr1, d)
                    + Flv * self._conv_band(v[d], wl2, d)
                    + Frv * self._conv_band(v[d], wr2, d)
                )
                acc = t if acc is None else acc + t
            out.append(acc)
        return tuple(out)

    def apply_A(self, v, U0, v0f):
        """Momentum block: A v = v + dt C v - (mu dt / 2 rho) L v
        (cnlinearcart2d.c:2056-2067)."""
        Cv = self.apply_C(v, U0, v0f)
        Lv = self.apply_L(v)
        a = self.dt
        b = 0.5 * self.mu * self.dt / self.rho
        return tuple(
            v[c] + a * Cv[c] - b * Lv[c] for c in range(self.dim)
        )

    def diag_A(self, U0, v0f):
        """Diagonal of A (for Jacobi-preconditioned momentum solves)."""
        out = []
        b = 0.5 * self.mu * self.dt / self.rho
        for c in range(self.dim):
            diagC = None
            for d in range(self.dim):
                wl1, wr1 = self.conv_w[d][c == d]
                FlU, FrU = self._face_factors(U0[d], d)
                t = FlU * wl1.get(0, 0.0) + FrU * wr1.get(0, 0.0)
                if c == d:
                    wl2, wr2 = self.conv_w[d][True]
                    Flv, Frv = self._face_factors(v0f[d][c], d)
                    t = t + Flv * wl2.get(0, 0.0) + Frv * wr2.get(0, 0.0)
                diagC = t if diagC is None else diagC + t
            out.append(1.0 + self.dt * diagC - b * self.diag_L[c])
        return tuple(out)

    # ------------------------------------------------------------------
    # fast momentum path: per-step coefficient-field precompute
    # ------------------------------------------------------------------
    def build_momentum_coeffs(self, U0, v0f):
        """Collapse A = I + dt C - (mu dt/2rho) L into dense
        coefficient fields, once per step. Each subsequent A-apply is
        then sum_off W_off * shift(v) — ~9 fused multiply-adds per
        component instead of ~20 banded ops (the dominant inner-loop
        cost of the BiCGStab momentum solves and the coupled FGMRES
        operator)."""
        dim = self.dim
        dt = self.dt
        b = 0.5 * self.mu * self.dt / self.rho
        shape = self.mesh.cell_shape
        selfc = [[None] * dim for _ in range(dim)]  # [c][d][off] fields
        cross = [[None] * dim for _ in range(dim)]
        for c in range(dim):
            for d in range(dim):
                lap = dict(self.l_bands[c][d])
                wl1, wr1 = self.conv_w[d][c == d]
                FlU, FrU = self._face_factors(U0[d], d)
                wl2, wr2 = self.conv_w[d][True]
                Flv, Frv = self._face_factors(v0f[d][c], d)
                offs = sorted(
                    set(lap)
                    | set(wl1) | set(wr1) | set(wl2) | set(wr2)
                )
                S = {}
                X = {}
                for off in offs:
                    s = None

                    def acc(t, s=None):
                        return t if s is None else s + t

                    if off in lap:
                        s = acc(-b * lap[off], s)
                    if off in wl1:
                        s = acc(dt * FlU * wl1[off], s)
                    if off in wr1:
                        s = acc(dt * FrU * wr1[off], s)
                    x = None
                    if off in wl2:
                        x = acc(dt * Flv * wl2[off], x)
                    if off in wr2:
                        x = acc(dt * Frv * wr2[off], x)
                    if c == d and x is not None:
                        s = x if s is None else s + x
                        x = None
                    if s is not None:
                        S[off] = jnp.broadcast_to(s, shape)
                    if x is not None:
                        X[off] = jnp.broadcast_to(x, shape)
                if c == d or 0 not in S:
                    S[0] = S.get(
                        0, jnp.zeros(shape, self.dtype)
                    )
                selfc[c][d] = S
                cross[c][d] = X
        # identity contribution on the diagonal (once per component,
        # fold into axis 0's center coefficient)
        for c in range(dim):
            selfc[c][0] = dict(selfc[c][0])
            selfc[c][0][0] = selfc[c][0].get(
                0, jnp.zeros(shape, self.dtype)
            ) + 1.0
        return {"self": selfc, "cross": cross}

    def build_momentum_coeffs_stacked(self, U0, v0f):
        """Pack the coefficient fields into the (26, N0, N1) layout of
        the fused momentum kernel (2-D): 18 tridiagonal planes + 8
        boundary-row +-2 planes (see
        ops/pallas_stencil.build_momentum_apply_2d)."""
        C = self.build_momentum_coeffs(U0, v0f)
        zeros = jnp.zeros(self.mesh.cell_shape, self.dtype)
        order = [
            (0, "self", 0), (0, "self", 1), (0, "cross", 1),
            (1, "self", 0), (1, "self", 1), (1, "cross", 0),
        ]
        planes = []
        for c, kind, d in order:
            table = C[kind][c][d]
            for off in (-1, 0, 1):
                planes.append(table.get(off, zeros))
        for c in range(2):
            for d in range(2):
                table = C["self"][c][d]
                for off in (-2, 2):
                    planes.append(table.get(off, zeros))
        return jnp.stack(planes)

    def apply_A_stacked(self, v, w_stack):
        """Fused Pallas A-apply (boundary +-2 terms included in the
        kernel planes)."""
        out_u, out_v = self._mom_kernel(w_stack, v[0], v[1])
        return (out_u, out_v)

    @property
    def has_momentum_kernel(self) -> bool:
        return self._mom_kernel is not None

    @property
    def has_momentum_kernel3d(self) -> bool:
        return self._mom_kernel3d is not None

    def build_momentum_factors_3d(self, U0, v0f):
        """Per-step face-factor prep for the fused 3-D A-apply."""
        return self._mom_kernel3d[0](U0, v0f)

    def apply_A_coeffs(self, v, coeffs):
        """A v via precomputed coefficient fields."""
        if isinstance(coeffs, dict) and "FU" in coeffs:
            return self._mom_kernel3d[1](v, coeffs)
        if isinstance(coeffs, jnp.ndarray) or not isinstance(
            coeffs, dict
        ):
            return self.apply_A_stacked(v, coeffs)
        dim = self.dim
        out = []
        for c in range(dim):
            acc = None
            for d in range(dim):
                for off, w in coeffs["self"][c][d].items():
                    t = w * shifted(
                        v[c], d, off, self.mesh.N[d],
                        self.mesh.periodic[d],
                    )
                    acc = t if acc is None else acc + t
                if c != d:
                    for off, w in coeffs["cross"][c][d].items():
                        t = w * shifted(
                            v[d], d, off, self.mesh.N[d],
                            self.mesh.periodic[d],
                        )
                        acc = t if acc is None else acc + t
            out.append(acc)
        return tuple(out)

    def apply_B(self, v):
        """Interpolate cell vector to all faces -> face vector
        vf[d][c]."""
        return tuple(
            tuple(
                apply_axis_stencil(
                    self.b_bands[d][c], v[c], d, self.mesh.nfaces(d),
                    self.mesh.periodic[d],
                )
                for c in range(self.dim)
            )
            for d in range(self.dim)
        )

    def apply_T(self, v):
        """Face-normal interpolation -> face scalar."""
        return tuple(
            apply_axis_stencil(
                self.b_bands[d][d], v[d], d, self.mesh.nfaces(d),
                self.mesh.periodic[d],
            )
            for d in range(self.dim)
        )

    def apply_Gst(self, p):
        """(dt/rho) face-normal grad p -> face scalar."""
        s = self.dt / self.rho
        return tuple(
            s
            * apply_axis_stencil(
                self.gst_bands[d], p, d, self.mesh.nfaces(d),
                self.mesh.periodic[d],
            )
            for d in range(self.dim)
        )

    def apply_D(self, U):
        """Divergence of face-normal velocity -> cell scalar."""
        acc = None
        for d in range(self.dim):
            t = apply_axis_stencil(
                self.d_bands[d], U[d], d, self.mesh.N[d],
                self.mesh.periodic[d],
            )
            acc = t if acc is None else acc + t
        return acc

    def apply_R(self, p):
        """Rhie-Chow correction R p = T G p - Gst p (THEORY_GUIDE
        eq. 11; assembled as negR = -T G + Gst in
        cnlinearcart2d.c:2035-2036). Applied via the per-axis
        composed bands (one fused banded sweep per axis instead of
        the G, T, Gst chain)."""
        s = self.dt / self.rho
        return tuple(
            s
            * apply_axis_stencil(
                self.r_bands[d], p, d, self.mesh.nfaces(d),
                self.mesh.periodic[d],
            )
            for d in range(self.dim)
        )

    def apply_DGst(self, p):
        """D Gst p — the pressure-Poisson operator (times dt/rho).
        Schur complement of the fractional-step limit
        (THEORY_GUIDE.md:330-341)."""
        return self.apply_D(self.apply_Gst(p))

    # ------------------------------------------------------------------
    # boundary-condition RHS vectors (time-dependent)
    # ------------------------------------------------------------------
    def _eval_velocity(self, d, side, t):
        bc = self.bcs[2 * d + side]
        return bc.velocity(t, self.plane_coords[d][side])

    def _eval_pressure(self, d, side, t):
        bc = self.bcs[2 * d + side]
        return bc.pressure(t, self.plane_coords[d][side])

    def bc_G(self, t):
        """Pressure-gradient bc vector (unscaled; caller multiplies
        dt/rho). Component d receives outlet-pressure terms at axis-d
        boundaries (cnlinearcart2d.c:155-290)."""
        out = [jnp.zeros(self.mesh.cell_shape, self.dtype)] * self.dim
        for d in range(self.dim):
            if self.mesh.periodic[d]:
                continue
            for side in (0, 1):
                coef = self.g_bc[d][side]
                if coef == 0.0:
                    continue
                pb = self._eval_pressure(d, side, t)
                sl = self._cell_boundary_slice(d, side)
                out[d] = out[d].at[sl].add(coef * jnp.broadcast_to(
                    pb, out[d][sl].shape).astype(self.dtype))
        return tuple(out)

    def bc_L(self, t):
        """Laplacian bc vector (cnlinearcart2d.c:450-599)."""
        out = [jnp.zeros(self.mesh.cell_shape, self.dtype)] * self.dim
        for d in range(self.dim):
            if self.mesh.periodic[d]:
                continue
            for side in (0, 1):
                if self.bcs[2 * d + side].type != BCType.VELOCITY:
                    continue
                vb = self._eval_velocity(d, side, t)
                sl = self._cell_boundary_slice(d, side)
                for c in range(self.dim):
                    coef = self.l_bc[c][d][side]
                    if coef == 0.0:
                        continue
                    out[c] = out[c].at[sl].add(coef * jnp.broadcast_to(
                        vb[c], out[c][sl].shape).astype(self.dtype))
        return tuple(out)

    def bc_C(self, t0, t1):
        """Convection bc vector: boundary-face flux of the linearized
        convection at VELOCITY boundaries
        (cnlinearcart2d.c:899-1042). Sign is - at low faces, + at
        high faces."""
        out = [jnp.zeros(self.mesh.cell_shape, self.dtype)] * self.dim
        for d in range(self.dim):
            if self.mesh.periodic[d]:
                continue
            for side in (0, 1):
                if self.bcs[2 * d + side].type != BCType.VELOCITY:
                    continue
                vb0 = self._eval_velocity(d, side, t0)
                vb1 = self._eval_velocity(d, side, t1)
                h = self.h_bnd[d][side]
                sgn = -1.0 if side == 0 else 1.0
                sl = self._cell_boundary_slice(d, side)
                for c in range(self.dim):
                    val = (
                        sgn * 0.5 * (vb1[c] * vb0[d] + vb0[c] * vb1[d]) / h
                    )
                    out[c] = out[c].at[sl].add(jnp.broadcast_to(
                        val, out[c][sl].shape).astype(self.dtype))
        return tuple(out)

    def _bc_face_insert(self, t, comps):
        """Shared helper for bc_B/bc_T: prescribed face values at
        VELOCITY boundaries (SYMMETRY prescribes 0, already zero)."""
        out = []
        for d in range(self.dim):
            row = []
            for c in comps(d):
                arr = jnp.zeros(self.mesh.face_shape(d), self.dtype)
                if not self.mesh.periodic[d]:
                    for side in (0, 1):
                        if self.bcs[2 * d + side].type != BCType.VELOCITY:
                            continue
                        if not self.b_insert[d][c][side]:
                            continue
                        vb = self._eval_velocity(d, side, t)
                        sl = self._face_boundary_slice(d, side)
                        arr = arr.at[sl].set(jnp.broadcast_to(
                            vb[c], arr[sl].shape).astype(self.dtype))
                row.append(arr)
            out.append(tuple(row))
        return out

    def bc_B(self, t):
        """Face-vector interpolation bc (cnlinearcart2d.c:1209-1329)."""
        return tuple(self._bc_face_insert(t, lambda d: range(self.dim)))

    def bc_T(self, t):
        """Face-normal interpolation bc (cnlinearcart2d.c:1476-1587)."""
        res = self._bc_face_insert(t, lambda d: (d,))
        return tuple(r[0] for r in res)

    def bc_Gst(self, t):
        """Staggered pressure-gradient bc vector (unscaled;
        cnlinearcart2d.c:1797-1931)."""
        out = []
        for d in range(self.dim):
            arr = jnp.zeros(self.mesh.face_shape(d), self.dtype)
            if not self.mesh.periodic[d]:
                for side in (0, 1):
                    coef = self.gst_bc[d][side]
                    if coef == 0.0:
                        continue
                    pb = self._eval_pressure(d, side, t)
                    sl = self._face_boundary_slice(d, side)
                    arr = arr.at[sl].set(coef * jnp.broadcast_to(
                        pb, arr[sl].shape).astype(self.dtype))
            out.append(arr)
        return tuple(out)

    # ------------------------------------------------------------------
    @property
    def has_pressure_outlet(self) -> bool:
        """Pressure nullspace exists unless some boundary pins the
        pressure (reference nsbasic.c:215-244)."""
        return any(b.type == BCType.PRESSURE_OUTLET for b in self.bcs)

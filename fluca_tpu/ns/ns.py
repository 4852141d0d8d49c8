"""NS driver: time loop, monitors, converged reasons.

Reference: fluca/src/ns/interface/nsbasic.c (NSSetUp/NSStep/NSSolve),
nsmon.c (monitor chain), nsopts.c (options). The solver type registry
currently contains the single implementation "cnlinear"
(NSCNLINEAR), like the reference.
"""

from __future__ import annotations

import enum
from typing import Callable, Optional


from fluca_tpu.mesh.cart import CartMesh
from fluca_tpu.ns.cnlinear import CNLinearConfig, CNLinearSolver
from fluca_tpu.utils import config
from fluca_tpu.utils.options import Options, global_options
from fluca_tpu.utils.registry import Registry

ns_registry = Registry("ns")
ns_registry.register("cnlinear", CNLinearSolver)


class NSConvergedReason(enum.Enum):
    """Reference: flucans.h:13-19."""

    ITERATING = 0
    CONVERGED_TIME = 1
    CONVERGED_ITS = 2
    DIVERGED_NONLINEAR_SOLVE = -1


class NS:
    # field names (reference: NS_FIELD_VELOCITY /
    # NS_FIELD_FACE_NORMAL_VELOCITY / NS_FIELD_PRESSURE added in
    # NSSetUp, nsbasic.c:180-182; the pressure-extrapolation state
    # "PressureHalfStep" from cnlinear.c:146-153)
    FIELD_VELOCITY = "v"
    FIELD_FACE_NORMAL_VELOCITY = "U"
    FIELD_PRESSURE = "p"
    FIELD_PRESSURE_HALF_STEP = "phalf"

    def __init__(
        self,
        mesh: CartMesh,
        *,
        rho: float = 1.0,
        mu: float = 1.0,
        dt: float = 1e-3,
        max_steps: Optional[int] = None,
        max_time: Optional[float] = None,
        ns_type: str = "cnlinear",
        bcs=None,
        options: Optional[Options] = None,
        dtype=None,
        error_if_step_failed: bool = True,
    ):
        self.mesh = mesh
        self.rho = float(rho)
        self.mu = float(mu)
        self.dt = float(dt)
        self.max_steps = max_steps
        self.max_time = max_time
        self.ns_type = ns_type
        self.bcs = list(bcs) if bcs is not None else [None] * (2 * mesh.dim)
        self.options = options or global_options()
        self.dtype = dtype or config.default_dtype()
        self.error_if_step_failed = error_if_step_failed

        self.step_index = 0
        self.t = 0.0
        self.reason = NSConvergedReason.ITERATING
        self.monitors: list[Callable] = []
        # monitor cadence inside advance(): the scan fast path is
        # chunked into batches of this many steps, with the monitor
        # chain called between chunks (-ns_monitor_interval). None =
        # monitors run only before/after the whole advance batch.
        self.monitor_interval: Optional[int] = None
        self.last_diag = None
        self.impl: Optional[CNLinearSolver] = None
        self.state = None

    # -- setup ---------------------------------------------------------
    def set_boundary_condition(self, boundary_index: int, bc) -> None:
        """Reference: NSSetBoundaryCondition."""
        self.bcs[int(boundary_index)] = bc

    def set_from_options(self) -> None:
        """Reference: NSSetFromOptions (nsopts.c:167-203)."""
        o = self.options.sub("ns_")
        self.rho = o.get_real("density", self.rho)
        self.mu = o.get_real("viscosity", self.mu)
        self.dt = o.get_real("time_step_size", self.dt)
        if o.has("max_steps"):
            self.max_steps = o.get_int("max_steps")
        if o.has("max_time"):
            self.max_time = o.get_real("max_time")
        self.ns_type = o.get_str("type", self.ns_type)
        self.error_if_step_failed = o.get_bool(
            "error_if_step_failed", self.error_if_step_failed
        )

    def setup(self) -> None:
        """Reference: NSSetUp (nsbasic.c:153-274); instrumented like
        the reference's NS_SetUp log event (nspkg.c:21-24)."""
        if self.impl is not None:
            return
        assert all(b is not None for b in self.bcs), (
            "all boundary conditions must be set before setup"
        )
        from fluca_tpu.utils.profiling import global_log

        with global_log.event("NS_SetUp"):
            cfg = CNLinearConfig.from_options(self.options)
            factory = ns_registry.get(self.ns_type)
            self.impl = factory(
                self.mesh, self.bcs, self.rho, self.mu, self.dt,
                cfg=cfg, dtype=self.dtype,
            )
            if self.state is None:
                self.state = self.impl.zero_state()

    # -- domain decomposition -------------------------------------------
    def shard(self, grid=None, shape=None, devices=None) -> None:
        """Distribute the solver over a device grid — the first-class
        equivalent of the reference's MPI rank decomposition
        (MeshSetUp_Cart ownership/halo, cart.c:85-151): the state is
        placed with grid-axis NamedShardings and every compiled step
        (including the multi_step scan fast path) constrains its
        carries to that sharding, so GSPMD emits halo
        collective-permutes over ICI and psum allreduces for the
        Krylov reductions.

        ``grid`` is a parallel.mesh.DeviceGrid; or pass ``shape``
        (e.g. (2, 4)) / ``devices`` to build one.
        """
        self.setup()
        from fluca_tpu.parallel.mesh import make_device_grid, shard_state

        if grid is None:
            grid = make_device_grid(
                self.mesh.dim, devices=devices, shape=shape
            )
        self.impl.set_device_grid(grid)
        self.state = shard_state(grid, self.state)

    @property
    def device_grid(self):
        return self.impl.grid if self.impl is not None else None

    # -- solution access ----------------------------------------------
    @property
    def solution(self):
        return self.state

    def get_solution_sub(self, field: str):
        """Reference: NSGetSolutionSubVector (nssol.c:44-128)."""
        self.setup()
        return self.state[field]

    def set_solution(self, v=None, U=None, p=None, phalf=None) -> None:
        self.setup()
        if v is not None:
            self.state["v"] = tuple(v)
        if U is not None:
            self.state["U"] = tuple(U)
        if p is not None:
            self.state["p"] = p
        if phalf is not None:
            self.state["phalf"] = phalf

    # -- monitors ------------------------------------------------------
    def add_monitor(self, fn: Callable) -> None:
        """fn(ns) called before each step and after the last
        (reference: NSMonitor chain, nsmon.c:4-45)."""
        self.monitors.append(fn)

    def _monitor(self) -> None:
        for fn in self.monitors:
            fn(self)

    # -- stepping ------------------------------------------------------
    def step(self) -> None:
        """Reference: NSStep (nsbasic.c:276-299), instrumented like
        the NS_Step log event (nsbasic.c:284-286)."""
        self.setup()
        from fluca_tpu.utils.profiling import global_log

        with global_log.event("NS_Step"):
            self.state, diag = self.impl.step(
                self.state, self.t, self.step_index
            )
        self.last_diag = diag
        ok = bool(diag["converged"])
        if not ok:
            self.reason = NSConvergedReason.DIVERGED_NONLINEAR_SOLVE
            if self.error_if_step_failed:
                raise RuntimeError(
                    f"NS step {self.step_index} diverged: "
                    f"rnorm={float(diag['ksp_rnorm'])}"
                )
            return
        self.step_index += 1
        self.t += self.dt

    def advance(self, n: int) -> None:
        """Advance n steps with the fused scan fast path (after the
        first step). When monitors are registered and
        ``monitor_interval`` is set, the batch is chunked into
        interval-sized scans with the monitor chain called between
        chunks — the reference calls monitors every step
        (nsbasic.c:336-345); chunking keeps that observability at
        near-scan throughput (at most two compiled scan lengths:
        the interval and the remainder)."""
        self.setup()
        if n <= 0:
            return
        if self.step_index == 0:
            self.step()
            n -= 1
        k = self.monitor_interval if self.monitors else None
        while n > 0:
            if k:
                self._monitor()
            m = min(k, n) if k else n
            self._advance_batch(m)
            if self.reason == NSConvergedReason.DIVERGED_NONLINEAR_SOLVE:
                return
            n -= m

    def _advance_batch(self, n: int) -> None:
        self.state, diag = self.impl.multi_step(self.state, self.t, n)
        self.last_diag = diag
        if not bool(diag["converged"]):
            self.reason = NSConvergedReason.DIVERGED_NONLINEAR_SOLVE
            if self.error_if_step_failed:
                raise RuntimeError(
                    f"NS diverged within steps "
                    f"{self.step_index}..{self.step_index + n}"
                )
            return
        self.step_index += n
        self.t += n * self.dt

    def _check_finished(self) -> bool:
        if self.max_steps is not None and self.step_index >= self.max_steps:
            self.reason = NSConvergedReason.CONVERGED_ITS
            return True
        if self.max_time is not None and self.t >= self.max_time - 1e-12:
            self.reason = NSConvergedReason.CONVERGED_TIME
            return True
        return False

    def solve(self) -> NSConvergedReason:
        """Reference: NSSolve (nsbasic.c:325-351), incl. the
        -ns_view_pre / -ns_view hooks (nsbasic.c:331-349)."""
        self.setup()
        if self.options.sub("ns_").get_bool("view_pre"):
            print(self.view())
        self.reason = NSConvergedReason.ITERATING
        while not self._check_finished():
            self._monitor()
            self.step()
            if self.reason == NSConvergedReason.DIVERGED_NONLINEAR_SOLVE:
                return self.reason
        self._monitor()
        if self.options.sub("ns_").get_bool("view"):
            print(self.view())
        return self.reason

    def view(self) -> str:
        """ASCII view of the solver configuration (reference: NSView
        and per-class ASCII View methods)."""
        lines = [
            f"NS object, type {self.ns_type}",
            f"  mesh: {self.mesh}",
            f"  density rho = {self.rho:g}, viscosity mu = {self.mu:g}",
            f"  dt = {self.dt:g}, step = {self.step_index}, "
            f"t = {self.t:g}",
            f"  max_steps = {self.max_steps}, max_time = {self.max_time}",
            "  boundary conditions: "
            + ", ".join(
                f"{i}:{b.type.value if b else None}"
                for i, b in enumerate(self.bcs)
            ),
        ]
        if self.impl is not None:
            cfg = self.impl.cfg
            lines.append(
                f"  ksp: fgmres rtol={cfg.rtol:g} restart={cfg.restart}"
                f" + ABF(schur_ainv={cfg.schur_ainv},"
                f" upper_ainv={cfg.upper_ainv})"
            )
            lines.append(
                f"  schur: cg+mg ({len(self.impl.mg.levels)} levels)"
                f" rtol={cfg.schur_rtol:g};"
                f" momentum: bicgstab+jacobi rtol={cfg.mom_rtol:g}"
            )
        return "\n".join(lines)


def monitor_default(ns: NS) -> None:
    """Reference: NSMonitorDefault (nsmon.c:47-70)."""
    it = ""
    if ns.last_diag is not None:
        it = f"  ksp_its={int(ns.last_diag['ksp_iters'])}"
    print(f"step {ns.step_index}  dt {ns.dt:g}  time {ns.t:g}{it}")

"""Multi-device domain-decomposition tests on the virtual 8-device CPU
mesh — real sharded execution, closing the reference's gap where
``nsize`` was parsed but every test ran on 1 rank
(FlucaTestUtils.cmake:109-111, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluca_tpu.models.tgv import setup_taylor_green_2d, tgv_errors
from fluca_tpu.parallel.mesh import (
    make_device_grid,
    shard_state,
    state_shardings,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_device_grid_factorization():
    grid = make_device_grid(2, jax.devices()[:8])
    shape = tuple(grid.mesh.devices.shape)
    assert np.prod(shape) == 8
    assert shape in ((4, 2), (2, 4))
    grid3 = make_device_grid(3, jax.devices()[:8])
    assert tuple(grid3.mesh.devices.shape) == (2, 2, 2)


def test_sharded_step_matches_single_device():
    """One NS step on the 8-device grid must equal the single-device
    result (domain decomposition is exact, like the reference's
    rank-count independence of DMStag)."""
    ns = setup_taylor_green_2d(N=16, nsteps=1, t_final=0.1)
    impl = ns.impl
    state0 = ns.state

    ref, _ = impl._step_impl(
        jax.tree_util.tree_map(jnp.copy, state0), jnp.asarray(0.0),
        is_first_step=True,
    )

    grid = make_device_grid(2, jax.devices()[:8])
    sharded = shard_state(grid, jax.tree_util.tree_map(jnp.copy, state0))
    with grid.mesh:
        out, _ = jax.jit(
            lambda s, t: impl._step_impl(s, t, is_first_step=True)
        )(sharded, jnp.asarray(0.0))
    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(out["v"][c]), np.asarray(ref["v"][c]),
            atol=1e-10,
        )
    np.testing.assert_allclose(
        np.asarray(out["p"]), np.asarray(ref["p"]), atol=1e-10
    )


def test_sharded_solution_stays_sharded():
    """Output shardings must not collapse to replicated (the step
    must be genuinely distributed)."""
    ns = setup_taylor_green_2d(N=16, nsteps=1, t_final=0.1)
    impl = ns.impl
    grid = make_device_grid(2, jax.devices()[:8])
    sharded = shard_state(grid, ns.state)
    shardings = state_shardings(grid, ns.state)
    with grid.mesh:
        out, _ = jax.jit(
            lambda s, t: impl._step_impl(s, t, is_first_step=True),
            out_shardings=(shardings, None),
        )(sharded, jnp.asarray(0.0))
    p_shard = out["p"].sharding
    assert not p_shard.is_fully_replicated


def test_ns_shard_advance_matches_single_device():
    """First-class sharded solver path: NS.shard + advance() (the
    multi_step scan fast path) over the 8-device grid must reproduce
    the single-device run bitwise — the decomposition-independence
    oracle the reference never had in CI (nsize ignored,
    FlucaTestUtils.cmake:109-111)."""
    from fluca_tpu.models.cavity import setup_cavity_2d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    def run(sharded):
        ns = setup_cavity_2d(N=32, Re=100.0, dt=0.01, max_steps=100)
        ns.impl.cfg = CNLinearConfig.production()
        if sharded:
            ns.shard()
            assert ns.device_grid is not None
        ns.advance(50)
        return ns

    ref = run(False)
    par = run(True)
    # GSPMD reassociates the Krylov reductions, so exact-bitwise is
    # unattainable; measured drift over 50 steps is ~1e-15 (f64)
    for k in ("v", "U"):
        for a, b in zip(ref.state[k], par.state[k]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(ref.state["p"]), np.asarray(par.state["p"]),
        rtol=0, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(ref.state["phalf"]), np.asarray(par.state["phalf"]),
        rtol=0, atol=1e-13)
    # the sharded result really lives distributed
    shd = par.state["p"].sharding
    assert not shd.is_fully_replicated


def test_sharded_step_collective_counts():
    """Pin the number of halo/reduction collectives in the compiled
    sharded step: a regression here silently destroys the
    O(surface) communication claim (SCALING.md). Counts are per
    compiled program; the scan body's collectives appear once."""
    import jax

    from fluca_tpu.models.cavity import setup_cavity_2d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_cavity_2d(N=32, Re=100.0, dt=0.01, max_steps=10)
    ns.impl.cfg = CNLinearConfig.production()
    ns.shard()
    impl = ns.impl

    import jax.numpy as jnp
    from functools import partial

    fn = jax.jit(partial(impl._step_impl, is_first_step=False))
    lowered = fn.lower(ns.state, jnp.asarray(0.0, ns.dtype))
    txt = lowered.compile().as_text()
    n_cp = txt.count("collective-permute(")
    n_ar = txt.count("all-reduce(")
    n_ag = txt.count("all-gather(")
    # halo exchanges ride collective-permute; Krylov dots / mean
    # projections ride all-reduce; all-gather only appears for the
    # tiny MG coarse levels below the shardable size. Bounds are
    # measured+10% on the production preset (o3/m8/s6). r4 note:
    # production uses the unrolled GCR outer everywhere but gates
    # the unrolled INNER solvers on fused-kernel availability — on
    # this CPU mesh (no kernels) the inner solves are while_loops,
    # so their per-iteration collectives appear once in the program
    # text. Measured 2026-08-21: cp=368, ar=71, ag=148 (the GCR
    # outer's vdot-lowered tree dots emit all-gathers where the r3
    # fgmres ravel emitted all-reduces — same O(1) payloads).
    assert n_cp > 0 and n_ar > 0
    assert n_cp <= 405, f"collective-permute count grew: {n_cp}"
    assert n_ar <= 80, f"all-reduce count grew: {n_ar}"
    assert n_ag <= 165, f"all-gather count grew: {n_ag}"
    print(f"collectives: cp={n_cp} ar={n_ar} ag={n_ag}")


def test_one_device_grid_keeps_kernels():
    """A degenerate 1-device grid must not disable the fused Pallas
    kernels (VERDICT r2 item 1: a real-TPU run with -parallel_grid 1
    shows no regression vs the unsharded Pallas path). Kernels are
    platform-gated, so assert via sentinels: sharding with >1 device
    nulls them (momentum not yet shard_map-wrapped), 1 device keeps
    them."""
    ns = setup_taylor_green_2d(N=16, nsteps=1, t_final=0.1)
    impl = ns.impl
    sentinel = object()
    impl.ops._mom_kernel = sentinel
    grid1 = make_device_grid(2, jax.devices()[:1])
    impl.set_device_grid(grid1)
    assert impl.ops._mom_kernel is sentinel
    impl.ops._mom_kernel = None  # sentinel is not callable; step below
    # the degenerate grid still executes the sharded-constraint step
    ns.step()
    assert np.all(np.isfinite(np.asarray(ns.state["v"][0])))
    impl.ops._mom_kernel = sentinel
    grid8 = make_device_grid(2, jax.devices()[:8])
    impl.set_device_grid(grid8)
    assert impl.ops._mom_kernel is None

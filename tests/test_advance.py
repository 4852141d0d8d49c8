"""Fused multi-step (lax.scan) fast path must match step-by-step."""

import numpy as np

from fluca_tpu.models.tgv import setup_taylor_green_2d


def test_advance_matches_stepwise():
    a = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    a.solve()

    b = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    b.advance(4)
    assert b.step_index == 4
    np.testing.assert_allclose(b.t, a.t)
    np.testing.assert_allclose(
        np.asarray(b.state["p"]), np.asarray(a.state["p"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(b.state["v"][0]), np.asarray(a.state["v"][0]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(b.state["phalf"]), np.asarray(a.state["phalf"]),
        atol=1e-12,
    )


def test_advance_monitor_interval():
    """Monitors fire every ``monitor_interval`` steps inside
    advance() (chunked scan; VERDICT r2 item 8 — the reference calls
    monitors every step, nsbasic.c:336-345) and the result is
    identical to the unmonitored batch."""
    a = setup_taylor_green_2d(N=8, nsteps=10, t_final=0.5)
    a.advance(10)

    b = setup_taylor_green_2d(N=8, nsteps=10, t_final=0.5)
    seen = []
    b.add_monitor(lambda ns: seen.append(ns.step_index))
    b.monitor_interval = 3
    b.advance(10)
    # first step runs alone (compile variant), then chunks 3,3,3
    # starting at steps 1,4,7 — a monitor call before each chunk
    assert seen == [1, 4, 7]
    assert b.step_index == 10
    np.testing.assert_allclose(
        np.asarray(b.state["p"]), np.asarray(a.state["p"]), atol=1e-12
    )


def test_monitor_interval_from_options():
    from fluca_tpu.ns.monitor import set_monitors_from_options
    from fluca_tpu.utils.options import Options

    ns = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    opts = Options()
    opts.set("ns_monitor", "true")
    opts.set("ns_monitor_interval", "5")
    set_monitors_from_options(ns, opts)
    assert ns.monitor_interval == 5
    assert len(ns.monitors) == 1

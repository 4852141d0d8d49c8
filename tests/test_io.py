"""Checkpoint/restart + CGNS round-trip tests (closing the reference's
missing-round-trip gap, SURVEY.md §4)."""

import numpy as np
import pytest

from fluca_tpu.io.cgns import HAVE_H5PY, CGNSWriter, read_cgns
from fluca_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from fluca_tpu.models.tgv import setup_taylor_green_2d


def test_checkpoint_restart_bitwise_continuation(tmp_path):
    """A restarted run must continue exactly: run 4 steps; vs run 2,
    checkpoint, restore, run 2 more (the reference's restart
    invariant, app/main.c:83-87 + cnlinearcart2d.c:1969-1980)."""
    ns_full = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    ns_full.solve()

    ns_a = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    ns_a.max_steps = 2
    ns_a.solve()
    save_checkpoint(str(tmp_path / "ck"), ns_a)

    ns_b = setup_taylor_green_2d(N=8, nsteps=4, t_final=0.2)
    load_checkpoint(str(tmp_path / "ck"), ns_b)
    assert ns_b.step_index == 2
    ns_b.max_steps = 4
    ns_b.solve()

    for c in range(2):
        np.testing.assert_allclose(
            np.asarray(ns_b.state["v"][c]),
            np.asarray(ns_full.state["v"][c]),
            atol=1e-12,
        )
    np.testing.assert_allclose(
        np.asarray(ns_b.state["p"]), np.asarray(ns_full.state["p"]),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ns_b.state["phalf"]),
        np.asarray(ns_full.state["phalf"]), atol=1e-12,
    )


def test_checkpoint_grid_mismatch_rejected(tmp_path):
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    save_checkpoint(str(tmp_path / "ck"), ns)
    other = setup_taylor_green_2d(N=16, nsteps=1, t_final=0.1)
    with pytest.raises(AssertionError):
        load_checkpoint(str(tmp_path / "ck"), other)


@pytest.mark.skipif(not HAVE_H5PY, reason="h5py unavailable")
def test_cgns_roundtrip(tmp_path):
    ns = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    path = str(tmp_path / "out.cgns")
    with CGNSWriter(path, ns.mesh) as w:
        w.write_solution(ns)  # step 0 (initial state)
        ns.solve()
        w.write_solution(ns)  # step 2
    data = read_cgns(path)
    # mesh coords round-trip
    np.testing.assert_allclose(data["faces"][0], ns.mesh.faces[0])
    np.testing.assert_allclose(data["faces"][1], ns.mesh.faces[1])
    assert set(data["solutions"]) == {0, 2}
    sol = data["solutions"][2]
    np.testing.assert_allclose(
        sol["VelocityX"], np.asarray(ns.state["v"][0]), atol=1e-12
    )
    np.testing.assert_allclose(
        sol["Pressure"], np.asarray(ns.state["p"]), atol=1e-12
    )
    np.testing.assert_allclose(
        data["U"][2][0], np.asarray(ns.state["U"][0]), atol=1e-12
    )
    np.testing.assert_allclose(data["times"], [0.0, 0.1], atol=1e-12)


@pytest.mark.skipif(not HAVE_H5PY, reason="h5py unavailable")
def test_cgns_batch_rollover(tmp_path):
    """batch_size splits output across %d-templated files
    (flucacgns.c:104-115)."""
    ns = setup_taylor_green_2d(N=8, nsteps=3, t_final=0.15)
    path = str(tmp_path / "out_%d.cgns")
    with CGNSWriter(path, ns.mesh, batch_size=2) as w:
        for _ in range(3):
            w.write_solution(ns)
            ns.max_steps = ns.step_index + 1
            ns.solve()
    d0 = read_cgns(str(tmp_path / "out_0.cgns"))
    d1 = read_cgns(str(tmp_path / "out_1.cgns"))
    assert len(d0["solutions"]) == 2
    assert len(d1["solutions"]) == 1


@pytest.mark.skipif(not HAVE_H5PY, reason="h5py unavailable")
def test_cgns_requires_template_for_batch(tmp_path):
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    with pytest.raises(ValueError):
        CGNSWriter(str(tmp_path / "x.cgns"), ns.mesh, batch_size=2)

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


def test_cgns_sids_hdf5_schema():
    """Validate the CGNS writer's output against the SIDS-to-HDF5 file
    mapping RULES (CGNS standard, independent of our own reader):
    node = HDF5 group with 33-byte 'name'/'label' attrs and a 'type'
    attr in {MT,I4,I8,R4,R8,C1}; node data in a ' data' dataset with
    the matching dtype, Fortran (reversed-dims) order for arrays; the
    required root bookkeeping (' format', ' hdf5version',
    CGNSLibraryVersion_t); Base = CGNSBase_t [celldim, physdim]; a
    Structured Zone_t with size (3, IndexDim) in file order;
    GridCoordinates_t with per-axis DataArray_t vertex coordinates;
    FlowSolution_t with CellCenter GridLocation; BaseIterativeData_t
    TimeValues + ZoneIterativeData_t FlowSolutionPointers as
    32-char-padded names. This is the 'assert the exact node/attr
    schema' check the reference gets for free from pcgnslib
    (flucacgns.c:72-115)."""
    import h5py
    import pytest

    from fluca_tpu.io.cgns import HAVE_H5PY, CGNSWriter
    from fluca_tpu.models.tgv import setup_taylor_green_2d

    if not HAVE_H5PY:
        pytest.skip("h5py unavailable")

    import tempfile

    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    ns.solve()
    path = tempfile.mktemp(suffix=".cgns")
    with CGNSWriter(path, ns.mesh) as w:
        w.write_solution(ns)

    TYPED = {"MT": None, "I4": np.int32, "I8": np.int64,
             "R4": np.float32, "R8": np.float64, "C1": np.int8}

    def node_attrs(g):
        for a in ("name", "label", "type"):
            assert a in g.attrs, f"{g.name}: missing attr {a!r}"
            # fixed-size string attr types (S33/S33/S3 per the
            # ADF-to-HDF5 mapping); value bytes strip trailing NULs
            want = 3 if a == "type" else 33
            aid = g.attrs.get_id(a)
            assert aid.dtype.itemsize == want, (
                f"{g.name}.{a}: attr type S{aid.dtype.itemsize}, "
                f"want S{want}"
            )
        name = bytes(g.attrs["name"])
        label = bytes(g.attrs["label"])
        t = bytes(g.attrs["type"]).rstrip(b"\x00").decode()
        assert t in TYPED, f"{g.name}: bad type {t!r}"
        if t == "MT":
            assert " data" not in g, g.name
        else:
            assert " data" in g, f"{g.name}: typed node without data"
            assert g[" data"].dtype == TYPED[t], (
                g.name, g[" data"].dtype, t
            )
        return name.rstrip(b"\x00").decode(), \
            label.rstrip(b"\x00").decode(), t

    with h5py.File(path, "r") as f:
        # root bookkeeping
        assert " format" in f and " hdf5version" in f
        fmt = bytes(np.asarray(f[" format"]).astype(np.uint8)).decode()
        assert fmt.startswith("IEEE_LITTLE"), fmt

        assert "CGNSLibraryVersion" in f
        n, lbl, t = node_attrs(f["CGNSLibraryVersion"])
        assert lbl == "CGNSLibraryVersion_t" and t == "R4"

        base = f["Base"]
        n, lbl, t = node_attrs(base)
        assert lbl == "CGNSBase_t" and t == "I4"
        celldim, physdim = np.asarray(base[" data"])
        assert celldim == 2 and physdim == 2

        zone = base["Zone"]
        n, lbl, t = node_attrs(zone)
        assert lbl == "Zone_t" and t == "I4"
        zsize = np.asarray(zone[" data"])
        # file (C) order is the reverse of the SIDS (IndexDim, 3)
        assert zsize.shape == (3, celldim)
        nverts, ncells = zsize[0], zsize[1]
        assert list(ncells) == [8, 8]
        assert list(nverts) == [9, 9]

        ztype = zone["ZoneType"]
        n, lbl, t = node_attrs(ztype)
        assert lbl == "ZoneType_t" and t == "C1"
        assert bytes(
            np.asarray(ztype[" data"]).astype(np.uint8)
        ).decode() == "Structured"

        gc = zone["GridCoordinates"]
        n, lbl, _ = node_attrs(gc)
        assert lbl == "GridCoordinates_t"
        for cname in ("CoordinateX", "CoordinateY"):
            cn = gc[cname]
            n, lbl, t = node_attrs(cn)
            assert lbl == "DataArray_t" and t == "R8"
            # Fortran order: file dims are reversed vertex dims
            assert cn[" data"].shape == (9, 9)
        # CoordinateX must vary along the SIDS i-axis = file LAST axis
        cx = np.asarray(gc["CoordinateX"][" data"])
        assert np.allclose(cx[0], np.linspace(0, 1, 9) * 2 * np.pi), (
            "CoordinateX does not vary along the Fortran i-axis "
            "(transposition bug)"
        )

        sols = [k for k in zone if k.startswith("FlowSolution")]
        assert sols, "no FlowSolution_t nodes"
        sol = zone[sols[0]]
        n, lbl, _ = node_attrs(sol)
        assert lbl == "FlowSolution_t"
        gl = sol["GridLocation"]
        n, lbl, t = node_attrs(gl)
        assert lbl == "GridLocation_t"
        assert bytes(
            np.asarray(gl[" data"]).astype(np.uint8)
        ).decode() == "CellCenter"
        for fname in ("VelocityX", "VelocityY", "Pressure"):
            fn = sol[fname]
            n, lbl, t = node_attrs(fn)
            assert lbl == "DataArray_t" and t == "R8"
            assert fn[" data"].shape == (8, 8)

        # per-rank decomposition map (reference cartcgns.c:113-114:
        # "CellInfo" CellCenter solution with an Integer Rank field)
        ci = zone["CellInfo"]
        n, lbl, _ = node_attrs(ci)
        assert lbl == "FlowSolution_t"
        assert bytes(
            np.asarray(ci["GridLocation"][" data"]).astype(np.uint8)
        ).decode() == "CellCenter"
        rk = ci["Rank"]
        n, lbl, t = node_attrs(rk)
        assert lbl == "DataArray_t" and t == "I4"
        assert rk[" data"].shape == (8, 8)
        assert np.all(np.asarray(rk[" data"]) == 0)  # unsharded run

        bid = base["BaseIterativeData"]
        n, lbl, t = node_attrs(bid)
        assert lbl == "BaseIterativeData_t" and t == "I4"
        tv = bid["TimeValues"]
        n, lbl, t = node_attrs(tv)
        assert lbl == "DataArray_t" and t == "R8"

        zid = zone["ZoneIterativeData"]
        n, lbl, _ = node_attrs(zid)
        assert lbl == "ZoneIterativeData_t"
        ptrs = zid["FlowSolutionPointers"]
        n, lbl, t = node_attrs(ptrs)
        assert lbl == "DataArray_t" and t == "C1"
        raw = np.asarray(ptrs[" data"])
        assert raw.shape[0] == 32  # 32-char padded names, Fortran dims
        name0 = bytes(raw[:, 0].astype(np.uint8)).decode().strip()
        assert name0 == sols[0], (name0, sols[0])

        # every group in the file is a well-formed CGNS node
        def walk(g):
            for k, v in g.items():
                if isinstance(v, h5py.Group):
                    node_attrs(v)
                    walk(v)

        walk(f)
    import os as _os

    _os.unlink(path)


def test_shard_local_checkpoint_load_virtual(tmp_path):
    """Distributed checkpoint load on the virtual 8-device mesh: a
    sharded save (per-shard files + manifest) loads back through
    jax.make_array_from_callback with per-device hyperslab reads —
    each device's block comes straight from the overlapping shard
    files (VERDICT r2 missing item 5; reference analogue: per-rank
    hyperslab VecLoad, cartcgns.c:644-758)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from fluca_tpu.io.checkpoint import _save_checkpoint_sharded
    from fluca_tpu.models.cavity import setup_cavity_2d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns = setup_cavity_2d(N=16, Re=100.0, dt=0.01, max_steps=100)
    ns.impl.cfg = CNLinearConfig.production()
    ns.shard()
    ns.advance(3)
    ck = str(tmp_path / "ck")
    _save_checkpoint_sharded(ck, ns)

    ns2 = setup_cavity_2d(N=16, Re=100.0, dt=0.01, max_steps=100)
    ns2.impl.cfg = CNLinearConfig.production()
    ns2.shard()
    load_checkpoint(ck, ns2)
    assert ns2.step_index == 3
    # loaded distributed (not reassembled-then-replicated)
    assert not ns2.state["p"].sharding.is_fully_replicated
    for k in ("p", "phalf"):
        np.testing.assert_array_equal(
            np.asarray(ns2.state[k]), np.asarray(ns.state[k])
        )
    for c in range(2):
        np.testing.assert_array_equal(
            np.asarray(ns2.state["v"][c]), np.asarray(ns.state["v"][c])
        )
        np.testing.assert_array_equal(
            np.asarray(ns2.state["U"][c]), np.asarray(ns.state["U"][c])
        )
    # continuation from the shard-local load matches
    ns.advance(2)
    ns2.advance(2)
    np.testing.assert_allclose(
        np.asarray(ns2.state["p"]), np.asarray(ns.state["p"]),
        rtol=0, atol=1e-13,
    )

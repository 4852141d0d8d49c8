"""App CLI smoke test (reference: app/main.c run by hand)."""

import numpy as np

from fluca_tpu.app import main


def test_app_runs_and_checkpoints(tmp_path):
    ck = str(tmp_path / "ck")
    rc = main([
        "-cart_grid_x", "8", "-cart_grid_y", "8",
        "-ns_density", "10", "-ns_viscosity", "1",
        "-ns_time_step_size", "0.01", "-ns_max_steps", "3",
        "-checkpoint", ck,
    ])
    assert rc == 0
    import os

    assert os.path.exists(os.path.join(ck, "meta.json"))


def test_app_restart(tmp_path):
    ck = str(tmp_path / "ck")
    main([
        "-cart_grid_x", "8", "-cart_grid_y", "8",
        "-ns_max_steps", "2", "-ns_time_step_size", "0.01",
        "-checkpoint", ck,
    ])
    rc = main([
        "-cart_grid_x", "8", "-cart_grid_y", "8",
        "-ns_max_steps", "4", "-ns_time_step_size", "0.01",
        "-load_checkpoint", ck, "-checkpoint", str(tmp_path / "ck2"),
    ])
    assert rc == 0
    import json
    import os

    with open(os.path.join(str(tmp_path / "ck2"), "meta.json")) as f:
        meta = json.load(f)
    assert meta["step"] == 4  # restart continued to the new max_steps


def test_app_log_view(tmp_path, capsys):
    """-log_view prints the PETSc-style event table at exit
    (reference: -log_view via PetscLogView, nspkg.c:30-34)."""
    rc = main([
        "-cart_grid_x", "8", "-cart_grid_y", "8",
        "-ns_max_steps", "2", "-ns_time_step_size", "0.01",
        "-log_view",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Event" in out and "NS_Step" in out and "NS_SetUp" in out


def test_cgns_rank_map_sharded(tmp_path):
    """The CellInfo/Rank map reflects the device-grid decomposition
    (cartcgns.c:113-114): on a 2x4 virtual grid each cell's rank is
    the linear index of its owning device block."""
    import jax
    import pytest

    from fluca_tpu.io.cgns import HAVE_H5PY, CGNSWriter

    if not HAVE_H5PY:
        pytest.skip("h5py unavailable")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import h5py

    from fluca_tpu.models.cavity import setup_cavity_2d

    ns = setup_cavity_2d(N=16, Re=100.0, dt=0.01, max_steps=1)
    ns.shard(shape=(2, 4))
    ns.solve()
    path = str(tmp_path / "rank.cgns")
    with CGNSWriter(path, ns.mesh) as w:
        w.write_solution(ns)
    with h5py.File(path, "r") as f:
        rank = np.asarray(f["Base"]["Zone"]["CellInfo"]["Rank"][" data"]).T
    assert rank.shape == (16, 16)
    # 2 blocks of 8 rows x 4 blocks of 4 cols, linear index row-major
    expect = (np.arange(16)[:, None] // 8) * 4 + (
        np.arange(16)[None, :] // 4
    )
    np.testing.assert_array_equal(rank, expect)


def test_app_cgns_restart_flags(tmp_path):
    """-mesh_cart_create_from_file + -ns_load_solution_from_file
    (reference app/main.c:36-48,84-88): a run restarted from the CGNS
    solution written by a previous run continues from its step/time
    and reaches the same final state as an uninterrupted run."""
    import pytest

    from fluca_tpu.io.cgns import HAVE_H5PY, read_cgns

    if not HAVE_H5PY:
        pytest.skip("h5py unavailable")

    sol1 = str(tmp_path / "sol1.cgns")
    main([
        "-cart_grid_x", "8", "-cart_grid_y", "8",
        "-ns_max_steps", "2", "-ns_time_step_size", "0.01",
        "-ns_view_solution", sol1,
    ])
    sol2 = str(tmp_path / "sol2.cgns")
    rc = main([
        "-mesh_cart_create_from_file", sol1,
        "-ns_load_solution_from_file", sol1,
        "-ns_max_steps", "4", "-ns_time_step_size", "0.01",
        "-ns_view_solution", sol2,
    ])
    assert rc == 0

    solref = str(tmp_path / "ref.cgns")
    main([
        "-cart_grid_x", "8", "-cart_grid_y", "8",
        "-ns_max_steps", "4", "-ns_time_step_size", "0.01",
        "-ns_view_solution", solref,
    ])
    d2 = read_cgns(sol2)
    dr = read_cgns(solref)
    s2 = d2["solutions"][max(d2["solutions"])]
    sr = dr["solutions"][max(dr["solutions"])]
    assert max(d2["solutions"]) == 4
    for fname in ("VelocityX", "VelocityY", "Pressure",
                  "PressureHalfStep"):
        np.testing.assert_array_equal(s2[fname], sr[fname])

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

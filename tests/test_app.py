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

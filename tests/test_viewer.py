"""Viewer option parsing, CGNS mesh/solution load, NS ASCII view."""

import numpy as np
import pytest

from fluca_tpu.io.cgns import (
    HAVE_H5PY,
    CGNSWriter,
    load_solution_cgns,
    mesh_from_cgns,
)
from fluca_tpu.io.viewer import AsciiViewer, create_viewer_from_options
from fluca_tpu.models.tgv import setup_taylor_green_2d
from fluca_tpu.utils.options import Options


def test_viewer_option_parsing(tmp_path):
    o = Options({"ns_view_solution": "ascii"})
    v = create_viewer_from_options(o, "ns_view_solution")
    assert isinstance(v, AsciiViewer) and v.filename is None
    o = Options({"x": f"ascii:{tmp_path}/log.txt"})
    v = create_viewer_from_options(o, "x")
    assert v.filename.endswith("log.txt")
    assert create_viewer_from_options(o, "missing") is None
    with pytest.raises(ValueError):
        create_viewer_from_options(Options({"x": "bogus:f"}), "x")


def test_viewer_format_mode_parsing(tmp_path):
    """Full type:filename:format:mode syntax (viewerbasic.c:24-92):
    empty type defaults to ascii, unknown format/mode raise, write
    mode truncates, append preserves."""
    from fluca_tpu.io.viewer import parse_viewer_spec

    assert parse_viewer_spec(":out.txt") == (
        "ascii", "out.txt", "default", "write")
    assert parse_viewer_spec("ascii:f:ascii_info:append") == (
        "ascii", "f", "ascii_info", "append")
    with pytest.raises(ValueError, match="format"):
        parse_viewer_spec("ascii:f:bogusfmt")
    with pytest.raises(ValueError, match="file mode"):
        parse_viewer_spec("ascii:f:default:bogusmode")

    path = tmp_path / "log.txt"
    path.write_text("old\n")
    v = create_viewer_from_options(
        Options({"x": f"ascii:{path}:default:append"}), "x")
    assert v.mode == "append" and path.read_text() == "old\n"
    create_viewer_from_options(Options({"x": f"ascii:{path}"}), "x")
    assert path.read_text() == ""  # FILE_MODE_WRITE truncates


@pytest.mark.skipif(not HAVE_H5PY, reason="h5py unavailable")
def test_cgns_viewer_from_options(tmp_path):
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    o = Options({"v": f"cgns:{tmp_path}/o.cgns"})
    w = create_viewer_from_options(o, "v", mesh=ns.mesh)
    with w:
        w.write_solution(ns)
    assert (tmp_path / "o.cgns").exists()


@pytest.mark.skipif(not HAVE_H5PY, reason="h5py unavailable")
def test_cgns_mesh_and_solution_restart(tmp_path):
    """Full CGNS-based restart: mesh + fields + step/time round-trip
    (the reference's -mesh_cart_create_from_file /
    -ns_load_solution_from_file path, app/main.c:35-48,83-87)."""
    ns = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    ns.solve()
    path = str(tmp_path / "restart.cgns")
    with CGNSWriter(path, ns.mesh) as w:
        w.write_solution(ns)

    mesh2 = mesh_from_cgns(path)
    assert mesh2.N == ns.mesh.N
    np.testing.assert_allclose(mesh2.faces[0], ns.mesh.faces[0])

    ns2 = setup_taylor_green_2d(N=8, nsteps=2, t_final=0.1)
    load_solution_cgns(path, ns2)
    assert ns2.step_index == 2
    np.testing.assert_allclose(ns2.t, ns.t)
    np.testing.assert_allclose(
        np.asarray(ns2.state["p"]), np.asarray(ns.state["p"]),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(ns2.state["phalf"]), np.asarray(ns.state["phalf"]),
        atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(ns2.state["U"][0]), np.asarray(ns.state["U"][0]),
        atol=1e-14,
    )


def test_ns_ascii_view():
    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    s = ns.view()
    assert "cnlinear" in s and "fgmres" in s and "ABF" in s
    assert "rho = 1" in s


def test_ascii_viewer_writes(tmp_path, capsys):
    from fluca_tpu.io.viewer import AsciiViewer

    ns = setup_taylor_green_2d(N=8, nsteps=1, t_final=0.1)
    v = AsciiViewer()
    v.write_solution(ns)
    out = capsys.readouterr().out
    assert "step=0" in out and "|u|max=" in out
    path = tmp_path / "log.txt"
    v2 = AsciiViewer(str(path))
    v2.write_solution(ns)
    v2.write_solution(ns)
    assert path.read_text().count("step=0") == 2


def test_event_log():
    from fluca_tpu.utils.profiling import EventLog

    log = EventLog()
    with log.event("X"):
        pass
    with log.event("X"):
        pass
    s = log.view()
    assert "X" in s and log.counts["X"] == 2

"""Option-string viewer factory.

Reference: FlucaOptionsCreateViewer (fluca/src/viewer/interface/
viewerbasic.c:4-145) parses ``type:filename:format:mode`` strings
(types ``ascii``/``cgns``) from the options database. Same syntax
here; returns a viewer object with ``write_solution(ns)``/``close``.
"""

from __future__ import annotations

import sys


class AsciiViewer:
    def __init__(self, filename: str | None = None):
        self.filename = filename

    def write_solution(self, ns) -> None:
        import numpy as np

        out = (
            open(self.filename, "a") if self.filename else sys.stdout
        )
        u = np.asarray(ns.state["v"][0])
        p = np.asarray(ns.state["p"])
        print(
            f"step={ns.step_index} t={ns.t:g} "
            f"|u|max={np.abs(u).max():.6g} "
            f"|p|max={np.abs(p).max():.6g}",
            file=out,
        )
        if self.filename:
            out.close()

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def create_viewer_from_options(opts, name: str, mesh=None):
    """Parse ``-<name> type[:filename[:format[:mode]]]`` into a viewer
    (viewerbasic.c:133-145). Returns None when the option is absent."""
    spec = opts.get_str(name)
    if spec is None:
        return None
    parts = spec.split(":")
    vtype = parts[0] or "ascii"
    filename = parts[1] if len(parts) > 1 and parts[1] else None
    if vtype == "ascii":
        return AsciiViewer(filename)
    if vtype in ("cgns", "flucacgns"):
        from fluca_tpu.io.cgns import CGNSWriter

        assert mesh is not None, "cgns viewer needs the mesh"
        assert filename, "cgns viewer needs a filename"
        batch = opts.get_int("viewer_cgns_batch_size", None)
        return CGNSWriter(filename, mesh, batch_size=batch)
    raise ValueError(f"unknown viewer type {vtype!r} in {spec!r}")

"""Checkpoint / restart.

The reference uses CGNS as both visualization and checkpoint format,
writing all solution fields plus the pressure-extrapolation state
``phalf`` ("PressureHalfStep") and step/time metadata, and restoring
them on restart (fluca/src/ns/interface/nssol.c:130-204,
fluca/src/ns/impl/linearcn/cnlinear.c:146-162). Here the fast
checkpoint path is a plain npz + JSON bundle with bit-exact
round-trip of every field (restart continuity: the pressure
extrapolation continues exactly, cnlinearcart2d.c:1969-1980);
CGNS export (fluca_tpu.io.cgns) covers tool compatibility.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(path: str, ns) -> None:
    """Write state + metadata. ``path`` is a directory. Large fields
    stream through the native fastio engine (fluca_tpu.native) when
    available, falling back to npz."""
    os.makedirs(path, exist_ok=True)
    state = ns.state
    arrays = {"p": np.asarray(state["p"]), "phalf": np.asarray(state["phalf"])}
    for c, a in enumerate(state["v"]):
        arrays[f"v{c}"] = np.asarray(a)
    for d, a in enumerate(state["U"]):
        arrays[f"U{d}"] = np.asarray(a)

    from fluca_tpu import native

    used_native = True
    array_meta = {}
    for name, a in arrays.items():
        array_meta[name] = {"shape": list(a.shape), "dtype": str(a.dtype)}
        if not native.write_array(
            os.path.join(path, f"{name}.bin"), a
        ):
            used_native = False
            break
    if not used_native:
        np.savez(os.path.join(path, "fields.npz"), **arrays)
    meta = {
        "format": "native" if used_native else "npz",
        "arrays": array_meta,
        "step": ns.step_index,
        "time": ns.t,
        "dt": ns.dt,
        "rho": ns.rho,
        "mu": ns.mu,
        "dim": ns.mesh.dim,
        "N": list(ns.mesh.N),
        "periodic": list(ns.mesh.periodic),
        "faces": [f.tolist() for f in ns.mesh.faces],
    }
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(meta, fh)


def load_checkpoint(path: str, ns) -> None:
    """Restore state + step/time into an already set-up NS object,
    verifying grid compatibility (the reference checks sizes on load,
    cartcgns.c:644-758)."""
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    assert list(ns.mesh.N) == meta["N"], (
        f"grid size mismatch: {ns.mesh.N} vs {meta['N']}"
    )
    assert list(ns.mesh.periodic) == meta["periodic"]
    if meta.get("format") == "native":
        from fluca_tpu import native

        data = {}
        for name, am in meta["arrays"].items():
            arr = native.read_array(
                os.path.join(path, f"{name}.bin"),
                tuple(am["shape"]), np.dtype(am["dtype"]),
            )
            if arr is None:  # toolchain missing at load time
                raise IOError("native checkpoint requires fastio")
            data[name] = arr
    else:
        data = np.load(os.path.join(path, "fields.npz"))
    import jax.numpy as jnp

    dim = ns.mesh.dim
    ns.setup()
    ns.set_solution(
        v=tuple(jnp.asarray(data[f"v{c}"]) for c in range(dim)),
        U=tuple(jnp.asarray(data[f"U{d}"]) for d in range(dim)),
        p=jnp.asarray(data["p"]),
        phalf=jnp.asarray(data["phalf"]),
    )
    ns.step_index = int(meta["step"])
    ns.t = float(meta["time"])

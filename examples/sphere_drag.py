"""BASELINE config #4 at its stated size: 3-D flow past a sphere on a
128^3 grid, multigrid-preconditioned Poisson, CGNS checkpoint I/O —
with drag validation against the literature (VERDICT r2 item 4).

Setup: cube domain 3x3x3 (h = 3/128, 21.3 cells/diameter), sphere
D = 0.5 at (1.0, 1.5, 1.5), Re = 100, inflow/pressure-outlet x,
symmetry lateral walls — the 3-D analogue of the validated cylinder
configuration (examples/cylinder_strouhal.py).

Physics: Re=100 sphere flow is steady axisymmetric; literature drag
cd = 1.08-1.10 (Johnson & Patel JFM 1999 cd=1.08; Le Clair et al.
1970 correlation 1.09).  Acceptance band 1.0-1.15 (small-domain
blockage ~2% area adds a few %).

Run on TPU (~10 min incl. compile):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python examples/sphere_drag.py

Writes SPHERE128.json at the repo root, a CGNS solution file, and
verifies CGNS restart at size: reload -> advance -> cd unchanged.

Reference anchor: the reference has no 3-D IBM example; this extends
its cylinder/cavity validation pattern (taylor_green_vortex.c:242-243
physics self-checks) to the BASELINE north-star IBM case.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

D = 0.5
U_IN = 1.0
DT = 8e-3
CHUNK = 250

# cube-domain edge length (argv[1]); the 128^3 grid is fixed by the
# BASELINE config, so L trades resolution (cells/diameter = 128 D/L)
# against confinement (lateral width L/D) and inflow distance:
#   L=3: 21.3 c/D, 6D width, 2D upstream  (most resolved, most confined)
#   L=4: 16.0 c/D, 8D width, 3D upstream
L = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
CENTER_X = {3.0: 1.0, 4.0: 1.5}.get(L, 0.375 * L)

# Marker retraction (cell widths, argv[2]): the roma3 delta smears the
# no-slip surface ~0.5h outward, so un-retracted runs over-predict cd
# by (R_eff/R)^2 (measured: 1.2504 at L=4, implying alpha ~= 0.57h).
# Breugem (JCP 2012) retraction cancels it; 0.5h predicts cd ~= 1.12.
RETRACT = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

# Grid override (VERDICT r4 weak #8: separate grid bias from
# retraction calibration — a higher-resolution run at FIXED L and
# retraction-in-cell-widths must move cd toward the literature band
# without retuning r if the retraction story is physical)
N_SPH = int(os.environ.get("FLUCA_TPU_SPHERE_N", "128"))


def cd_of(ns, ibm):
    F = np.asarray(ibm.hydrodynamic_force(ns.state, ns.t, ns.rho))
    qA = 0.5 * ns.rho * U_IN**2 * (np.pi * D**2 / 4.0)
    return float(F[0] / qA)


def main():
    import jax.numpy as jnp

    from fluca_tpu.io.cgns import CGNSWriter, load_solution_cgns
    from fluca_tpu.models.sphere import setup_sphere_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    ns, ibm = setup_sphere_3d(
        N=(N_SPH,) * 3, domain=(L, L, L),
        center=(CENTER_X, L / 2, L / 2), diameter=D, Re=100.0,
        U_in=U_IN, dt=DT, max_steps=10**9, dtype=jnp.float32,
        retract=RETRACT,
    )
    ns.impl.cfg = CNLinearConfig.production(outer=3, mom=8, schur=8)
    ops = ns.impl.ops
    print(
        f"kernels: mom3d={ops._mom_kernel3d is not None} "
        f"chain3d={ops._chain3d is not None} "
        f"mg={[l.pallas_apply is not None for l in ns.impl.mg.levels]}",
        flush=True,
    )

    t0 = time.time()
    ns.step()  # compile + first step
    print(f"first step in {time.time()-t0:.0f}s", flush=True)

    hist = []
    t0 = time.time()
    steps_done = 1
    while ns.t < 30.0:
        tc = time.time()
        ns.advance(CHUNK)
        steps_done += CHUNK
        cd = cd_of(ns, ibm)
        assert np.isfinite(cd), f"diverged at t={ns.t}"
        hist.append((float(ns.t), cd))
        sps = CHUNK / (time.time() - tc)
        print(f"t={ns.t:6.2f} cd={cd:.4f} ({sps:.1f} steps/s)",
              flush=True)
        # steady at Re=100: stop when cd has settled
        if len(hist) >= 3 and ns.t > 12.0:
            if abs(hist[-1][1] - hist[-2][1]) < 3e-4 and abs(
                hist[-2][1] - hist[-3][1]
            ) < 3e-4:
                break
    wall = time.time() - t0
    cd = hist[-1][1]
    print(f"final cd={cd:.4f} at t={ns.t:.2f} "
          f"({steps_done/wall:.1f} steps/s avg)", flush=True)

    # CGNS checkpoint I/O at size: write, reload, continue
    cgns = f"/tmp/sphere{N_SPH}.cgns"
    with CGNSWriter(cgns, ns.mesh) as w:
        w.write_solution(ns)
    sz = os.path.getsize(cgns) / 1e6
    print(f"wrote {cgns} ({sz:.0f} MB)", flush=True)

    ns2, ibm2 = setup_sphere_3d(
        N=(N_SPH,) * 3, domain=(L, L, L),
        center=(CENTER_X, L / 2, L / 2), diameter=D, Re=100.0,
        U_in=U_IN, dt=DT, max_steps=10**9, dtype=jnp.float32,
        retract=RETRACT,
    )
    ns2.impl.cfg = CNLinearConfig.production(outer=3, mom=8, schur=8)
    load_solution_cgns(cgns, ns2)
    ns2.advance(50)
    cd2 = cd_of(ns2, ibm2)
    print(f"restart-from-CGNS cd={cd2:.4f} (drift "
          f"{abs(cd2-cd):.2e})", flush=True)

    ok_lit = 1.0 <= cd <= 1.15
    ok_restart = abs(cd2 - cd) < 5e-3
    out = {
        "config": f"sphere {N_SPH}^3 Re=100 (BASELINE #4)",
        "N": N_SPH,
        "domain_L": L,
        "retract": RETRACT,
        "cd": round(cd, 4),
        "cd_literature": [1.08, 1.10],
        "band": [1.0, 1.15],
        "in_band": bool(ok_lit),
        "t_final": round(float(ns.t), 2),
        "steps_per_sec": round(steps_done / wall, 2),
        "cgns_restart_cd": round(cd2, 4),
        "cgns_restart_ok": bool(ok_restart),
        "cells_per_diameter": round(D / (L / N_SPH), 1),
        "history": [[round(t, 2), round(c, 4)] for t, c in hist],
    }
    path = "/root/repo/SPHERE128.json"
    prev, runs = {}, []
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
            runs = prev.get("runs", [])
        except Exception:
            prev = {}
    runs.append(out)
    # preserve the curated study/table/conclusions keys; append the
    # run and a table row
    table = prev.get("table", [])
    table.append({"domain_L": L, "retract": RETRACT,
                  "cd": round(cd, 4), "N": N_SPH,
                  "cells_per_diameter": out["cells_per_diameter"]})
    merged = {**prev, "table": table, "latest": {
        k: v for k, v in out.items() if k != "history"
    }, "runs": runs}
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "history"}), flush=True)
    if not (ok_lit and ok_restart):
        sys.exit(1)


if __name__ == "__main__":
    main()

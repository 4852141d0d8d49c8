"""Turbulent channel at Re_tau = 180, 128^3 wall-clustered
(BASELINE #5's word "turbulent"; VERDICT r3 item 6): run long enough
on TPU to show (a) perturbation energy does NOT decay to laminar,
(b) the mean profile is qualitatively log-law, (c) u_tau recovered
within ~10% of the forcing balance (rho u_tau^2 = f_x delta =>
u_tau = 1 exactly at statistical stationarity).

Box: (4, 2, 2) delta = 720 x 360 wall units streamwise/spanwise —
the minimal-flow-unit regime (Jimenez & Moin 1991: sustained
turbulence needs Lx+ >~ 250-350, Lz+ >~ 100), so sustained
fluctuation energy here is a meaningful (if minimal) turbulence
demonstration. Grid: dx+ = 5.6, dz+ = 2.8, first cell y+ ~ 0.2
(tanh stretch g=2).

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
      python examples/channel_turb.py [T_total] [dt]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def turb_stats(ns):
    """(E_turb, u_tau, mean_profile): fluctuation kinetic energy
    about the xz-mean profile, friction velocity from the wall
    gradient (both walls averaged), and the xz-mean streamwise
    profile."""
    v = [np.asarray(x, np.float64) for x in ns.state["v"]]
    nu = ns.mu / ns.rho
    cy = np.asarray(ns.mesh.centers(1))
    Umean = v[0].mean(axis=(0, 2))
    up = v[0] - Umean[None, :, None]
    E = 0.5 * float((up**2 + v[1] ** 2 + v[2] ** 2).mean())
    # wall gradient from the first cell center (no-slip wall at y=0
    # and y=2delta)
    dudy_lo = Umean[0] / cy[0]
    dudy_hi = Umean[-1] / (2.0 - cy[-1])
    tau = nu * 0.5 * (dudy_lo + dudy_hi)
    u_tau = float(np.sqrt(max(tau, 0.0)))
    return E, u_tau, Umean


def main():
    import jax.numpy as jnp

    from fluca_tpu.models.channel import setup_channel_3d
    from fluca_tpu.ns.cnlinear import CNLinearConfig

    T_total = float(sys.argv[1]) if len(sys.argv) > 1 else 40.0
    dt = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    # N=64 is the classic minimal-channel resolution (dx+ = 11.25,
    # dz+ = 5.6, first cell y+ ~ 0.4 at tanh g=2) and ~8x cheaper
    # per step than 128^3
    N = int(os.environ.get("FLUCA_TPU_TURB_N", "128"))
    ns = setup_channel_3d(
        N=(N, N, N), dt=dt, max_steps=10**9, stretch_y=2.0,
        perturb=0.2, dtype=jnp.float32,
    )
    cfg = CNLinearConfig.production()
    # bf16 preconditioning is NOT usable here: on the wall-clustered
    # (anisotropic) grid the bf16 V-cycle is too weak and the
    # fixed-budget solve returns x ~ 0 — the mean flow itself decays
    # (observed r4: u_tau -> 2e-4 within t=10). Opt-in kept for
    # experiments only.
    if os.environ.get("FLUCA_TPU_TURB_BF16") == "1":
        cfg.precond_dtype = "bfloat16"
    ns.impl.cfg = cfg

    chunk = 500
    nsteps = int(round(T_total / dt))
    series = []
    prof_acc = None
    prof_n = 0
    t_stats = 0.5 * T_total  # average the profile over the 2nd half
    t0 = time.time()
    ns.step()
    for k in range(nsteps // chunk):
        ns.advance(chunk)
        E, u_tau, Umean = turb_stats(ns)
        t = ns.t
        series.append(
            {"t": round(float(t), 4), "E_turb": E,
             "u_tau": round(u_tau, 4)}
        )
        print(
            f"t={t:7.3f}  E_turb={E:10.4e}  u_tau={u_tau:.4f}  "
            f"({(k+1)*chunk + 1} steps, "
            f"{((k+1)*chunk)/(time.time()-t0):.1f} steps/s)",
            flush=True,
        )
        if t >= t_stats:
            prof_acc = (
                Umean if prof_acc is None else prof_acc + Umean
            )
            prof_n += 1
        if not np.isfinite(E):
            print("DIVERGED", flush=True)
            break
        if t >= 2.0 and u_tau < 0.3:
            # mean-flow collapse guard: the forcing balance pins
            # u_tau ~ 1; a near-zero wall gradient means the solver
            # is returning ~zero corrections (preconditioner too
            # weak for the budget), not physics
            print("COLLAPSED (u_tau ~ 0): solver under-resolving",
                  flush=True)
            break

    Umean = (prof_acc / max(prof_n, 1)) if prof_acc is not None \
        else turb_stats(ns)[2]
    u_tau_final = float(
        np.mean([s["u_tau"] for s in series[-10:]])
    ) if len(series) >= 10 else series[-1]["u_tau"]
    cy = np.asarray(ns.mesh.centers(1))
    nu = ns.mu / ns.rho
    yp = cy[: N // 2] * u_tau_final / nu
    Up = Umean[: N // 2] / max(u_tau_final, 1e-12)

    # sustained-turbulence verdict: fluctuation energy in the last
    # quarter holds the statistically-steady band (vs the SECOND-half
    # median — comparing against the global max would test against
    # the initial transition spike, which is ~50x the steady level;
    # laminarization decays E exponentially toward 0)
    Es = [s["E_turb"] for s in series]
    ref_band = float(np.median(Es[len(Es) // 2:])) if Es else 0.0
    sustained = (
        len(Es) > 8
        and min(Es[-len(Es) // 4:]) > 0.3 * ref_band
        and ref_band > 1e-3
        and np.isfinite(Es[-1])
    )
    out = {
        "config": {"N": N, "Re_tau": 180.0, "dt": dt,
                   "T_total": T_total, "L": [4.0, 2.0, 2.0],
                   "stretch_y": 2.0, "perturb": 0.2,
                   "box_wall_units": [720, 360],
                   "dx_plus": round(4.0 / N * 180, 2),
                   "dz_plus": round(2.0 / N * 180, 2)},
        "series": series,
        "u_tau_final": u_tau_final,
        "u_tau_target": 1.0,
        "u_tau_rel_err": abs(u_tau_final - 1.0),
        "sustained": bool(sustained),
        "mean_profile": {
            "y_plus": [round(float(x), 3) for x in yp],
            "U_plus": [round(float(x), 4) for x in Up],
        },
    }
    with open("/root/repo/CHANNEL_TURB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("series", "mean_profile")}),
          flush=True)


if __name__ == "__main__":
    main()

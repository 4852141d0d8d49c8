"""Worker for the true multi-process test (tests/test_multiprocess.py).

Each OS process owns one CPU device; jax.distributed connects them
into one global runtime — the structural equivalent of one MPI rank
per process in the reference (PetscInitialize -> MPI_Init,
flucainit.c:14-18). Run: python multiproc_worker.py <pid> <nprocs>
<coordinator>.
"""

import sys


def main():
    pid, nprocs, coord = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    )

    import jax

    # CPU platform must be pinned before the backend initializes
    # (see CLAUDE.md platform-selection gotcha)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=nprocs,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fluca_tpu.parallel.halo import stencil_apply_sharded
    from fluca_tpu.parallel.mesh import make_device_grid

    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs

    # 1-D device grid over both processes' devices; global array
    # sharded across processes
    grid = make_device_grid(1, jax.devices())
    N = 16
    n_local = N // nprocs
    lo = pid * n_local
    w = np.arange(1.0, N + 1.0)
    bands_np = [{-1: w * 0.5, 0: -2.0 * w, 1: np.roll(w, -1) * 0.25}]

    xg = np.arange(N, dtype=np.float64) ** 2
    sharding = NamedSharding(grid.mesh, P("gx"))

    # multi-process arrays are assembled from each process's LOCAL
    # slice (no process holds the global array — the distributed
    # analogue of DMStag ownership ranges)
    def dist(arr):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(arr[lo : lo + n_local])
        )

    xs = dist(xg)
    bands = [
        {off: dist(ww) for off, ww in bands_np[0].items()}
    ]

    with grid.mesh:
        got = stencil_apply_sharded(grid, bands, xs, (True,))
        psum_total = jax.jit(
            lambda a: jnp.sum(a),
            out_shardings=NamedSharding(grid.mesh, P()),
        )(xs)

    # single-process reference
    ref = np.zeros(N)
    for off, ww in bands_np[0].items():
        ref += ww * np.roll(xg, -off)

    local = np.asarray(
        [s.data for s in got.addressable_shards][0]
    ).ravel()
    np.testing.assert_allclose(
        local, ref[lo : lo + n_local], atol=1e-12
    )
    assert float(psum_total) == float(xg.sum())
    print(f"proc {pid}/{nprocs}: OK shard[{lo}:{lo + n_local}]",
          flush=True)

    # phase 2 (optional): sharded NS run + per-shard checkpoint write
    # — the multi-host write path (collective MPI-IO equivalent,
    # flucacgns.c:241-242); the parent test reloads it single-process
    if len(sys.argv) > 4:
        ckdir = sys.argv[4]
        jax.config.update("jax_enable_x64", True)

        from fluca_tpu.io.checkpoint import save_checkpoint
        from fluca_tpu.models.cavity import setup_cavity_2d
        from fluca_tpu.ns.cnlinear import CNLinearConfig

        ns = setup_cavity_2d(N=16, Re=100.0, dt=0.01, max_steps=100,
                             dtype=jnp.float64)
        ns.impl.cfg = CNLinearConfig.production()
        ns.shard(make_device_grid(2, jax.devices()))
        ns.advance(3)
        save_checkpoint(ckdir, ns)
        print(f"proc {pid}/{nprocs}: checkpoint written", flush=True)

        # phase 2b: shard-LOCAL reload — each process reads only the
        # index ranges its devices own (mmap partial reads; the
        # reference's per-rank hyperslab VecLoad, cartcgns.c:644-758)
        import json as _json
        import os as _os

        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("worker_ck_done")
        from fluca_tpu.io.checkpoint import _load_sharded_distributed

        with open(_os.path.join(ckdir, "meta.json")) as fh:
            meta = _json.load(fh)
        data, reader = _load_sharded_distributed(ckdir, meta, ns)
        total = sum(
            int(np.prod(am["shape"]))
            * np.dtype(am["dtype"]).itemsize
            for am in meta["arrays"].values()
        )
        # loaded shards must equal the live state's shards exactly
        for name, live in (
            ("p", ns.state["p"]), ("phalf", ns.state["phalf"]),
            ("v0", ns.state["v"][0]), ("v1", ns.state["v"][1]),
            ("U0", ns.state["U"][0]), ("U1", ns.state["U"][1]),
        ):
            got = {
                str(s.index): np.asarray(s.data)
                for s in data[name].addressable_shards
            }
            want = {
                str(s.index): np.asarray(s.data)
                for s in live.addressable_shards
            }
            assert got.keys() == want.keys(), name
            for k in got:
                np.testing.assert_array_equal(got[k], want[k])
        print(
            f"proc {pid}/{nprocs}: shardload bytes "
            f"{reader.nbytes_read} of {total}",
            flush=True,
        )

        # phase 3: distributed CGNS write (per-process hyperslabs,
        # the cgp_field_write_data equivalent) — every process calls
        # write_solution; no process materializes a global field
        try:
            from fluca_tpu.io.cgns import HAVE_H5PY, CGNSWriter
        except Exception:
            HAVE_H5PY = False
        if HAVE_H5PY:
            import os

            with CGNSWriter(
                os.path.join(ckdir, "sol.cgns"), ns.mesh
            ) as w:
                w.write_solution(ns)
            print(f"proc {pid}/{nprocs}: cgns written", flush=True)


if __name__ == "__main__":
    main()

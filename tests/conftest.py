"""Test configuration: run numerics tests on CPU in float64 with a
virtual 8-device mesh for multi-chip sharding tests (the reference's
tests run on 1 MPI rank; we close that gap with simulated meshes, see
SURVEY.md §4).

Note: the environment may pre-import jax (sitecustomize) with a TPU
platform selected, so platform/device-count must be set through
jax.config, not env vars.
"""

import os

os.environ.setdefault("FLUCA_TPU_DTYPE", "float64")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

"""Global numeric configuration.

The reference builds with PETSc double precision everywhere. On TPU,
float32 is the performant native width (float64 is software-emulated),
so the compute dtype is configurable: float32 by default on TPU,
float64 available for verification runs on CPU (tests enable
``jax_enable_x64``).
"""

import os

import jax.numpy as jnp

_DTYPE_NAMES = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "float64": jnp.float64,
    "f64": jnp.float64,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}

_default_dtype = None


def default_dtype():
    """Compute dtype for field data and stencil coefficients."""
    global _default_dtype
    if _default_dtype is None:
        name = os.environ.get("FLUCA_TPU_DTYPE", "float32")
        _default_dtype = _DTYPE_NAMES[name]
    return _default_dtype


def set_default_dtype(dtype):
    global _default_dtype
    if isinstance(dtype, str):
        dtype = _DTYPE_NAMES[dtype]
    _default_dtype = dtype

"""Regularized delta kernels for the immersed boundary method.

The reference advertises an IBM (README.md:3-13) but contains no
implementation (THEORY_GUIDE.md:146-148 is an empty TODO); this module
implements it per the BASELINE.json north star: delta-function marker
interpolation/spreading on uniform Cartesian grids.

Kernels (1-D; the dim-D delta is the tensor product / h^dim):
  roma3   — 3-point kernel of Roma, Peskin & Berger (1999)
  peskin4 — classic 4-point cosine-smooth kernel of Peskin (2002)
"""

from __future__ import annotations

import jax.numpy as jnp


def delta_roma3(r):
    """phi(r) with support |r| <= 1.5 (r in cell widths)."""
    a = jnp.abs(r)
    inner = (1.0 + jnp.sqrt(jnp.maximum(1.0 - 3.0 * a * a, 0.0))) / 3.0
    outer = (
        5.0 - 3.0 * a
        - jnp.sqrt(jnp.maximum(-3.0 * (1.0 - a) ** 2 + 1.0, 0.0))
    ) / 6.0
    return jnp.where(a <= 0.5, inner, jnp.where(a <= 1.5, outer, 0.0))


def delta_peskin4(r):
    """phi(r) with support |r| <= 2."""
    a = jnp.abs(r)
    inner = (3.0 - 2.0 * a + jnp.sqrt(
        jnp.maximum(1.0 + 4.0 * a - 4.0 * a * a, 0.0))) / 8.0
    outer = (5.0 - 2.0 * a - jnp.sqrt(
        jnp.maximum(-7.0 + 12.0 * a - 4.0 * a * a, 0.0))) / 8.0
    return jnp.where(a <= 1.0, inner, jnp.where(a <= 2.0, outer, 0.0))


KERNELS = {
    "roma3": (delta_roma3, 3),  # (function, support width in cells)
    "peskin4": (delta_peskin4, 4),
}

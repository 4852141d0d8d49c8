"""TVD flux limiters psi(r).

The reference registers 11 limiters (fluca/src/fd/impls/
secondordertvd/secondordertvdlimiter.c:3-82,
FlucaFDLimiterRegisterAll at secondordertvd.c:19-36). JAX-traceable
elementwise forms; all are exactly the reference's formulas.
"""

from __future__ import annotations

import jax.numpy as jnp

from fluca_tpu.utils.registry import Registry

limiter_registry = Registry("limiter")


def _superbee(r):
    return jnp.maximum(
        0.0, jnp.maximum(jnp.minimum(2.0 * r, 1.0), jnp.minimum(r, 2.0))
    )


def _minmod(r):
    return jnp.maximum(0.0, jnp.minimum(r, 1.0))


def _mc(r):
    return jnp.maximum(
        0.0, jnp.minimum(jnp.minimum(2.0 * r, (1.0 + r) / 2.0), 2.0)
    )


def _vanleer(r):
    a = jnp.abs(r)
    return (r + a) / (1.0 + a)


def _vanalbada(r):
    return jnp.where(r <= 0.0, 0.0, (r * r + r) / (r * r + 1.0))


def _barthjesperson(r):
    a = 4.0 * r / (1.0 + r)
    b = 4.0 / (1.0 + r)
    val = (1.0 + r) / 2.0 * jnp.minimum(1.0, jnp.minimum(a, b))
    return jnp.where(r <= 0.0, 0.0, val)


def _venkatakrishnan(r):
    a = 4.0 * r * (3.0 * r + 1.0) / (11.0 * r * r + 4.0 * r + 1.0)
    b = 4.0 * (r + 3.0) / (r * r + 4.0 * r + 11.0)
    val = (1.0 + r) / 2.0 * jnp.minimum(a, b)
    return jnp.where(r <= 0.0, 0.0, val)


def _upwind(r):
    return jnp.zeros_like(r)


def _sou(r):
    return r


def _quick(r):
    return (3.0 + r) / 4.0


def _koren(r):
    return jnp.maximum(
        0.0,
        jnp.minimum(jnp.minimum(2.0 * r, (1.0 + 2.0 * r) / 3.0), 2.0),
    )


for name, fn in [
    ("superbee", _superbee),
    ("minmod", _minmod),
    ("mc", _mc),
    ("vanleer", _vanleer),
    ("vanalbada", _vanalbada),
    ("barthjesperson", _barthjesperson),
    ("venkatakrishnan", _venkatakrishnan),
    ("upwind", _upwind),
    ("sou", _sou),
    ("quick", _quick),
    ("koren", _koren),
]:
    limiter_registry.register(name, fn)

"""Lid-driven cavity smoke + physics checks (reference:
fluca/tests/cavity_flow/cavity_flow_2d.c, Re=100)."""

import numpy as np
import pytest

from fluca_tpu.models.cavity import setup_cavity_2d


def test_cavity_steps_and_divergence_free():
    ns = setup_cavity_2d(N=32, Re=100.0, dt=0.05, max_steps=5)
    ns.solve()
    u, v = np.asarray(ns.state["v"][0]), np.asarray(ns.state["v"][1])
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))
    # flow magnitude bounded by lid speed (no blow-up)
    assert np.max(np.abs(u)) < 1.5 and np.max(np.abs(v)) < 1.5
    div = np.asarray(ns.impl.ops.apply_D(ns.state["U"]))
    assert np.max(np.abs(div)) < 1e-4


def test_cavity_flow_structure():
    """After some transient, the lid drags fluid rightward at the top
    and a return flow forms below (primary vortex)."""
    ns = setup_cavity_2d(N=32, Re=100.0, dt=0.1, max_steps=20)
    ns.solve()
    u = np.asarray(ns.state["v"][0])
    mid = u.shape[0] // 2
    # u along vertical centerline: positive near lid
    assert u[mid, -1] > 0.2
    # return (negative-u) flow somewhere below
    assert u[mid].min() < -0.02

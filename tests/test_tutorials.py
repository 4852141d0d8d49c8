"""Tutorial smoke tests (reference: fluca/tutorials/fd/ex1-4 with
their internal PetscCheck physics assertions; run-only ctest
registration, FlucaTestUtils.cmake:134-143)."""

import pytest

from fluca_tpu.tutorials.fd import (
    ex1_steady_convection_diffusion,
    ex2_unsteady_convection_tvd,
    ex3_convection_diffusion_2d,
    ex4_viscous_burgers,
)


def test_ex1_steady_convection_diffusion():
    ex1_steady_convection_diffusion()


@pytest.mark.parametrize("limiter", ["vanleer", "superbee", "minmod",
                                     "mc", "koren", "upwind"])
def test_ex2_tvd_limiters(limiter):
    ex2_unsteady_convection_tvd(limiter=limiter)


def test_ex3_convection_diffusion_2d():
    ex3_convection_diffusion_2d()


def test_ex4_viscous_burgers():
    ex4_viscous_burgers()

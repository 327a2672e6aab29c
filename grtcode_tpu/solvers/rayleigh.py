"""Rayleigh scattering optics (shortwave/src/rayleigh.c:29-144).

``tau = n * 1e-20 W^4 / (0.268675e5 (938.076 - 10.8426 W^2))`` with
W = w * 1e-4, omega = 1, g = 0; n is the layer air column density [cm-2].
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants
from ..optics import Optics
from ..utils.curtis_godson import number_densities


def rayleigh_tau(n, w):
    """(..., nlayers) column densities x (nw,) wavenumbers -> (..., nlayers, nw)."""
    ww = jnp.asarray(w) * 1e-4
    spectral = (1e-20 * ww ** 4) / (0.268675e5 * (9.38076e2 - 10.8426 * ww * ww))
    return jnp.asarray(n)[..., :, None] * spectral


def rayleigh_optics(level_pressure_mb, grid, dtype=jnp.float32) -> Optics:
    """Full optics object from level pressures [mb] (rayleigh_scattering,
    rayleigh.c:100-144): converts to atm, integrates layer densities, fills
    omega = 1, g = 0."""
    p_atm = jnp.asarray(level_pressure_mb, dtype) * constants.MB_TO_ATM
    n = number_densities(p_atm)
    tau = rayleigh_tau(n, grid.wavenumbers(dtype))
    return Optics(tau=tau, omega=jnp.ones_like(tau), g=jnp.zeros_like(tau),
                  grid=grid)

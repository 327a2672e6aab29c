"""Curtis-Godson layer averages as batched jnp ops.

Re-expression of utilities/src/curtis_godson.c:25-125 (the reference's three
per-layer CUDA/OpenMP kernels collapse to trivial vectorized array math; they
vmap over a leading column/batch axis for free).

All functions take level quantities shaped ``(..., nlevels)`` and return layer
quantities shaped ``(..., nlevels - 1)``.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants


def number_densities(p_atm):
    """Integrated column number density per layer [cm-2].

    ``n = c * |p[i] - p[i+1]|`` with c = 2.147822334314468e25 cm-2 atm-1
    (curtis_godson.c:25-37).  ``p_atm`` is level pressure in atm.
    """
    dp = jnp.abs(p_atm[..., :-1] - p_atm[..., 1:])
    return constants.COLUMN_DENSITY_C * dp


def layer_pressures_temperatures(p, t):
    """Layer midpoint pressure and temperature (curtis_godson.c:58-71)."""
    pavg = 0.5 * (p[..., :-1] + p[..., 1:])
    tavg = 0.5 * (t[..., :-1] + t[..., 1:])
    return pavg, tavg


def partial_pressures_and_densities(p, x, n):
    """Species layer partial pressure and column density
    (curtis_godson.c:92-106).

    ``ps = 1/3 (x_i p_i + x_{i+1} p_{i+1}) + 1/6 (x_i p_{i+1} + x_{i+1} p_i)``
    ``ns = n * (x_i + x_{i+1}) / 2``

    Args:
      p: level pressure [atm] (..., nlevels).
      x: species abundance (mole fraction) at levels (..., nlevels).
      n: layer air column density [cm-2] (..., nlayers).
    """
    p0 = p[..., :-1]
    p1 = p[..., 1:]
    x0 = x[..., :-1]
    x1 = x[..., 1:]
    third = 1.0 / 3.0
    sixth = 1.0 / 6.0
    ps = third * (x0 * p0 + x1 * p1) + sixth * (x0 * p1 + x1 * p0)
    ns = n * 0.5 * (x0 + x1)
    return ps, ns

"""Planck spectral radiance (longwave/src/longwave.c:68-118)."""
from __future__ import annotations

import jax.numpy as jnp

from .. import constants


def planck_law(t, w):
    """Spectral radiance [W cm m-2]: ``c1 w^3 / (exp(min(c2 w / T, 700)) - 1)``
    (longwave.c:68-94, incl. the MAX_EXP_ARG overflow clamp)."""
    e = jnp.minimum(constants.PLANCK_C2 * w / t, constants.MAX_EXP_ARG)
    return (constants.PLANCK_C1 * w * w * w) / (jnp.exp(e) - 1.0)


def effective_planck(t_center, t_edge, w, tau):
    """Layer-blended effective radiance per Clough et al. 1992 eq. 16
    (longwave.c:100-118):

    ``I = (B(Tc) + (a tau + b tau^2) B(Te)) / (1 + a tau + b tau^2)``
    with a = 0.193, b = 0.013.
    """
    a = constants.EFFECTIVE_PLANCK_A
    b = constants.EFFECTIVE_PLANCK_B
    s = a * tau + b * tau * tau
    return (planck_law(t_center, w) + s * planck_law(t_edge, w)) / (1.0 + s)

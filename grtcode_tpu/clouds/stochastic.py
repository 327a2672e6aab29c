"""Stochastic cloud subcolumn generation.

Re-expression of clouds/stochastic_clouds.c with counter-based
`jax.random` keys instead of the reference's non-reentrant, globally
seeded `rand()` (stochastic_clouds.c:16-21) — fixing both the thread-safety
hazard and run-to-run irreproducibility SURVEY.md flags, and enabling
vmapped subcolumn batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .beta import beta_value, beta_inverse


def overlap_parameter(altitude, scale_length):
    """Exponential-decorrelation overlap alpha_i = exp(-|z_i - z_{i+1}|/L)
    (eq. 2 of doi:10.1029/2004JD005100; stochastic_clouds.c:77-87).

    altitude: (..., nlayers) [km]; returns (..., nlayers-1).
    """
    z = jnp.asarray(altitude)
    return jnp.exp(-jnp.abs(z[..., :-1] - z[..., 1:])
                   / jnp.asarray(scale_length))


def cloudiness(key, overlap, num_layers: int):
    """Rank-correlated random cloudiness per layer (eq. 1 of
    doi:10.1256/qj.03.99; stochastic_clouds.c:11-30): layer i+1 copies
    layer i's rank with probability overlap[i].

    Returns (nlayers,) uniforms in [0, 1).  The sequential rank copy is a
    `lax.scan` over layers.
    """
    kx, kr = jax.random.split(key)
    x = jax.random.uniform(kx, (num_layers,))
    r = jax.random.uniform(kr, (num_layers - 1,))

    def step(prev, args):
        xi, ri, ov = args
        cur = jnp.where(ri <= ov, prev, xi)
        return cur, cur

    _, rest = jax.lax.scan(step, x[0], (x[1:], r, jnp.asarray(overlap)))
    return jnp.concatenate([x[:1], rest])


def sample_condensate(key, cloud_fraction, lwc, iwc, overlap,
                      p: int = 5, q: int = 5):
    """Draw liquid/ice condensate samples from the total-water beta PDF
    (appendix of doi:10.1175/MWR3257.1; stochastic_clouds.c:91-119).

    Args: per-layer (nlayers,) mean cloud fraction, liquid/ice water
    content, and (nlayers-1,) overlap parameters.

    Returns (ql, qi) each (nlayers,): the stochastic condensate sample
    (zero where the subcolumn is clear).
    """
    cf = jnp.asarray(cloud_fraction, jnp.float32)
    lw = jnp.asarray(lwc, jnp.float32)
    iw = jnp.asarray(iwc, jnp.float32)
    x = cloudiness(key, overlap, cf.shape[0])

    cloudy = x > (1.0 - cf)
    qs = beta_inverse(p, q, 1.0 - cf)
    # Width (b - a) of the PDF (eq. A2, alpha ignored as in the reference).
    denom = (p / float(p + q)) * (1.0 - beta_value(p + 1, q, qs)) - qs * cf
    total_water = lw + iw
    w = jnp.where(jnp.abs(denom) > 1e-12, total_water / denom, 0.0)
    total_condensate = w * (beta_inverse(p, q, x) - qs)
    liquid_fraction = jnp.where(total_water > 0.0,
                                lw / jnp.maximum(total_water, 1e-30), 0.0)
    ql = jnp.where(cloudy, total_condensate * liquid_fraction, 0.0)
    qi = jnp.where(cloudy, total_condensate * (1.0 - liquid_fraction), 0.0)
    return ql, qi

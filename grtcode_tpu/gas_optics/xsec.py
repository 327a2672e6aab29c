"""CFC/HFC cross-sections and collision-induced absorption.

Cross-section CSVs are host-interpolated onto the grid (cfcs.c:105-148,
collision_induced_absorption.c:55-100, both 2-column, linear, zero outside);
the optical-depth adds are elementwise device math (kernels.c:585-630).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..spectral import SpectralGrid
from ..utils.interp import interpolate_to_grid_np
from .continua import _read_csv
from .molecules import CfcId, CiaId, CFC_NAMES


@dataclasses.dataclass
class CrossSectionTable:
    """A species cross-section interpolated onto the spectral grid."""

    id: int
    name: str
    cross_section: jnp.ndarray  # (n_w,)

    @classmethod
    def from_file(cls, xsec_id, path: str, grid: SpectralGrid,
                  name: str | None = None, scale: float = 1.0):
        """``scale`` is folded into the stored f32 table in f64: CIA cross
        sections (~1e-44 cm^5) and the pressure-squared column factor
        (~1e47, constants.CIA_COLUMN_FACTOR) each sit outside the f32
        range — only their product is f32-representable."""
        data = _read_csv(path, 2)
        y = interpolate_to_grid_np(grid, data[:, 0], data[:, 1])
        if name is None:
            name = CFC_NAMES.get(CfcId(xsec_id), str(xsec_id))
        return cls(id=int(xsec_id), name=name,
                   cross_section=jnp.asarray(
                       np.asarray(y, np.float64) * scale, jnp.float32))


def cfc_optical_depth(xsec: CrossSectionTable, n, x_levels, xs=None):
    """tau += 0.5 * n * (x_i + x_{i+1}) * sigma(w) (kernels.c:585-601).

    Args: air column density n (nlayers,), level mole fraction x (nlevels,);
    ``xs`` optionally overrides the cross-section with a spectral-shard slice.
    """
    if xs is None:
        xs = xsec.cross_section
    n = jnp.asarray(n, jnp.float32)
    x = jnp.asarray(x_levels, jnp.float32)
    xavg = 0.5 * (x[:-1] + x[1:])
    return (n * xavg)[:, None] * xs[None, :]


def cia_optical_depth(xsec: CrossSectionTable, p_levels, tavg, x1_levels,
                      x2_levels, xs=None):
    """Collision-induced absorption (kernels.c:605-630):

    ``n2 = |c (p_i^2 - p_{i+1}^2)/T * 1/4 (x1_i + x1_{i+1})(x2_i + x2_{i+1})|``
    ``tau += n2 * sigma(w)``  with c the pressure-squared column factor
    [K atm-2 cm-5] built from air mass / gravity / k_B (kernels.c:611-615).

    Args: level pressure [atm] (nlevels,), layer temperature (nlayers,),
    level mole fractions of both species; ``xs`` optionally overrides the
    cross-section with a spectral-shard slice.

    The column factor c is pre-folded into the stored cross-section
    (CrossSectionTable.from_file scale=...): c ~ 7.9e46 overflows f32 and
    real CIA sigma ~ 1e-44 is f32-subnormal, but c*sigma ~ 1e3 is exact.
    """
    if xs is None:
        xs = xsec.cross_section
    p = jnp.asarray(p_levels, jnp.float32)
    t = jnp.asarray(tavg, jnp.float32)
    x1 = jnp.asarray(x1_levels, jnp.float32)
    x2 = jnp.asarray(x2_levels, jnp.float32)
    n2 = ((p[:-1] ** 2 - p[1:] ** 2) / t) * 0.25 * \
        (x1[:-1] + x1[1:]) * (x2[:-1] + x2[1:])
    n2 = jnp.abs(n2)
    return n2[:, None] * xs[None, :]

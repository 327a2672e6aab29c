"""Water-vapor (MT-CKD 2.5) and ozone continua.

Coefficient CSVs are host-interpolated onto the spectral grid once
(water_vapor_continuum.c:32-136, ozone_continuum.c:31-97); the per-layer
optical-depth adds are elementwise device math
(kernels.c:469-491 and :495-510).
"""
from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..spectral import SpectralGrid
from ..utils.interp import interpolate_to_grid_np


def _read_csv(path: str, expect_cols: int | None = None) -> np.ndarray:
    """Header-skipping CSV -> (nrows, ncols) float64 (parse_csv.c semantics)."""
    data = np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.float64)
    if data.ndim == 1:
        data = data[:, None]
    if expect_cols is not None and data.shape[1] != expect_cols:
        raise ValueError(
            f"{path}: expected {expect_cols} columns, found {data.shape[1]}")
    return data


@dataclasses.dataclass
class WaterVaporContinuum:
    """MT-CKD 2.5 coefficients on the spectral grid (f32 device arrays)."""

    cs: jnp.ndarray    # self coefficient at 296 K (296MTCKD25_S.csv)
    cf: jnp.ndarray    # foreign coefficient at 296 K (296MTCKD25_F.csv)
    t0s: jnp.ndarray   # self T dependence (CKDS.csv col 1)
    t0f: jnp.ndarray   # foreign T dependence (CKDF.csv col 1)

    @classmethod
    def from_directory(cls, directory: str, grid: SpectralGrid):
        def load(name, cols):
            data = _read_csv(os.path.join(directory, name), cols + 1)
            # Only the first value column is used (water_vapor_continuum.c:103).
            y = interpolate_to_grid_np(grid, data[:, 0], data[:, 1])
            return jnp.asarray(y, jnp.float32)

        return cls(
            cs=load("296MTCKD25_S.csv", 1),
            cf=load("296MTCKD25_F.csv", 1),
            t0s=load("CKDS.csv", 3),
            t0f=load("CKDF.csv", 3),
        )

    def optical_depth(self, ns, pavg, tavg, psavg, cs=None, cf=None,
                      t0s=None, t0f=None):
        """tau contribution (kernels.c:469-491):

        ``tau += N (296/T) [Cs Ps e^{T0s (296-T)} + Cf (P-Ps) e^{T0f (296-T)}]``

        Args: per-layer (nlayers,) arrays — H2O column density ns [cm-2],
        layer pressure pavg [atm], temperature tavg [K], H2O partial
        pressure psavg [atm].  cs/cf/t0s/t0f optionally override the grid
        tables with a spectral-shard slice.  Returns (nlayers, n_w).
        """
        cs = self.cs if cs is None else cs
        cf = self.cf if cf is None else cf
        t0s = self.t0s if t0s is None else t0s
        t0f = self.t0f if t0f is None else t0f
        tref = constants.TREF
        t = jnp.asarray(tavg, jnp.float32)[:, None]
        p = jnp.asarray(pavg, jnp.float32)[:, None]
        ps = jnp.asarray(psavg, jnp.float32)[:, None]
        n = jnp.asarray(ns, jnp.float32)[:, None]
        dt = tref - t
        return n * (tref / t) * (
            cs[None, :] * ps * jnp.exp(t0s[None, :] * dt)
            + cf[None, :] * (p - ps) * jnp.exp(t0f[None, :] * dt))


@dataclasses.dataclass
class OzoneContinuum:
    """Ozone continuum cross-sections on the spectral grid."""

    cross_section: jnp.ndarray  # (n_w,) [cm2]

    @classmethod
    def from_file(cls, path: str, grid: SpectralGrid):
        data = _read_csv(path, 2)
        y = interpolate_to_grid_np(grid, data[:, 0], data[:, 1])
        return cls(cross_section=jnp.asarray(y, jnp.float32))

    def optical_depth(self, ns):
        """tau += N_O3 * sigma(w) (kernels.c:495-510)."""
        return jnp.asarray(ns, jnp.float32)[:, None] * self.cross_section[None, :]

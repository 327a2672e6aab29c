"""Incident solar spectrum (shortwave/src/solar_flux.c:27-99).

Reads a 2-column CSV solar spectrum, interpolates onto the grid, and
normalizes so the trapezoid integral over the grid equals 1; per-column TSI
scaling happens in the solver.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..spectral import SpectralGrid
from ..utils.interp import interpolate_to_grid_np, trapezoid_integral


@dataclasses.dataclass
class SolarFlux:
    grid: SpectralGrid
    incident_flux: jnp.ndarray  # (n_w,) normalized

    @classmethod
    def from_csv(cls, path: str, grid: SpectralGrid):
        data = np.genfromtxt(path, delimiter=",", skip_header=1,
                             dtype=np.float64)
        return cls.from_samples(data[:, 0], data[:, 1], grid)

    @classmethod
    def from_samples(cls, x, y, grid: SpectralGrid):
        c = interpolate_to_grid_np(grid, x, y)
        w = grid.wavenumbers_np()
        total = trapezoid_integral(w, c)
        return cls(grid=grid,
                   incident_flux=jnp.asarray(c / total, jnp.float32))

"""Piecewise interpolation / integration helpers.

Vectorized re-expression of the reference routines interpolate2 / integrate2 /
linear_sample / constant_extrapolation / angstrom_exponent_sample
(utilities/src/utilities.c:35-381).  The reference semantics are preserved,
including their edge quirks:

  * points with ``newx <= x[0]`` are handled by the *extrapolation* rule
    (note: inclusive at x[0], utilities.c:173-177).  With constant
    extrapolation they get ``y[0]``; with no extrapolation they keep the fill
    value (the reference leaves the zero-initialized output untouched).
  * interior points use segment j with ``x[j] < newx <= x[j+1]``.
  * points with ``newx > x[-1]`` are extrapolated from the second-to-last
    sample: constant extrapolation yields ``y[n-2]`` (utilities.c:216-219 pass
    ``&x[n-2]`` and constant_extrapolation reads offset 0).

These run on host numpy (data ingest) or as jnp ops (device paths).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def interpolate_piecewise(x, y, newx, extrapolate: str = "none", fill=0.0):
    """Piecewise-linear interpolation matching reference interpolate2.

    Args:
      x: (n,) monotonically increasing sample positions.
      y: (n,) sample values.
      newx: (m,) query positions (monotonically increasing).
      extrapolate: "none" (keep fill outside) or "constant"
        (reference constant_extrapolation semantics incl. right-side y[n-2]).
      fill: value used outside the domain when extrapolate == "none".

    Works with numpy or jax arrays (dispatches on input type).
    """
    xp = jnp if isinstance(x, jnp.ndarray) or isinstance(newx, jnp.ndarray) else np
    x = xp.asarray(x)
    y = xp.asarray(y)
    newx = xp.asarray(newx)
    n = x.shape[0]
    idx = xp.searchsorted(x, newx, side="left")
    j = xp.clip(idx - 1, 0, n - 2)
    x0 = x[j]
    x1 = x[j + 1]
    y0 = y[j]
    y1 = y[j + 1]
    m = (y1 - y0) / (x1 - x0)
    interior = y0 + m * (newx - x0)
    left_mask = idx == 0  # newx <= x[0]
    right_mask = newx > x[-1]
    if extrapolate == "constant":
        left_val = y[0]
        right_val = y[n - 2]
    elif extrapolate == "none":
        left_val = fill
        right_val = fill
    else:
        raise ValueError(f"unknown extrapolate mode {extrapolate!r}")
    out = xp.where(left_mask, left_val, interior)
    out = xp.where(right_mask, right_val, out)
    return out


def interpolate_to_grid_np(grid, x, y, extrapolate: str = "none", fill=0.0):
    """Interpolate tabulated host data onto a SpectralGrid (numpy, float64).

    Mirrors interpolate_to_grid (spectral_grid.c:104-112).
    """
    w = grid.wavenumbers_np()
    return interpolate_piecewise(
        np.asarray(x, dtype=np.float64),
        np.asarray(y, dtype=np.float64),
        w,
        extrapolate=extrapolate,
        fill=fill,
    )


def trapezoid_integral(x, y, axis: int = -1):
    """Trapezoid-rule integral (utilities.c integrate2 + trapezoid)."""
    xp = jnp if isinstance(y, jnp.ndarray) else np
    x = xp.asarray(x)
    y = xp.asarray(y)
    dx = xp.diff(x)
    ymid = 0.5 * (
        xp.take(y, xp.arange(y.shape[axis] - 1), axis=axis)
        + xp.take(y, xp.arange(1, y.shape[axis]), axis=axis)
    )
    shape = [1] * ymid.ndim
    shape[axis] = dx.shape[0]
    return xp.sum(ymid * dx.reshape(shape), axis=axis)


def trapezoid_uniform(y, dw, axis: int = -1):
    """Trapezoid integral on a uniform grid with spacing dw.

    Matches the driver's integrated-flux accumulation
    (framework/src/driver.c:306-312).
    """
    xp = jnp if isinstance(y, jnp.ndarray) else np
    y = xp.asarray(y)
    n = y.shape[axis]
    ymid = 0.5 * (
        xp.take(y, xp.arange(n - 1), axis=axis) + xp.take(y, xp.arange(1, n), axis=axis)
    )
    return xp.sum(ymid, axis=axis) * dw


def angstrom_exponent_sample(x, y, newx):
    """Sample aerosol optical depth with an Angstrom exponent
    (utilities.c:45-74): ``newy = y[0] * (x[0]/newx)**alpha`` where
    ``alpha = log(y[1]/y[0]) / log(x[0]/x[1])``.
    """
    xp = jnp if isinstance(newx, jnp.ndarray) else np
    x = xp.asarray(x)
    y = xp.asarray(y)
    newx = xp.asarray(newx)
    alpha = xp.log(y[1] / y[0]) / xp.log(x[0] / x[1])
    return y[0] * (x[0] / newx) ** alpha


def block_trapezoid_weights(start, block, n_global, dw):
    """Per-spectral-block trapezoid weights: dw everywhere, dw/2 at the two
    global band edges, 0 beyond the grid (padding of the last shard), so a
    psum of per-block weighted sums equals the single-device trapezoid
    exactly (driver.c:306-312 semantics under spectral sharding)."""
    gidx = start + jnp.arange(block, dtype=jnp.int32)
    valid = gidx < n_global
    edge = (gidx == 0) | (gidx == n_global - 1)
    return jnp.where(valid, jnp.where(edge, 0.5, 1.0), 0.0) * jnp.float32(dw)

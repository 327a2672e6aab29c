"""Device-mesh construction for the (columns x spectral) decomposition."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

COLUMNS_AXIS = "columns"
SPECTRAL_AXIS = "spectral"


def make_mesh(n_columns: int | None = None, n_spectral: int = 1,
              devices=None) -> Mesh:
    """A 2-D mesh with axes ("columns", "spectral").

    Columns are the embarrassingly parallel batch axis (the reference's
    per-node `-x/-X` slices, GRTworkflow/run-rfmip-irf.sh:120-122); spectral
    shards split the wavenumber grid (the reference has no equivalent — its
    per-thread spectral parallelism stays inside one device here, and the
    mesh axis extends it across chips).

    Args:
      n_columns: size of the columns axis; defaults to
        ``len(devices) // n_spectral``.
      n_spectral: size of the spectral axis.
      devices: flat device list (defaults to ``jax.devices()``).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if n_columns is None:
        n_columns = max(len(devices) // n_spectral, 1)
    need = n_columns * n_spectral
    if need > len(devices):
        raise ValueError(
            f"mesh {n_columns}x{n_spectral} needs {need} devices, "
            f"have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_columns, n_spectral)
    return Mesh(grid, (COLUMNS_AXIS, SPECTRAL_AXIS))

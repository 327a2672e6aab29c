"""Total internal partition sums Q(molecule, T, isotopologue).

Replaces the reference's TIPS-2017 table blob (gas-optics/src/tips2017.h:29-37;
tips2017.c is a stripped large data blob in the reference checkout).  Two
implementations share one interface:

  * :class:`TabulatedTips` — temperature-interpolated tables in the spirit of
    TIPS-2017 (Gamache et al. 2017).  Tables load from an ``.npz`` file with
    arrays ``T`` (temperature grid) and ``Q_<molid>_<iso>`` columns; the
    public TIPS-2017 dataset can be converted with
    ``tools/convert_tips.py``.  Linear interpolation in T.
  * :class:`PowerLawTips` — analytic fallback when no tables are installed:
    ``Q(T) = Q(296) * (T/296)**beta`` with beta = 1 for linear molecules and
    1.5 for nonlinear ones (classical rigid-rotor limit).  Only the ratio
    Q(296)/Q(T) enters line strengths (kernels.c:83-85 combined with
    parse_HITRAN_file.c:372-384), so the unknown Q(296) normalization cancels
    and the fallback error is the vibrational-partition deviation (<~1-2% for
    tropospheric temperatures for the major gases).

Device use: :meth:`q_ratio_layers` returns (nlayers, niso) arrays of
``1/Q(T)`` factors (matching calc_partition_functions, kernels.c:52-66) for
the tabulated variant, or the ratio directly for the fallback.
"""
from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from .. import constants
from . import molecules as mol_registry

DEFAULT_TABLE_ENV = "GRTCODE_TPU_TIPS"


class PowerLawTips:
    """Classical rigid-rotor power-law fallback (no data files needed)."""

    def __init__(self, q296: Mapping[tuple, float] | None = None):
        # Optional absolute normalization Q(296) per (mol_id, iso); defaults
        # to 1.0 which is fine wherever only ratios matter.
        self._q296 = dict(q296 or {})

    def beta(self, mol_id: int) -> float:
        return 1.0 if mol_registry.get(mol_id).linear else 1.5

    def q(self, mol_id: int, t, iso: int = 1):
        q296 = self._q296.get((int(mol_id), int(iso)), 1.0)
        return q296 * (np.asarray(t) / constants.TREF) ** self.beta(mol_id)

    def q_ratio(self, mol_id: int, t, iso: int = 1):
        """Q(296)/Q(T) — the factor that enters line strengths."""
        return (constants.TREF / np.asarray(t)) ** self.beta(mol_id)


class TabulatedTips:
    """Temperature-interpolated TIPS tables loaded from an npz file."""

    def __init__(self, path: str):
        data = np.load(path)
        self._tgrid = np.asarray(data["T"], dtype=np.float64)
        self._tables = {}
        for key in data.files:
            if key.startswith("Q_"):
                _, mid, iso = key.split("_")
                self._tables[(int(mid), int(iso))] = np.asarray(
                    data[key], dtype=np.float64
                )
        if not self._tables:
            raise ValueError(f"no Q_<mol>_<iso> tables found in {path}")

    def has(self, mol_id: int, iso: int = 1) -> bool:
        return (int(mol_id), int(iso)) in self._tables

    def q(self, mol_id: int, t, iso: int = 1):
        table = self._tables[(int(mol_id), int(iso))]
        return np.interp(np.asarray(t, dtype=np.float64), self._tgrid, table)

    def q_ratio(self, mol_id: int, t, iso: int = 1):
        return self.q(mol_id, constants.TREF, iso) / self.q(mol_id, t, iso)


def default_tips():
    """TabulatedTips if $GRTCODE_TPU_TIPS points at a table file, else the
    power-law fallback."""
    path = os.environ.get(DEFAULT_TABLE_ENV)
    if path and os.path.exists(path):
        return TabulatedTips(path)
    return PowerLawTips()


def q_inverse_layers(tips, mol_id: int, tavg, num_iso: int):
    """(nlayers, num_iso) array of 1/Q(mol, T_layer, iso) — the quantity the
    reference's calc_partition_functions produces (kernels.c:52-66).

    jit-traceable: ``tavg`` may be a traced jnp array.  For
    :class:`PowerLawTips` the absolute Q is normalized to Q(296)=1, which
    combined with the parse-time strength renormalization yields exactly the
    power-law Q-ratio in the final line strength.  For :class:`TabulatedTips`
    the per-isotopologue tables are gathered with a device interp; missing
    isotopologues fall back to the principal one.
    """
    import jax.numpy as jnp

    tavg = jnp.asarray(tavg)
    nlayers = tavg.shape[0]
    if isinstance(tips, PowerLawTips):
        qi = (constants.TREF / tavg) ** tips.beta(mol_id)
        return jnp.broadcast_to(qi[:, None], (nlayers, num_iso))
    # Tabulated: stack (num_iso, nT) device table once per call.
    tables = []
    for iso in range(1, num_iso + 1):
        key = iso if tips.has(mol_id, iso) else 1
        tables.append(tips._tables[(int(mol_id), key)])
    table = jnp.asarray(np.stack(tables), tavg.dtype)      # (num_iso, nT)
    tgrid = jnp.asarray(tips._tgrid, tavg.dtype)
    import jax
    qt = jax.vmap(lambda tab: jnp.interp(tavg, tgrid, tab))(table)  # (iso, L)
    return (1.0 / qt).T

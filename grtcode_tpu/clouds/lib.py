"""Cloud optics facade: subcolumn sampling -> Pade bands -> solver grid.

Re-design of clouds/clouds_lib.c:80-150.  Deviations from the reference,
both deliberate:
  * one condensate sample per subcolumn shared by ALL bands (the reference
    re-samples inside its band loop, clouds_lib.c:103-106, giving each
    band an inconsistent cloud state);
  * `jax.random` keys instead of global `rand()`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..optics import Optics
from ..spectral import SpectralGrid
from .pade import PadeCloudOptics
from .stochastic import overlap_parameter, sample_condensate

# Chou-Suarez-like step lookup (clouds_lib.c:43-78), ascending thresholds.
_TFREEZE = 273.16
_ICE_T_THRESH = jnp.asarray(
    [_TFREEZE - 55.0, _TFREEZE - 50.0, _TFREEZE - 45.0, _TFREEZE - 40.0,
     _TFREEZE - 35.0, _TFREEZE - 30.0, _TFREEZE - 25.0], jnp.float32)
_ICE_SIZES = jnp.asarray(
    [20.2, 21.6, 39.9, 42.5, 63.9, 93.5, 80.8, 100.6], jnp.float32)

# Overlap altitude proxy (driver.c:171-181).
_PA_PER_MB = 100.0
_PRESSURE_SCALE_HEIGHT_KM = 7.3
_OVERLAP_SCALE_LENGTH_KM = 2.0


def ice_particle_size(temperature):
    """Ice particle *size* [microns] from layer temperature
    (clouds_lib.c:43-78); the effective radius is half of this."""
    t = jnp.asarray(temperature, jnp.float32)
    idx = jnp.searchsorted(_ICE_T_THRESH, t, side="right")
    return _ICE_SIZES[idx]


def band_to_grid(band_values, band_lims, w):
    """Map per-band values onto fine grid points (map_band_wave,
    optics_utils.c:100-169): points inside [lower_b, upper_b] take band
    b's value; points in no band get 0.

    band_values: (..., nbnd); band_lims: (2, nbnd); w: (nw,).
    Returns (..., nw).
    """
    idx = jnp.clip(
        jnp.searchsorted(band_lims[0], w, side="right") - 1,
        0, band_lims.shape[1] - 1)
    valid = (w >= band_lims[0][idx]) & (w <= band_lims[1][idx])
    vals = jnp.take(band_values, idx, axis=-1)
    return jnp.where(valid, vals, 0.0)


def overlap_from_pressure(layer_pressure_mb):
    """Overlap parameters from the driver's log-pressure altitude proxy
    (driver.c:171-181): z = 7.3 km * ln(100 * p_mb), L = 2 km."""
    z = _PRESSURE_SCALE_HEIGHT_KM * jnp.log(
        _PA_PER_MB * jnp.asarray(layer_pressure_mb, jnp.float32))
    return overlap_parameter(z, _OVERLAP_SCALE_LENGTH_KM)


@dataclasses.dataclass
class CloudOpticsLib:
    """Liquid + ice band-optics tables bound to the solver workflow
    (initialize_clouds_lib / cloud_optics, clouds_lib.c:18-150).

    ``liquid`` accepts any object with the ``evaluate(wc, radius) ->
    (ext, ssa, g)`` + ``band_lims`` contract: PadeCloudOptics or the
    legacy HuStamnesLiquidOptics (liquid_cloud_optics.c)."""

    liquid: PadeCloudOptics
    ice: PadeCloudOptics
    liquid_radius: float = 10.0   # [microns] (driver.c:512 passes 10.0)

    def column_optics(self, key, cloud_fraction, lwc, iwc, t_lay,
                      layer_pressure_mb, layer_thickness,
                      grids: tuple[SpectralGrid, ...]):
        """One subcolumn's liquid/ice optics on each requested grid.

        Per-layer args (nlayers,); returns a list of (liquid_optics,
        ice_optics) tuples, one per grid, with tau = extinction *
        thickness (column_calculation, driver.c:519-530).  Thin wrapper
        over :meth:`column_optics_w` on each grid's wavenumber array,
        tagging each returned Optics with its grid.
        """
        out = self.column_optics_w(
            key, cloud_fraction, lwc, iwc, t_lay, layer_pressure_mb,
            layer_thickness, [grid.wavenumbers() for grid in grids])
        for grid, (liq, ice) in zip(grids, out):
            liq.grid = grid
            ice.grid = grid
        return out

    def column_optics_w(self, key, cloud_fraction, lwc, iwc, t_lay,
                        layer_pressure_mb, layer_thickness, ws):
        """Like :meth:`column_optics` but on explicit wavenumber arrays —
        the sharded driver passes each spectral shard's block of w, and the
        condensate sample depends only on the key/cloud state, so every
        shard sees one consistent cloud realization."""
        overlap = overlap_from_pressure(layer_pressure_mb)
        ql, qi = sample_condensate(key, cloud_fraction, lwc, iwc, overlap)
        rice = ice_particle_size(t_lay) / 2.0
        rliq = jnp.full_like(rice, self.liquid_radius)

        le, ls, lg = self.liquid.evaluate(ql, rliq)      # (nlayers, nbnd)
        ie, is_, ig = self.ice.evaluate(qi, rice)

        out = []
        thick = jnp.asarray(layer_thickness, jnp.float32)[:, None]
        for w in ws:
            liq = Optics(
                tau=band_to_grid(le, self.liquid.band_lims, w) * thick,
                omega=band_to_grid(ls, self.liquid.band_lims, w),
                g=band_to_grid(lg, self.liquid.band_lims, w))
            ice = Optics(
                tau=band_to_grid(ie, self.ice.band_lims, w) * thick,
                omega=band_to_grid(is_, self.ice.band_lims, w),
                g=band_to_grid(ig, self.ice.band_lims, w))
            out.append((liq, ice))
        return out

    def driver_callback(self):
        """Adapter for RadiationDriver.cloud_optics: batched over columns.

        Signature: (cloud_args, key, w_lw, w_sw) -> (liq_lw, ice_lw,
        liq_sw, ice_sw) with batched (B, nlayers, nw) fields (sw entries
        are None when w_sw is None).  w_lw/w_sw may be full grids or one
        spectral shard's block — the subcolumn sample is w-independent.
        """
        def callback(cloud_args, key, w_lw, w_sw):
            B = cloud_args["cloud_fraction"].shape[0]
            # Per-GLOBAL-column keys: fold_in of the column id keeps the
            # realization identical under any column sharding (split(B)
            # would restart the sequence inside each shard).
            col_index = cloud_args.get(
                "col_index", jnp.arange(B, dtype=jnp.int32))
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(col_index)
            ws = (w_lw,) if w_sw is None else (w_lw, w_sw)

            def one(k, cf, lw, iw, t, p, dz):
                return self.column_optics_w(k, cf, lw, iw, t, p, dz, ws)

            res = jax.vmap(one)(keys, cloud_args["cloud_fraction"],
                                cloud_args["liquid_water_content"],
                                cloud_args["ice_water_content"],
                                cloud_args["t_lay"],
                                cloud_args["layer_pressure"],
                                cloud_args["layer_thickness"])
            liq_lw, ice_lw = res[0]
            if w_sw is None:
                return liq_lw, ice_lw, None, None
            liq_sw, ice_sw = res[1]
            return liq_lw, ice_lw, liq_sw, ice_sw

        return callback

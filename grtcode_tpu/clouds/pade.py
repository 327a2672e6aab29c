"""Pade-approximant cloud optics (RRTMGP-style coefficient tables).

Re-design of clouds/cloud_pade_optics.c: the per-(band, layer) scalar loop
with a linear size-regime search becomes one vectorized evaluation over
(layer, band) with a `searchsorted` regime lookup and unrolled Horner
polynomials; coefficients live in dense (nbnd, nsizereg, ncoef) arrays.

Coefficient data loads from RRTMGP-style netCDF files (via h5py; the
variables/dims mirror construct_cloud_optics, cloud_pade_optics.c:22-136)
or from arrays directly (tests / regenerated tables).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PadeCloudOptics:
    """One condensed-phase Pade table bound as device arrays."""

    band_lims: jnp.ndarray       # (2, nbnd) [cm-1] lower/upper
    sizereg_bounds: jnp.ndarray  # (2, nsizereg) effective-radius bounds
    sizereg_ref: jnp.ndarray     # (nsizereg,) reference radius per regime
    ext_p: jnp.ndarray           # (nbnd, nsizereg, n)
    ext_q: jnp.ndarray           # (nbnd, nsizereg, m)
    ssa_p: jnp.ndarray
    ssa_q: jnp.ndarray
    asy_p: jnp.ndarray
    asy_q: jnp.ndarray

    @property
    def nbnd(self) -> int:
        return int(self.band_lims.shape[1])

    @classmethod
    def from_arrays(cls, band_lims, sizereg_bounds, sizereg_ref, ext_p,
                    ext_q, ssa_p, ssa_q, asy_p, asy_q):
        f = lambda a: jnp.asarray(np.asarray(a), jnp.float32)  # noqa: E731
        return cls(f(band_lims), f(sizereg_bounds), f(sizereg_ref),
                   f(ext_p), f(ext_q), f(ssa_p), f(ssa_q), f(asy_p),
                   f(asy_q))

    @classmethod
    def from_netcdf(cls, path: str):
        """Read an RRTMGP-style Pade file (HDF5-backed netCDF4 via h5py;
        variable names per cloud_pade_optics.c:38-126)."""
        import h5py
        with h5py.File(path, "r") as f:
            def v(name):
                return np.asarray(f[name])
            band_lims = np.stack([v("Band_limits_lwr"),
                                  v("Band_limits_upr")])
            sizereg = np.stack([v("Effective_Radius_limits_lwr"),
                                v("Effective_Radius_limits_upr")])
            ref = v("Effective_Radius_Ref")
            # File layout is (coef, sizereg, band) -> ours (band, reg, coef).
            def coeffs(name):
                return np.transpose(v(name), (2, 1, 0))
            return cls.from_arrays(band_lims, sizereg, ref,
                                   coeffs("Pade_ext_p"), coeffs("Pade_ext_q"),
                                   coeffs("Pade_ssa_p"), coeffs("Pade_ssa_q"),
                                   coeffs("Pade_asy_p"), coeffs("Pade_asy_q"))

    # -- evaluation --------------------------------------------------------
    def evaluate(self, content, radius):
        """Band optical properties for condensate amounts.

        Args:
          content: (...,) condensed water content (zero -> zero optics).
          radius: (...,) effective radius [microns].

        Returns (extinction, ssa, g), each (..., nbnd): extinction is per
        content unit x content (compute_all_from_pade,
        cloud_pade_optics.c:158-198); radii outside every size regime give
        zeros.
        """
        c = jnp.asarray(content, jnp.float32)[..., None]     # (..., 1)
        r = jnp.asarray(radius, jnp.float32)[..., None]

        lo = self.sizereg_bounds[0]
        hi = self.sizereg_bounds[1]
        in_reg = (lo <= r) & (r <= hi)                       # (..., nreg)
        irad = jnp.argmax(in_reg, axis=-1)                   # first match
        valid = in_reg.any(axis=-1) & (c[..., 0] > 0.0)

        re_off = r[..., 0] - self.sizereg_ref[irad]          # (...,)

        def pade(pc, qc):
            pcoef = pc[:, irad, :]                 # (nbnd, ..., n)
            qcoef = qc[:, irad, :]
            pcoef = jnp.moveaxis(pcoef, 0, -2)     # (..., nbnd, n)
            qcoef = jnp.moveaxis(qcoef, 0, -2)
            x = re_off[..., None]                  # (..., 1) over bands

            def horner(co):
                acc = co[..., 0]
                for i in range(1, co.shape[-1]):
                    acc = co[..., i] + x * acc
                return acc

            return horner(pcoef) / horner(qcoef)   # (..., nbnd)

        ext = pade(self.ext_p, self.ext_q) * c
        ssa = pade(self.ssa_p, self.ssa_q)
        asy = pade(self.asy_p, self.asy_q)
        mask = valid[..., None]
        zero = jnp.zeros_like(ext)
        return (jnp.where(mask, ext, zero), jnp.where(mask, ssa, zero),
                jnp.where(mask, asy, zero))


def synthetic_pade_table(nbnd: int = 16, w0: float = 1.0,
                         wn: float = 3250.0, seed: int = 0
                         ) -> PadeCloudOptics:
    """A physically plausible synthetic table for tests and data-free runs:
    smooth positive extinction (~0.05-0.3 m2 g-1 scale), ssa in (0, 1),
    g in (0, 0.95), two size regimes."""
    rng = np.random.default_rng(seed)
    edges = np.linspace(w0, wn, nbnd + 1)
    band_lims = np.stack([edges[:-1], edges[1:]])
    sizereg = np.array([[2.0, 20.0], [20.0, 90.0]])
    ref = np.array([10.0, 40.0])
    n, m = 3, 3

    def coeffs(scale, base, jitter):
        p = rng.uniform(0.5, 1.5, (nbnd, 2, n)) * scale
        p[..., -1] = base * rng.uniform(1.0 - jitter, 1.0 + jitter, (nbnd, 2))
        q = np.concatenate(
            [rng.uniform(-0.002, 0.002, (nbnd, 2, m - 1)),
             np.ones((nbnd, 2, 1))], axis=-1)
        return p, q

    # Water-cloud-like magnitudes: strong scattering (ssa ~0.98) with
    # forward-peaked phase (g ~0.85); extinction ~0.15 m2 g-1.
    ep, eq = coeffs(1e-4, 0.15, 0.2)
    sp, sq = coeffs(1e-6, 0.98, 0.01)
    ap, aq = coeffs(1e-6, 0.85, 0.05)
    return PadeCloudOptics.from_arrays(band_lims, sizereg, ref, ep, eq,
                                       sp, sq, ap, aq)

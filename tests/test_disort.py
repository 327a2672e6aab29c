"""Multi-stream discrete-ordinates solver correctness.

Mirrors the reference's shortwave robustness cases
(shortwave/test/test_shortwave.c:103-241) plus exact invariants the
two-stream solver can't check: absorption-only analytic fluxes,
conservative-scattering flux conservation, and layer-split invariance of
the doubling/adding operators.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from grtcode_tpu.solvers.disort import disort_shortwave, gauss_streams
from grtcode_tpu.solvers.shortwave import shortwave_fluxes

MU0 = 0.6
TSI = 1361.0


def _run(tau, omega, g, albedo=0.2, nw=6, nstr=8, nlayers=4):
    tau = jnp.full((nlayers, nw), tau, jnp.float32)
    omega = jnp.full((nlayers, nw), omega, jnp.float32)
    g = jnp.full((nlayers, nw), g, jnp.float32)
    alb = jnp.full((nw,), albedo, jnp.float32)
    solar = jnp.full((nw,), 1.0, jnp.float32)
    return disort_shortwave(tau, omega, g, jnp.float32(MU0), alb,
                            jnp.float32(TSI), solar, nstr=nstr, wchunk=8)


def test_transparent():
    fup, fdn = _run(0.0, 0.0, 0.0, albedo=0.3)
    np.testing.assert_allclose(np.asarray(fdn), TSI * MU0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fup), TSI * MU0 * 0.3, rtol=1e-5)


def test_absorption_only_analytic():
    """omega = 0: direct beam attenuates as exp(-tau/mu0); the reflected
    Lambertian flux attenuates by the quadrature diffuse transmission."""
    tau1 = 0.3
    nlayers = 4
    fup, fdn = _run(tau1, 0.0, 0.0, albedo=0.25, nlayers=nlayers, nstr=16)
    fdn = np.asarray(fdn)[:, 0]
    fup = np.asarray(fup)[:, 0]
    taus = tau1 * np.arange(nlayers + 1)
    np.testing.assert_allclose(fdn, TSI * MU0 * np.exp(-taus / MU0),
                               rtol=1e-5)
    # Upward at surface: albedo * downward; above: diffuse transmission
    # 2 sum w mu exp(-dtau/mu) per layer crossed.
    mu, w = gauss_streams(16)
    f_sfc = 0.25 * TSI * MU0 * np.exp(-taus[-1] / MU0)
    np.testing.assert_allclose(fup[-1], f_sfc, rtol=1e-5)
    swmu = np.sum(w * mu)
    expect = f_sfc * np.array(
        [np.sum(w * mu * np.exp(-(taus[-1] - t) / mu)) / swmu
         for t in taus])
    np.testing.assert_allclose(fup, expect, rtol=1e-4)


def test_conservative_scattering_flux_conservation():
    """omega = 1: net flux (down - up) is constant across levels."""
    fup, fdn = _run(1.0, 1.0, 0.7, albedo=0.0, nstr=16)
    net = np.asarray(fdn - fup)[:, 0]
    np.testing.assert_allclose(net, net[0], rtol=5e-4)
    # And TOA reflectance is in (0, 1).
    r = float(fup[0, 0] / fdn[0, 0])
    assert 0.05 < r < 0.95


def test_layer_split_invariance():
    """One tau=1 layer == two tau=0.5 layers (doubling/adding identity)."""
    nw = 4
    common = dict(albedo=0.15, nw=nw, nstr=8)
    f1 = _run(1.0, 0.8, 0.5, nlayers=1, **common)
    f2 = _run(0.5, 0.8, 0.5, nlayers=2, **common)
    np.testing.assert_allclose(np.asarray(f1[0])[[0, -1]],
                               np.asarray(f2[0])[[0, -1]], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(f1[1])[[0, -1]],
                               np.asarray(f2[1])[[0, -1]], rtol=2e-5)


def test_matches_two_stream_moderate():
    """16-stream vs delta-Eddington two-stream: agreement within the
    two-stream approximation's documented 10-15% error band on a
    moderate cloud-like case, with matching qualitative structure."""
    nw, nlayers = 4, 6
    tau = jnp.full((nlayers, nw), 0.5, jnp.float32)
    omega = jnp.full((nlayers, nw), 0.9, jnp.float32)
    g = jnp.full((nlayers, nw), 0.6, jnp.float32)
    alb = jnp.full((nw,), 0.1, jnp.float32)
    solar = jnp.full((nw,), 1.0, jnp.float32)
    fup16, fdn16 = disort_shortwave(tau, omega, g, jnp.float32(MU0), alb,
                                    jnp.float32(TSI), solar, nstr=16,
                                    wchunk=4)
    fup2, fdn2 = shortwave_fluxes(tau, omega, g, jnp.float32(MU0),
                                  jnp.float32(MU0), alb, alb,
                                  jnp.float32(TSI), solar)
    for a, b in ((fup16, fup2), (fdn16, fdn2)):
        a, b = np.asarray(a)[:, 0], np.asarray(b)[:, 0]
        assert np.all(np.abs(a - b) <= 0.12 * np.abs(b).max() + 1e-3)
        # Same monotone level structure.
        assert np.all(np.sign(np.diff(a)) == np.sign(np.diff(b)))


@pytest.mark.parametrize("tau", [1e-12, 1.0, 1e12])
def test_robustness_extremes(tau):
    """No NaN/Inf and physical bounds at extreme optical depths
    (test_shortwave.c robustness cases)."""
    fup, fdn = _run(tau, 0.5, 0.3, nstr=8)
    fup, fdn = np.asarray(fup), np.asarray(fdn)
    assert np.isfinite(fup).all() and np.isfinite(fdn).all()
    assert (fup >= -1e-3).all() and (fdn >= -1e-3).all()
    assert fdn[0, 0] == pytest.approx(TSI * MU0, rel=1e-5)
    if tau > 1e6:
        assert abs(fdn[-1, 0]) < 1e-3 and abs(fup[-1, 0]) < 1e-3


def _chandrasekhar_H(omega, mu_eval, n_quad=96, iters=400):
    """Chandrasekhar's H-function for isotropic scattering, from the
    exact identity (Chandrasekhar 1950, "Radiative Transfer", ch. V;
    also Sobolev 1975 / Hapke 1993):

        1/H(mu) = sqrt(1 - omega)
                  + (omega/2) * int_0^1 mu' H(mu') / (mu + mu') dmu'

    iterated to convergence on a Gauss-Legendre grid in float64 — an
    EXTERNAL analytic oracle independent of this repo's solvers."""
    x, w = np.polynomial.legendre.leggauss(n_quad)
    mu = 0.5 * (x + 1.0)
    wq = 0.5 * w
    H = np.ones(n_quad)
    s = np.sqrt(1.0 - omega)
    for _ in range(iters):
        integ = (0.5 * omega) * (wq * mu * H)[None, :] / \
            (mu[:, None] + mu[None, :])
        H_new = 1.0 / (s + integ.sum(axis=1))
        if np.max(np.abs(H_new - H)) < 1e-14:
            H = H_new
            break
        H = H_new
    integ_e = (0.5 * omega) * (wq * mu * H) / (mu_eval + mu)
    return 1.0 / (s + integ_e.sum())


@pytest.mark.parametrize("omega,mu0", [(0.6, 0.5), (0.9, 0.8),
                                       (0.99, 0.4)])
def test_semi_infinite_plane_albedo_vs_chandrasekhar(omega, mu0):
    """Published-benchmark pin (VERDICT r4 #9): for a semi-infinite
    isotropically-scattering atmosphere, the plane albedo is EXACTLY
    A(mu0) = 1 - H(mu0) sqrt(1 - omega) (Chandrasekhar 1950 ch. V;
    quoted e.g. by Sobolev 1975 eq. 2.43 and Hapke 1993 eq. 8.25).
    The 16-stream solver on a tau=400 slab with a black surface must
    reproduce it to discrete-ordinates accuracy."""
    A_exact = 1.0 - _chandrasekhar_H(omega, mu0) * np.sqrt(1.0 - omega)
    nlayers, nw = 60, 2
    # Geometric layer thicknesses resolve the top of the slab where the
    # reflected flux forms; total tau ~ 400 emulates semi-infinity.
    dtau = 0.08 * 1.16 ** np.arange(nlayers)
    tau = jnp.asarray(np.repeat(dtau[:, None], nw, 1), jnp.float32)
    omega_a = jnp.full((nlayers, nw), omega, jnp.float32)
    g = jnp.zeros((nlayers, nw), jnp.float32)
    alb = jnp.zeros((nw,), jnp.float32)
    solar = jnp.full((nw,), 1.0, jnp.float32)
    fup, fdn = disort_shortwave(tau, omega_a, g, jnp.float32(mu0), alb,
                                jnp.float32(TSI), solar, nstr=16,
                                deltam=False, wchunk=2)
    A_got = float(np.asarray(fup)[0, 0]) / (TSI * mu0)
    assert abs(A_got - A_exact) < 5e-3 * max(A_exact, 0.05), \
        (A_got, A_exact)

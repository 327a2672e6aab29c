"""Pallas bin kernel == jnp accumulate_bins ground truth.

Runs the fused bin kernel (bins_pallas) in interpreter mode on CPU
against the jnp bin-method accumulation (itself goldened vs the compiled
reference C in test_bins.py), including spectral blocks and the
correction path for molecules whose remote lines fall inside Humlicek
regions 1-4 (kernels.c:177-406 semantics).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from grtcode_tpu import constants
from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics import bins as bins_mod
from grtcode_tpu.gas_optics import bins_pallas as bp
from grtcode_tpu.gas_optics import lines as lines_mod
from grtcode_tpu.gas_optics.gas_optics import GasOptics
from grtcode_tpu.gas_optics.hitran import synthetic_catalog
from grtcode_tpu.utils import curtis_godson as cg

CH = 16


def _setup(w0=100.0, wn=180.0, n_lines=120, seed=5):
    grid = SpectralGrid(w0, wn, 0.1)
    rng = np.random.default_rng(seed)
    vnn = np.sort(rng.uniform(w0 - 10.0, wn + 10.0, n_lines))
    cat = synthetic_catalog(
        1, vnn, rng.uniform(1e-22, 1e-19, n_lines),
        yair=rng.uniform(0.02, 0.1, n_lines),
        yself=rng.uniform(0.05, 0.4, n_lines),
        en=rng.uniform(0.0, 2000.0, n_lines),
        n=rng.uniform(0.4, 0.8, n_lines),
        d=rng.uniform(-0.02, 0.02, n_lines))
    bound = lines_mod.bind_to_grid(cat, grid)
    padded = bound.pad_to(-(-bound.num_lines // 64) * 64)

    nlev, B = 7, 3
    p = np.linspace(0.01, 1013.0, nlev)[None, :] * np.ones((B, 1))
    t = np.linspace(215.0, 288.0, nlev)[None, :] + \
        rng.uniform(-3, 3, (B, nlev))
    x = rng.uniform(1e-5, 1e-2, (B, nlev))
    p_atm = jnp.asarray(p, jnp.float32) * constants.MB_TO_ATM
    t = jnp.asarray(t, jnp.float32)
    n_air = cg.number_densities(p_atm)
    pavg, tavg = cg.layer_pressures_temperatures(p_atm, t)
    psavg, ns = cg.partial_pressures_and_densities(
        p_atm, jnp.asarray(x, jnp.float32), n_air)
    rows = B * (nlev - 1)
    prep = lines_mod.prepare(padded, grid, pavg.reshape(rows),
                             tavg.reshape(rows), psavg.reshape(rows))
    return grid, bound, padded, prep, ns.reshape(rows)


def _jnp_bins(grid, bound, padded, prep, ns, mode):
    bins = bins_mod.create_spectral_bins(grid.n, grid.w0, grid.dw, 1.0)
    br = bins_mod.build_bin_ranges(bound, bins, mode=mode)
    bin_w_rel = ((bins.w - grid.w0) / grid.dw).astype(np.float32)
    tau, bins_tau = bins_mod.accumulate_bins(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns,
        jnp.asarray(br.local_lo), jnp.asarray(br.local_cnt),
        jnp.asarray(br.rem_lo), jnp.asarray(br.rem_cnt_l),
        jnp.asarray(br.rem_hi_start), jnp.asarray(br.rem_cnt_r),
        jnp.asarray(bins.l, jnp.int32), bin_w_rel,
        ppb=bins.ppb, nbins=bins.n, lmax_local=br.lmax_local,
        lmax_remote=br.lmax_remote, dw=float(grid.dw),
        num_wpoints=grid.n)
    return bins, br, tau, bins_tau


@pytest.mark.parametrize("mode", ["bin_sweep", "line_sweep"])
def test_bin_kernel_matches_jnp(mode):
    grid, bound, padded, prep, ns = _setup()
    bins, br, tau_j, bins_tau_j = _jnp_bins(grid, bound, padded, prep, ns,
                                            mode)
    gap = (1.0 if mode == "bin_sweep" else 1.5) / grid.dw
    tables = bp.build_bin_kernel_tables(
        br, bins, padded, ch=CH, G=8,
        region0_hw=lines_mod.region0_halfwidth(padded, grid.dw),
        min_gap_points=gap)
    assert tables.coarse_region0  # heavy molecule at low wavenumber
    fine, coarse = bp.accumulate_bins_pallas(
        prep, padded.c0, ns, tables, ppb=bins.ppb, dw=float(grid.dw),
        nbins_block=bins.n, ch=CH, interpret=True)
    scale = np.abs(np.asarray(tau_j)).max()
    np.testing.assert_allclose(np.asarray(fine[:, :grid.n]),
                               np.asarray(tau_j), rtol=2e-5,
                               atol=2e-6 * scale)
    cscale = np.abs(np.asarray(bins_tau_j)).max()
    np.testing.assert_allclose(np.asarray(coarse), np.asarray(bins_tau_j),
                               rtol=2e-5, atol=2e-6 * cscale)


def test_bin_kernel_blocks_match_full():
    """Quantum-aligned spectral blocks reproduce the full-band result,
    including a tail block past the grid end."""
    grid, bound, padded, prep, ns = _setup()
    bins, br, _, _ = _jnp_bins(grid, bound, padded, prep, ns, "bin_sweep")
    tables = bp.build_bin_kernel_tables(
        br, bins, padded, ch=CH, G=8,
        region0_hw=lines_mod.region0_halfwidth(padded, grid.dw),
        min_gap_points=1.0 / grid.dw)
    fine_f, coarse_f = bp.accumulate_bins_pallas(
        prep, padded.c0, ns, tables, ppb=bins.ppb, dw=float(grid.dw),
        nbins_block=bins.n, ch=CH, interpret=True)
    nb_blk = 32
    for b0 in (0, 32, 64):
        fine_b, coarse_b = bp.accumulate_bins_pallas(
            prep, padded.c0, ns, tables, ppb=bins.ppb, dw=float(grid.dw),
            start_bin=b0, nbins_block=nb_blk, ch=CH, interpret=True)
        keep = min(nb_blk, bins.n - b0)
        np.testing.assert_array_equal(
            np.asarray(coarse_b)[:, :keep],
            np.asarray(coarse_f)[:, b0:b0 + keep])
        np.testing.assert_array_equal(
            np.asarray(fine_b)[:, :keep * bins.ppb],
            np.asarray(fine_f)[:, b0 * bins.ppb:(b0 + keep) * bins.ppb])


@pytest.mark.parametrize("method", ["wavenumber_sweep", "line_sweep"])
def test_gas_optics_bin_pallas_matches_jnp(method):
    """Full optical_depth: interpret-mode Pallas bin path == jnp path."""
    grid, bound, padded, prep, ns = _setup()
    rng = np.random.default_rng(7)
    nlev = 7
    p_mb = np.linspace(0.01, 1013.0, nlev)
    t = np.linspace(215.0, 288.0, nlev)
    x = rng.uniform(1e-5, 1e-3, nlev)
    args = (np.asarray(p_mb, np.float32), np.asarray(t, np.float32),
            {1: np.asarray(x, np.float32)})
    cat_args = dict(line_chunk=64, method=method)

    gas_j = GasOptics(grid, pallas="off", **cat_args)
    gas_j.add_catalog(_catalog_like(bound))
    want = np.asarray(gas_j.optical_depth(*args))

    gas_p = GasOptics(grid, pallas="interpret", **cat_args)
    gas_p.add_catalog(_catalog_like(bound))
    got = np.asarray(gas_p.optical_depth(*args))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6 * scale)

    # Quantum-aligned block == full slice.
    q = gas_p.bins.ppb * gas_p.bin_group
    blk = 4 * q
    got_b = np.asarray(gas_p.optical_depth(*args, block_start=blk,
                                           block_size=blk))
    np.testing.assert_allclose(got_b, want[:, blk:2 * blk], rtol=3e-5,
                               atol=3e-6 * scale)


def _catalog_like(bound):
    """Rebuild a LineCatalog from a GridLines (tests convenience)."""
    from grtcode_tpu.gas_optics.hitran import synthetic_catalog
    grid_w0 = None  # centers reconstructed from vnn directly
    return synthetic_catalog(
        bound.mol_id, np.asarray(bound.vnn, np.float64),
        np.asarray(bound.snn, np.float64) * 1e-20,
        yair=bound.yair, yself=bound.yself, en=bound.en, n=bound.n,
        d=bound.d, iso=bound.iso0 + 1)


def test_bin_kernel_correction_path():
    """High-wavenumber light-molecule case where remote lines fall inside
    Humlicek regions 1-4 (coarse_region0 False): the correction-capable
    coarse path must still match jnp exactly."""
    grid, bound, padded, prep, ns = _setup(w0=30000.0, wn=30060.0,
                                           n_lines=60, seed=11)
    bins, br, tau_j, bins_tau_j = _jnp_bins(grid, bound, padded, prep, ns,
                                            "bin_sweep")
    r0hw = lines_mod.region0_halfwidth(padded, grid.dw)
    tables = bp.build_bin_kernel_tables(
        br, bins, padded, ch=CH, G=8, region0_hw=r0hw,
        min_gap_points=1.0 / grid.dw)
    assert not tables.coarse_region0
    fine, coarse = bp.accumulate_bins_pallas(
        prep, padded.c0, ns, tables, ppb=bins.ppb, dw=float(grid.dw),
        nbins_block=bins.n, ch=CH, interpret=True)
    scale = np.abs(np.asarray(tau_j)).max()
    np.testing.assert_allclose(np.asarray(fine[:, :grid.n]),
                               np.asarray(tau_j), rtol=2e-5,
                               atol=2e-6 * scale)
    cscale = max(np.abs(np.asarray(bins_tau_j)).max(), 1e-30)
    np.testing.assert_allclose(np.asarray(coarse), np.asarray(bins_tau_j),
                               rtol=2e-5, atol=2e-6 * cscale)

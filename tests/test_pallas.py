"""Pallas far-wing kernel == jnp tiled far-wing accumulation.

Runs the Pallas kernel in interpreter mode on CPU against the jnp ground
truth (accumulate_tiled with far_kernel=True), including spectral-block
offsets and batched (rows = columns x layers) inputs.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics import lines as lines_mod
from grtcode_tpu.gas_optics import pallas_kernels as pk
from grtcode_tpu.gas_optics.hitran import synthetic_catalog
from grtcode_tpu.gas_optics.optical_depth import accumulate_tiled
from grtcode_tpu.utils import curtis_godson as cg
from grtcode_tpu import constants

TILE = 32
CH = 16


@pytest.fixture(scope="module")
def setup():
    grid = SpectralGrid(100.0, 180.0, 0.1)
    n_lines = 120
    rng = np.random.default_rng(5)
    vnn = np.sort(rng.uniform(90.0, 190.0, n_lines))
    cat = synthetic_catalog(
        1, vnn, rng.uniform(1e-22, 1e-19, n_lines),
        yair=rng.uniform(0.02, 0.1, n_lines),
        yself=rng.uniform(0.05, 0.4, n_lines),
        en=rng.uniform(0.0, 2000.0, n_lines),
        n=rng.uniform(0.4, 0.8, n_lines),
        d=rng.uniform(-0.02, 0.02, n_lines))
    bound = lines_mod.bind_to_grid(cat, grid)

    nlev = 7
    B = 3
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

    # Flatten (B, nlayers) -> rows.
    rows = B * (nlev - 1)
    prep = lines_mod.prepare(bound, grid, pavg.reshape(rows),
                             tavg.reshape(rows), psavg.reshape(rows))
    ns_rows = ns.reshape(rows)
    fsteps = 30
    near = 4
    return grid, bound, prep, ns_rows, fsteps, near


def _jnp_far(grid, bound, prep, ns, fsteps, near, num_wpoints, start):
    tiles = lines_mod.build_tiles(bound, grid.n, fsteps, tile=TILE,
                                  lane_multiple=8)
    return accumulate_tiled(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns, jnp.asarray(tiles.tile_lines),
        num_wpoints=num_wpoints, dw=float(grid.dw), fsteps=fsteps,
        tile=TILE, lchunk=8, start=start, num_global=grid.n,
        exclude_within=near, far_kernel=True)


def _pallas(grid, bound, prep, ns, fsteps, near, num_wpoints, start,
            include_near, region0_hw=None):
    hw = near + 2
    ranges = pk.build_chunk_ranges(
        bound.c0, grid.n, fsteps, TILE, CH, shift_margin=2, near_hw=hw,
        region0_hw=region0_hw)
    return pk.accumulate_voigt_pallas(
        prep, bound.c0, ns, ranges,
        num_wpoints=num_wpoints, dw=float(grid.dw), fsteps=fsteps,
        near=near, hw=hw, tile=TILE, ch=CH, num_global=grid.n,
        start=start, include_near=include_near, interpret=True)


def _pallas_far(grid, bound, prep, ns, fsteps, near, num_wpoints, start):
    return _pallas(grid, bound, prep, ns, fsteps, near, num_wpoints, start,
                   include_near=False)


def test_pallas_far_matches_jnp_full(setup):
    grid, bound, prep, ns, fsteps, near = setup
    nw = -(-grid.n // TILE) * TILE
    ref = np.asarray(_jnp_far(grid, bound, prep, ns, fsteps, near, nw, 0))
    got = np.asarray(_pallas_far(grid, bound, prep, ns, fsteps, near, nw, 0))
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=1e-12)
    assert np.isfinite(got).all()
    assert np.abs(ref).max() > 0


def test_pallas_far_blocks(setup):
    grid, bound, prep, ns, fsteps, near = setup
    n = -(-grid.n // TILE) * TILE
    block = 4 * TILE
    full = np.asarray(_pallas_far(grid, bound, prep, ns, fsteps, near, n, 0))
    for start in range(0, n, block):
        got = np.asarray(_pallas_far(grid, bound, prep, ns, fsteps, near,
                                     block, start))
        want = full[:, start:start + block]
        pad = block - want.shape[1]
        if pad:
            want = np.pad(want, ((0, 0), (0, pad)))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-12)


def test_pallas_fused_near_matches_jnp(setup):
    """Fused near+far kernel == tiled far pass + pointwise near pass."""
    from grtcode_tpu.gas_optics.optical_depth import \
        accumulate_near_pointwise

    grid, bound, prep, ns, fsteps, near = setup
    nw = -(-grid.n // TILE) * TILE
    far = _jnp_far(grid, bound, prep, ns, fsteps, near, nw, 0)
    ranges = lines_mod.build_point_ranges(bound, grid.n, near,
                                          shift_margin=2)
    ref = accumulate_near_pointwise(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns, jnp.asarray(ranges.lo), jnp.asarray(ranges.hi),
        num_wpoints=nw, dw=float(grid.dw), near=near, kpad=ranges.kpad,
        tau0=far, start=0, num_global=grid.n)
    got = np.asarray(_pallas(grid, bound, prep, ns, fsteps, near, nw, 0,
                             include_near=True))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=3e-6, atol=1e-12)
    assert np.isfinite(got).all()
    # The near core must actually contribute (it dominates peak tau).
    assert np.abs(got).max() > 1.5 * np.abs(np.asarray(far)).max()


def test_pallas_fused_blocks(setup):
    grid, bound, prep, ns, fsteps, near = setup
    n = -(-grid.n // TILE) * TILE
    block = 4 * TILE
    full = np.asarray(_pallas(grid, bound, prep, ns, fsteps, near, n, 0,
                              include_near=True))
    for start in range(0, n, block):
        got = np.asarray(_pallas(grid, bound, prep, ns, fsteps, near,
                                 block, start, include_near=True))
        want = full[:, start:start + block]
        pad = block - want.shape[1]
        if pad:
            want = np.pad(want, ((0, 0), (0, pad)))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-12)


def test_zone_split_bit_identical(setup):
    """The three-zone far-wing specialization (interior pure-region-0 /
    edge / core-adjacent) computes the same arithmetic as the
    single-path kernel: it only skips selects whose outcome is
    host-provably constant.  Tolerance is a couple of f32 ulps, NOT the
    kernel-parity 2e-6: XLA's FMA contraction may differ between the two
    expression graphs (observed <= 2 ulps on CPU; identical on TPU)."""
    grid, bound, prep, ns, fsteps, near = setup
    nw = -(-grid.n // TILE) * TILE
    base = np.asarray(_pallas(grid, bound, prep, ns, fsteps, near, nw, 0,
                              include_near=True, region0_hw=None))
    for r0 in (8, 12, 20):
        zoned = np.asarray(_pallas(grid, bound, prep, ns, fsteps, near,
                                   nw, 0, include_near=True,
                                   region0_hw=r0))
        np.testing.assert_allclose(zoned, base, rtol=6e-7, atol=1e-12)

    # With fsteps=30 and TILE=32 the interior zone is legitimately empty
    # (the window never fully covers a tile beyond the core reach), so
    # ALSO exercise the kernel's interior fast path: small tiles + a
    # line catalog dense enough that whole ch-chunks fall inside the
    # interior span (as in production: tile=64 vs fsteps=250 with ~30
    # HITRAN lines per cm-1).
    rng = np.random.default_rng(17)
    nd = 1200
    dcat = synthetic_catalog(
        1, np.sort(rng.uniform(grid.w0, grid.last, nd)),
        rng.uniform(1e-22, 1e-19, nd),
        yair=rng.uniform(0.02, 0.1, nd), yself=rng.uniform(0.05, 0.4, nd),
        en=rng.uniform(0.0, 2000.0, nd), n=rng.uniform(0.4, 0.8, nd),
        d=rng.uniform(-0.02, 0.02, nd))
    dbound = lines_mod.bind_to_grid(dcat, grid)
    nrows = prep.strength.shape[0]
    dprep = lines_mod.prepare(
        dbound, grid,
        np.full(nrows, 0.5, np.float32), np.full(nrows, 260.0, np.float32),
        np.full(nrows, 0.005, np.float32))
    hw = near + 2
    nw8 = -(-grid.n // 8) * 8

    def small_tile(r0):
        ranges = pk.build_chunk_ranges(dbound.c0, grid.n, fsteps, 8, 8,
                                       shift_margin=2, near_hw=hw,
                                       region0_hw=r0)
        out = pk.accumulate_voigt_pallas(
            dprep, dbound.c0, ns, ranges, num_wpoints=nw8,
            dw=float(grid.dw), fsteps=fsteps, near=near, hw=hw, tile=8,
            ch=8, num_global=grid.n, start=0, include_near=True,
            interpret=True)
        return ranges, np.asarray(out)

    ranges, zoned8 = small_tile(8)
    assert int(np.sum((ranges.flh - ranges.fll)
                      + (ranges.frh - ranges.frl))) > 0
    _, base8 = small_tile(None)
    np.testing.assert_allclose(zoned8, base8, rtol=6e-7, atol=1e-12)


def test_gas_optics_batched_matches_single():
    """Batched (B, nlev) optical_depth == per-column calls; and the full
    tiled+near pipeline with the Pallas far kernel (interpret mode)
    == the jnp tiled path."""
    from grtcode_tpu.gas_optics.gas_optics import GasOptics

    grid = SpectralGrid(100.0, 160.0, 0.1)
    rng = np.random.default_rng(9)
    n_lines = 60
    vnn = np.sort(rng.uniform(95.0, 165.0, n_lines))
    cat = synthetic_catalog(
        1, vnn, rng.uniform(1e-22, 1e-19, n_lines),
        yair=rng.uniform(0.02, 0.1, n_lines),
        yself=rng.uniform(0.05, 0.4, n_lines),
        en=rng.uniform(0.0, 2000.0, n_lines),
        n=rng.uniform(0.4, 0.8, n_lines),
        d=rng.uniform(-0.02, 0.02, n_lines))

    nlev, B = 6, 3
    p = np.linspace(0.01, 1013.0, nlev)[None, :] * np.ones((B, 1))
    t = np.linspace(215.0, 288.0, nlev)[None, :] + \
        rng.uniform(-3, 3, (B, nlev))
    x = rng.uniform(1e-5, 1e-2, (B, nlev))
    p, t, x = (jnp.asarray(a, jnp.float32) for a in (p, t, x))

    gas = GasOptics(grid, line_chunk=32, pallas="off")
    gas.add_catalog(cat)
    tau_b = gas.optical_depth(p, t, {1: x})
    assert tau_b.shape == (B, nlev - 1, grid.n)
    for b in range(B):
        tau_1 = gas.optical_depth(p[b], t[b], {1: x[b]})
        np.testing.assert_allclose(np.asarray(tau_b[b]), np.asarray(tau_1),
                                   rtol=1e-6, atol=1e-12)

    gas_pl = GasOptics(grid, line_chunk=32, pallas="interpret")
    gas_pl.add_catalog(cat)
    tau_jnp = tau_b
    tau_pl = gas_pl.optical_depth(p, t, {1: x})
    np.testing.assert_allclose(np.asarray(tau_pl), np.asarray(tau_jnp),
                               rtol=2e-6, atol=1e-12)
    assert np.abs(np.asarray(tau_jnp)).max() > 0


@pytest.mark.parametrize("layout", ["points"])
def test_transposed_far_layout_matches_jnp(setup, layout):
    """The transposed 'points' far-wing layout (production-reachable via
    $GRTCODE_TPU_FAR_LAYOUT) reproduces the jnp ground truth on the full
    grid and on a spectral block, with the three-zone classification on
    — the default 'lines' layout is covered by every other test."""
    grid, bound, prep, ns, fsteps, near = setup
    hw = near + 2
    r0 = lines_mod.region0_halfwidth(bound, grid.dw)
    ranges = pk.build_chunk_ranges(
        bound.c0, grid.n, fsteps, TILE, CH, shift_margin=2, near_hw=hw,
        region0_hw=r0)
    nw = -(-grid.n // TILE) * TILE
    ref = np.asarray(_pallas(grid, bound, prep, ns, fsteps, near, nw, 0,
                             include_near=True, region0_hw=r0))
    for start, size in ((0, nw), (2 * TILE, 4 * TILE)):
        got = np.asarray(pk.accumulate_voigt_pallas(
            prep, bound.c0, ns, ranges,
            num_wpoints=size, dw=float(grid.dw), fsteps=fsteps,
            near=near, hw=hw, tile=TILE, ch=CH, num_global=grid.n,
            start=start, interpret=True, far_layout=layout))
        np.testing.assert_allclose(
            got, ref[:, start:start + size], rtol=3e-6, atol=1e-12)
    assert np.abs(ref).max() > 0


def test_shared_near_hw_identical():
    """shared_near_hw=True (pad every molecule's near-core half-width to
    the band max -> ONE kernel signature, the fast-lowering mode) must be
    value-identical: hw only sizes the unrolled offset window, the
    |g - cidx| <= near mask decides membership."""
    import numpy as np

    from grtcode_tpu.gas_optics.gas_optics import GasOptics
    from grtcode_tpu.gas_optics.hitran import synthetic_catalog

    # Fine grid + high wavenumbers: the near-core half-width (in grid
    # points) then genuinely differs between light and heavy molecules.
    grid = SpectralGrid(2000.0, 2060.0, 0.01)

    def cat(mol, seed):
        rng = np.random.default_rng(seed)   # fresh: identical catalogs
        L = 90                              # for both GasOptics builds
        vnn = np.sort(rng.uniform(1995.0, 2065.0, L))
        return synthetic_catalog(
            mol, vnn, rng.uniform(1e-22, 1e-19, L),
            yair=rng.uniform(0.02, 0.1, L),
            yself=rng.uniform(0.05, 0.4, L),
            en=rng.uniform(0.0, 2000.0, L), n=rng.uniform(0.4, 0.8, L),
            d=rng.uniform(-0.01, 0.01, L))

    nlev = 6
    p = np.linspace(1.0, 1000.0, nlev).astype(np.float32)
    t = np.linspace(220.0, 290.0, nlev).astype(np.float32)
    # Two molecules with different masses -> different near-core hw.
    vmr = {1: np.full(nlev, 3e-3, np.float32),
           2: np.full(nlev, 4e-4, np.float32)}
    outs = {}
    for shared in (False, True):
        gas = GasOptics(grid, line_chunk=64, pallas="interpret",
                        shared_near_hw=shared)
        gas.add_catalog(cat(1, 0))
        gas.add_catalog(cat(2, 1))
        if shared:
            assert len(set(gas.near_hw.values())) > 1  # genuinely pads
        outs[shared] = np.asarray(gas.optical_depth(p, t, vmr))
    np.testing.assert_array_equal(outs[True], outs[False])

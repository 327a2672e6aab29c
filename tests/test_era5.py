"""ERA5 application: hyperslab reorder, unit conversions, GHG annual
means, cloud content, LW-only default, and segment output + combining."""
import h5py
import numpy as np
import pytest

from grtcode_tpu.apps import era5, circ
from grtcode_tpu.gas_optics.molecules import CfcId, MoleculeId
from grtcode_tpu.spectral import SpectralGrid

T, Z, Y, X = 2, 8, 3, 4
NLAY = Z - 1


@pytest.fixture(scope="module")
def era5_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("era5") / "era5.nc")
    rng = np.random.default_rng(9)
    with h5py.File(path, "w") as f:
        f.create_dataset("time", data=np.arange(T, dtype=np.float64))
        f.create_dataset("lat", data=np.array([-30.0, 0.0, 30.0]))
        f.create_dataset("lon", data=np.arange(X) * 90.0)
        p = np.linspace(1.0, 1000.0, Z)[None, :, None, None] * \
            np.ones((T, 1, Y, X))                       # [mb]
        f.create_dataset("p", data=p)
        f.create_dataset("t", data=np.linspace(220, 290, Z)[None, :, None,
                                                            None]
                         + rng.uniform(-3, 3, (T, Z, Y, X)))
        f.create_dataset("q", data=rng.uniform(1e-6, 1e-2, (T, Z, Y, X)))
        f.create_dataset("o3", data=rng.uniform(1e-8, 1e-5, (T, Z, Y, X)))
        f.create_dataset("skt", data=rng.uniform(280, 300, (T, Y, X)))
        f.create_dataset("fal", data=rng.uniform(0.05, 0.5, (T, Y, X)))
        f.create_dataset("tisr", data=rng.uniform(0, 3e7, (T, Y, X)))
        f.create_dataset("cc", data=rng.uniform(-0.1, 0.9, (T, Z, Y, X)))
        f.create_dataset("ciwc", data=rng.uniform(-1e-6, 1e-4,
                                                  (T, Z, Y, X)))
        f.create_dataset("clwc", data=rng.uniform(-1e-6, 5e-4,
                                                  (T, Z, Y, X)))
    return path


@pytest.fixture(scope="module")
def ghg_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ghg") / "ghg.nc")
    nyears = 5
    with h5py.File(path, "w") as f:
        f.create_dataset("co2", data=300.0 + np.arange(nyears))
        f.create_dataset("ch4", data=1.7 + 0.01 * np.arange(nyears))
        f.create_dataset("n2o", data=0.3 + 0.001 * np.arange(nyears))
        f.create_dataset("hfc134aeq", data=1e-4 * (1 + np.arange(nyears)))
        f.create_dataset("cfc12eq", data=5e-4 * (1 + np.arange(nyears)))
    return path


def test_load_and_reorder(era5_file, ghg_file):
    atm = era5.load_atmosphere(era5_file, ghg_file, year=3,
                               ghg_start_year=1, cfc_eq=(CfcId.CFC12,),
                               clear=False)
    assert atm.batch == T * Y * X
    assert atm.num_levels == Z
    # GHG year indexing: year 3, start 1 -> index 2 -> co2 = 302.
    np.testing.assert_allclose(atm.ppmv[int(MoleculeId.CO2)], 302.0)
    np.testing.assert_allclose(atm.cfc_ppmv[int(CfcId.CFC12)], 5e-4 * 3)
    # q -> vmr conversion with the dry-air mass ratio (era5.c:292-300).
    with h5py.File(era5_file, "r") as f:
        q0 = f["q"][0, :, 0, 0]
    np.testing.assert_allclose(
        atm.ppmv[int(MoleculeId.H2O)][0],
        q0 * 1e6 * (28.97 / 18.01528), rtol=1e-6)
    # Default reference behavior: zenith hardcoded to -1 -> LW only.
    assert np.all(atm.cos_zenith == -1.0)
    # Clouds: negatives clamped, content in g m-3 positive.
    assert (atm.cloud_fraction >= 0).all()
    assert (atm.liquid_water_content >= 0).all()
    assert atm.layer_thickness.shape == (T * Y * X, NLAY)
    assert (atm.layer_thickness > 0).all()


def test_lw_only_run_and_segments(era5_file, ghg_file, tmp_path):
    """Two lon segments run independently, write with merge attrs, and the
    combiner reproduces the full-domain run (the reference's SLURM
    sharding + combine-segments.py workflow)."""
    from tools.combine_segments import combine
    drv = era5.build_driver(lw_grid=SpectralGrid(1.0, 500.0, 1.0),
                            line_chunk=64)

    def run(xsel):
        atm = era5.load_atmosphere(era5_file, ghg_file, year=1,
                                   x=xsel, clear=True)
        return drv.run(atm, integrated=True)

    full = run(slice(None))
    seg_paths = []
    for i, xs in enumerate((slice(0, 2), slice(2, 4))):
        res = run(xs)
        path = str(tmp_path / f"seg{i}.nc")
        era5.write_fluxes(path, res, (T, Y, 2), lon_start=2 * i,
                          lon_stop=2 * i + 1, lon_global_size=X)
        seg_paths.append(path)

    merged = str(tmp_path / "merged.nc")
    combine(seg_paths, merged)
    with h5py.File(merged, "r") as f:
        rlu = np.asarray(f["rlu"])
    assert rlu.shape == (T, Y, X, Z)
    np.testing.assert_allclose(
        rlu.reshape(T * Y * X, Z),
        np.asarray(full.tiers["csaf"]["rlu"]), rtol=1e-6)
    # SW fluxes all zero (no sw_gas / night columns).
    assert np.all(np.asarray(full.tiers["csaf"]["rsu"]) == 0.0)


def test_spectral_output(era5_file, ghg_file, tmp_path):
    """Spectrally-resolved ERA5 output: 4-D (time, lat, lon, wavenumber)
    TOA/surface variables on the lw_wavenumber dim (era5.c:880-955;
    LW-only like the shipped binary)."""
    lw_grid = SpectralGrid(1.0, 500.0, 1.0)
    drv = era5.build_driver(lw_grid=lw_grid, line_chunk=64)
    atm = era5.load_atmosphere(era5_file, ghg_file, year=1, clear=True)
    res = drv.run(atm, integrated=False)
    path = str(tmp_path / "spectral.nc")
    era5.write_fluxes(path, res, (T, Y, X), lon_start=0, lon_stop=X - 1,
                      lon_global_size=X, lw_grid=lw_grid)
    with h5py.File(path, "r") as f:
        assert f["lw_wavenumber"].shape == (lw_grid.n,)
        for name in ("rlut", "rlus", "rlds"):
            assert f[name].shape == (T, Y, X, lw_grid.n), name
        assert "rsut" not in f          # LW-only configuration
        from grtcode_tpu.utils.interp import trapezoid_uniform
        res_int = drv.run(atm, integrated=True)
        np.testing.assert_allclose(
            trapezoid_uniform(np.asarray(f["rlut"]), lw_grid.dw, axis=-1)
            .reshape(-1),
            np.asarray(res_int.tiers["csaf"]["rlu"][:, 0]),
            rtol=2e-5, atol=1e-4)

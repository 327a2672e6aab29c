"""CIRC benchmark application (circ/src/circ.c, basic-circ-test.c).

Case 1 ships embedded (grtcode_tpu/data/circ1.npz, ported from the public
NASA CIRC data embedded in circ/src/circ1.h); other cases load from the
CIRC netCDF inputs when available.  Reference integrated-flux values for
case 1 (LBLRTM and the CIRC multi-model mean) are pinned from
basic-circ-test.c:444-501.
"""
from __future__ import annotations

import os

import numpy as np

from ..framework import Atmosphere, RadiationDriver, \
    pressure_interp_layers_to_levels
from ..gas_optics.gas_optics import GasOptics
from ..gas_optics.molecules import MoleculeId, CfcId, CiaId
from ..solvers.solar_flux import SolarFlux
from ..spectral import SpectralGrid

DATA = os.path.join(os.path.dirname(__file__), "..", "data", "circ1.npz")

# basic-circ-test.c:444-501 (W m-2).
CASE1_REFERENCE = {
    "RLUTCSAF": {"lblrtm": 304.27, "circ_mean": 301.7},
    "RLUSCSAF": {"lblrtm": 445.12, "circ_mean": None},
    "RLDSCSAF": {"lblrtm": 288.2, "circ_mean": 289.7},
    "RSDTCSAF": {"lblrtm": 912.79, "circ_mean": None},
    "RSUTCSAF": {"lblrtm": 175.0, "circ_mean": 169.8},
    "RSDSCSAF": {"lblrtm": 701.2, "circ_mean": 705.9},
    "RSUSCSAF": {"lblrtm": 137.40, "circ_mean": None},
}

# Gases the CIRC binary registers (circ.c:234-268 / basic-circ-test.c:170-233).
CASE1_MOLECULES = (MoleculeId.H2O, MoleculeId.CO2, MoleculeId.O3,
                   MoleculeId.N2O, MoleculeId.CO, MoleculeId.CH4,
                   MoleculeId.O2)
CASE1_CFCS = (CfcId.CFC11, CfcId.CFC12, CfcId.CCl4)


def case1_atmosphere(clean: bool = True, clear: bool = True) -> Atmosphere:
    """Build the embedded CIRC case-1 atmosphere (basic-circ-test.c:71-272).

    Per-layer abundances interpolate to levels in pressure space
    (basic-circ-test.c:50-64); the spectral surface albedo and TOA solar
    function come on the case's native 49 180-point grid.
    """
    d = np.load(DATA)
    lp = d["layer_pressure"][None, :]
    pl = d["level_pressure"][None, :]

    def to_ppmv(name):
        return pressure_interp_layers_to_levels(
            d[name][None, :], lp, pl) * 1e6

    ppmv = {int(m): to_ppmv(f"{m.name}_abundance") for m in CASE1_MOLECULES}
    cfc_names = {CfcId.CFC11: "CFC11", CfcId.CFC12: "CFC12",
                 CfcId.CCl4: "CCl4"}
    cfc_ppmv = {int(c): to_ppmv(f"{cfc_names[c]}_abundance")
                for c in CASE1_CFCS}
    # CIA uses the O2 and (implied well-mixed) N2 abundances
    # (circ.c:321-332: N2-N2, O2-N2, O2-O2 with N2 = 0.781).
    n2 = np.full_like(pl, 0.781e6)
    cia_ppmv = {int(CiaId.N2): n2,
                int(CiaId.O2): ppmv[int(MoleculeId.O2)]}

    return Atmosphere(
        level_pressure=pl,
        level_temperature=d["level_temperature"][None, :],
        layer_temperature=d["layer_temperature"][None, :],
        surface_temperature=[float(d["surface_temperature"])],
        ppmv=ppmv, cfc_ppmv=cfc_ppmv, cia_ppmv=cia_ppmv,
        # Emissivity == 1 everywhere (circ.c:71 callback; emissivity array
        # defaults to ones).
        cos_zenith=[np.cos(np.deg2rad(float(d["solar_zenith_angle"])))],
        # The case datum is the *horizontal* TOA irradiance; the solver's
        # TSI is that divided by cos(sza) (basic-circ-test.c:118-124).
        total_solar_irradiance=[
            float(d["toa_solar_irradiance"])
            / np.cos(np.deg2rad(float(d["solar_zenith_angle"])))],
        albedo_grid=d["wavenumber"],
        albedo=d["surface_albedo"][None, :],
        aerosol_optical_depth_1um=d["aerosol_optical_depth_at_1_micron"][None, :],
        aerosol_angstrom_exponent=float(d["angstrom_exponent_value"]),
        aerosol_single_scatter_albedo=d["aerosol_single_scatter_albedo"][None, :],
        aerosol_asymmetry_factor=d["aerosol_asymmetry_factor"][None, :],
        cloud_fraction=d["cloud_fraction"][None, :],
        # LWP/IWP [g m-2] -> content [g m-3] via the layer thickness from
        # the case's level heights (circ.c builds cloud content the same
        # way from lwp and layer depth).
        liquid_water_content=(d["liquid_water_path"] / _thickness_m(d))[None, :],
        ice_water_content=(d["ice_water_path"] / _thickness_m(d))[None, :],
        layer_thickness=_thickness_m(d)[None, :],
        clean=clean, clear=clear,
    )


def _thickness_m(d) -> np.ndarray:
    """Layer geometric thickness [m] from level heights [km]."""
    z = d["height_above_sea_level"] * 1000.0
    return np.abs(z[:-1] - z[1:])


def case1_solar_flux(grid: SpectralGrid) -> SolarFlux:
    """Normalized incident solar spectrum from the embedded TOA solar
    function (basic-circ-test.c uses toa_solar_function with the case TSI)."""
    d = np.load(DATA)
    return SolarFlux.from_samples(d["wavenumber"], d["toa_solar_function"],
                                  grid)


def build_driver(hitran_path: str | None = None,
                 lw_grid: SpectralGrid | None = None,
                 sw_grid: SpectralGrid | None = None,
                 h2o_ctm_dir: str | None = None,
                 o3_ctm_file: str | None = None,
                 cfc_dir: str | None = None,
                 **gas_kwargs) -> RadiationDriver:
    """CIRC driver with the default grids (driver.c:912-921: LW 1-3250 at
    0.1 cm-1, SW 1-50000 at 1.0 cm-1).  With a HITRAN .par path the full
    case gas set is registered; without one the gas optics start empty
    (add synthetic catalogs for testing)."""
    lw_grid = lw_grid or SpectralGrid(1.0, 3250.0, 0.1)
    sw_grid = sw_grid or SpectralGrid(1.0, 50000.0, 1.0)
    lw_gas = GasOptics(lw_grid, hitran_path=hitran_path, **gas_kwargs)
    sw_gas = GasOptics(sw_grid, hitran_path=hitran_path, **gas_kwargs)
    if hitran_path:
        for m in CASE1_MOLECULES:
            lw_gas.add_molecule(m)
            sw_gas.add_molecule(m)
    solar = case1_solar_flux(sw_grid)
    return RadiationDriver(lw_gas=lw_gas, sw_gas=sw_gas, solar=solar)


def main(argv=None):
    """basic-circ-test equivalent: run embedded case 1 and print the
    integrated fluxes next to the LBLRTM / CIRC-mean references
    (basic-circ-test.c:444-501)."""
    from ..framework import cli

    p = cli.shared_parser("CIRC case benchmark (embedded case 1).")
    cli.add_gas_flags(p, [m.name for m in CASE1_MOLECULES],
                      cfcs=["CFC-11", "CFC-12", "CCl4"],
                      cias=["N2-N2", "O2-N2", "O2-O2"])
    p.add_argument("-clouds", action="store_true",
                   help="Enable the all-sky tier (needs -liquid-path/"
                        "-ice-path Pade files).")
    args = p.parse_args(argv)
    cli.configure(args)

    lw_grid, sw_grid = cli.grids_from_args(args)
    atm = case1_atmosphere(clean=True, clear=not args.clouds)
    hitran = None if args.hitran_file in ("none", "-") else args.hitran_file
    driver = build_driver(hitran_path=hitran, lw_grid=lw_grid,
                          sw_grid=sw_grid, wcutoff=args.line_cutoff)
    if args.h2o_ctm and hitran:
        from ..gas_optics.continua import WaterVaporContinuum
        driver.lw_gas.h2o_ctm = WaterVaporContinuum.from_directory(
            args.h2o_ctm, lw_grid)
    if args.o3_ctm and hitran:
        from ..gas_optics.continua import OzoneContinuum
        driver.lw_gas.o3_ctm = OzoneContinuum.from_file(args.o3_ctm, lw_grid)
    if args.clouds:
        from ..clouds import CloudOpticsLib, PadeCloudOptics
        driver.cloud_optics = CloudOpticsLib(
            liquid=PadeCloudOptics.from_netcdf(args.liquid_path),
            ice=PadeCloudOptics.from_netcdf(args.ice_path)).driver_callback()

    res = driver.run(atm, integrated=True)
    print(f"{'Variable':<12}{'GRTCODE-TPU':>14}{'LBLRTM':>10}{'CIRC mean':>11}")
    for name, refs in CASE1_REFERENCE.items():
        got = float(res.variable(name)[0])
        lbl = refs["lblrtm"]
        mean = refs["circ_mean"]
        print(f"{name:<12}{got:>14.4f}{lbl:>10.2f}"
              f"{mean if mean is not None else '':>11}")
    return res


if __name__ == "__main__":
    main()

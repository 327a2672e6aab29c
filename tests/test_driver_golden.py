"""End-to-end flux golden vs the reference's FULL production stack.

tools/goldens/driver_harness.c compiles the unmodified reference sources
(parse_HITRAN_file.c -> kernels.c line_sample -> continua -> cfcs -> cia ->
optics.c combine -> longwave.c + shortwave.c + rayleigh.c + solar_flux.c,
the clear-clean tier of framework/src/driver.c:360-444) on the synthetic
catalog from tools/goldens/driver_inputs.py and pins per-level integrated
rlu/rld/rsu/rsd into tests/data/driver_golden.txt.

This test regenerates the *same* inputs, feeds them through this
framework's public app path (parse_par_file -> GasOptics -> RadiationDriver)
and matches every level at the reference's own tolerance contract
(circ/test/check_results.c:39-53: 1 percent).  It fails if any layer of the
stack — parse, line prep, Voigt, continuum, CFC, CIA, optics combine,
either solver, or the spectral integration — drifts.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from tools.goldens import driver_inputs  # noqa: E402

from grtcode_tpu.framework.atmosphere import Atmosphere  # noqa: E402
from grtcode_tpu.framework.driver import RadiationDriver  # noqa: E402
from grtcode_tpu.gas_optics.continua import (OzoneContinuum,  # noqa: E402
                                             WaterVaporContinuum)
from grtcode_tpu.gas_optics.gas_optics import GasOptics  # noqa: E402
from grtcode_tpu.gas_optics.molecules import CfcId, CiaId  # noqa: E402
from grtcode_tpu.solvers.solar_flux import SolarFlux  # noqa: E402
from grtcode_tpu.spectral import SpectralGrid  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "driver_golden.txt")
# The reference's own contract is 1% (check_results.c:39-53); this f32
# stack actually lands within ~7e-6 of the f64 reference on every level,
# so assert 1e-4 to catch drift two orders of magnitude before the
# contract is violated.
TOLERANCE = 1e-4


def _load_golden():
    vals, cur = {}, None
    with open(GOLDEN) as f:
        for line in f:
            line = line.strip()
            if line.startswith("nlev"):
                nlev = int(line.split()[1])
            elif line in ("rlu", "rld", "rsu", "rsd"):
                cur = line
                vals[cur] = []
            else:
                vals[cur].append(float(line))
    return nlev, {k: np.asarray(v) for k, v in vals.items()}


@pytest.fixture(scope="module")
def results(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("driver_inputs"))
    atm_data = driver_inputs.write_inputs(d)

    lw_grid = SpectralGrid(*driver_inputs.LW_GRID)
    sw_grid = SpectralGrid(*driver_inputs.SW_GRID)

    def make_gas(grid):
        gas = GasOptics(
            grid,
            hitran_path=os.path.join(d, "synthetic.par"),
            h2o_ctm=WaterVaporContinuum.from_directory(
                os.path.join(d, "h2o_ctm"), grid),
            o3_ctm=OzoneContinuum.from_file(
                os.path.join(d, "o3_ctm.csv"), grid))
        for mol in (1, 2, 3, 4, 6):
            gas.add_molecule(mol)
        gas.add_cfc(CfcId.CFC11, os.path.join(d, "cfc11.csv"))
        gas.add_cfc(CfcId.CFC12, os.path.join(d, "cfc12.csv"))
        gas.add_cia(CiaId.N2, CiaId.N2,
                    os.path.join(d, "cia_n2n2.csv"))
        gas.add_cia(CiaId.O2, CiaId.N2,
                    os.path.join(d, "cia_o2n2.csv"))
        return gas

    driver = RadiationDriver(
        lw_gas=make_gas(lw_grid), sw_gas=make_gas(sw_grid),
        solar=SolarFlux.from_csv(os.path.join(d, "solar.csv"), sw_grid))

    atm = Atmosphere(
        level_pressure=atm_data["p"][None],
        level_temperature=atm_data["t"][None],
        surface_temperature=np.array([atm_data["ts"]]),
        ppmv={m: v[None] for m, v in atm_data["ppmv"].items()},
        cfc_ppmv={k: v[None] for k, v in atm_data["cfc_ppmv"].items()},
        cia_ppmv={k: v[None] for k, v in atm_data["cia_ppmv"].items()},
        emissivity_grid=atm_data["emis_w"],
        emissivity=atm_data["emis"][None],
        cos_zenith=np.array([atm_data["mu"]]),
        total_solar_irradiance=np.array([atm_data["tsi"]]),
        albedo_grid=atm_data["alb_w"],
        albedo=atm_data["alb"][None])

    return driver.run(atm, integrated=True)


@pytest.mark.parametrize("var", ["rlu", "rld", "rsu", "rsd"])
def test_driver_matches_reference_stack(results, var):
    nlev, golden = _load_golden()
    ours = np.asarray(results.tiers["csaf"][var][0])
    ref = golden[var]
    assert ours.shape == (nlev,)
    # Relative per level, with a floor so rld(TOA)=0 compares absolutely
    # against the variable's magnitude (check_results.c uses rel+abs).
    scale = np.maximum(np.abs(ref), 0.01 * np.abs(ref).max())
    rel = np.abs(ours - ref) / scale
    assert rel.max() < TOLERANCE, (
        f"{var}: worst level {int(rel.argmax())}: "
        f"ours={ours[rel.argmax()]:.6e} ref={ref[rel.argmax()]:.6e} "
        f"rel={rel.max():.2e}")

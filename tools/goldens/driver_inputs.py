"""Deterministic synthetic inputs for the end-to-end driver golden.

Shared by driver_harness.c (reference C stack) and
tests/test_driver_golden.py (this framework): one seeded generator writes a
synthetic HITRAN .par catalog, MT-CKD-style continuum CSVs, CFC/CIA cross
section CSVs, a solar-flux CSV, and a plain-text atmosphere profile, all in
the file formats the reference's readers require
(parse_HITRAN_file.c:77-100, water_vapor_continuum.c:32-136,
ozone_continuum.c:31-97, cfcs.c:113, collision_induced_absorption.c:58-70,
solar_flux.c:27-99).  The physics content is synthetic; the *stack* under
test is real: parse -> line prep -> Voigt line_sample -> continua -> CFC ->
CIA -> optics combine -> LW/SW solvers -> spectral integration
(framework/src/driver.c:360-444 clear-clean tier).
"""
from __future__ import annotations

import os

import numpy as np

SEED = 20260820
NLEV = 34

LW_GRID = (1.0, 3250.0, 0.1)
SW_GRID = (2000.0, 20000.0, 1.0)

TS = 294.2                      # surface temperature [K]
MU = 0.6707                     # cos(47.88 deg), circ1.h:13-15 style
TSI = 1361.0

# (mol_id, n_lw_lines, n_sw_lines, strength scale)
GASES = [
    (1, 4000, 1000, 3e-20),     # H2O
    (2, 2000, 0, 1e-20),        # CO2
    (3, 1000, 0, 5e-21),        # O3
    (4, 600, 0, 4e-21),         # N2O
    (6, 800, 0, 4e-21),         # CH4
]


def _record(mol, iso_ch, vnn, snn, yair, yself, en, n, d):
    """One 160-char fixed-width HITRAN2012 record."""
    rec = (f"{mol:2d}{iso_ch}{vnn:12.6f}{snn:10.3E}" + " " * 10 +
           f"{yair:5.4f}"[:5] + f"{yself:5.3f}"[:5] +
           f"{en:10.4f}" + f"{n:4.2f}" + f"{d:8.6f}"[:8])
    return rec + " " * (160 - len(rec))


def atmosphere():
    """Profile dict; level 0 = TOA (reference driver convention)."""
    rng = np.random.default_rng(SEED)
    s = np.arange(NLEV) / (NLEV - 1.0)            # 0 at TOA, 1 at surface
    p = 0.05 + (1013.0 - 0.05) * s ** 1.8          # [mb]
    t = 287.0 - 71.0 * np.exp(-2.2 * s) + rng.uniform(-0.8, 0.8, NLEV)
    t = np.maximum.accumulate(t * 0 + t)           # keep as generated
    ppmv = {
        1: 2.0 + 19000.0 * s ** 3,                                 # H2O
        2: np.full(NLEV, 400.0),                                   # CO2
        3: 0.03 + 7.5 * np.exp(-0.5 * ((s - 0.15) / 0.12) ** 2),   # O3
        4: np.full(NLEV, 0.332),                                   # N2O
        6: np.full(NLEV, 1.85),                                    # CH4
    }
    # Abundances are scaled far above ambient so CFC/CIA contribute O(0.3)
    # optical depth — a parity test that cannot *see* a broken component
    # proves nothing.
    cfc_ppmv = {0: np.full(NLEV, 1.0), 1: np.full(NLEV, 0.8)}
    # CIA abundances keyed by species (CIA_N2=0, CIA_O2=1 in cfcs.h order).
    cia_ppmv = {0: np.full(NLEV, 781000.0), 1: np.full(NLEV, 209000.0)}
    emis_w = np.linspace(0.5, 3400.0, 24)
    emis = 0.985 - 0.02 * np.sin(emis_w / 600.0) ** 2
    alb_w = np.linspace(1900.0, 20600.0, 32)
    alb = 0.16 + 0.08 * np.cos(alb_w / 4000.0) ** 2
    return dict(p=p, t=t, ppmv=ppmv, cfc_ppmv=cfc_ppmv, cia_ppmv=cia_ppmv,
                ts=TS, mu=MU, tsi=TSI, emis_w=emis_w, emis=emis,
                alb_w=alb_w, alb=alb)


def aerosol():
    """Per-layer Angstrom-exponent aerosol state (the circ.c:363-410
    ingest contract: tau at 1 um, grey ssa/g, one alpha)."""
    nlay = NLEV - 1
    s = (np.arange(nlay) + 0.5) / nlay
    return dict(
        tau1um=0.28 * np.exp(-0.5 * ((s - 0.85) / 0.13) ** 2),
        omega=0.88 + 0.06 * np.sin(3.0 * s),
        g=0.55 + 0.15 * s,
        alpha=1.48,
    )


def clouds():
    """Deterministic condensate profile injected IN PLACE of the
    stochastic sample (clouds_lib.c:105-106 rand() bypass): a liquid
    deck near the boundary layer and a thin cirrus layer."""
    nlay = NLEV - 1
    s = (np.arange(nlay) + 0.5) / nlay
    ql = np.zeros(nlay)
    qi = np.zeros(nlay)
    ql[(s > 0.70) & (s < 0.85)] = 0.21          # [g m-3]
    qi[(s > 0.25) & (s < 0.38)] = 0.014
    thickness = 250.0 + 900.0 * (1.0 - s)       # [m]
    return dict(ql=ql, qi=qi, thickness=thickness)


def pade_tables():
    """Synthetic RRTMGP-style Pade tables for liquid and ice, spanning
    both solver bands.  Band edges sit at x.3 offsets so a grid-point
    CENTER (this framework's band_to_grid) and its pseudo-band LEFT EDGE
    (the reference's map_band_wave over driver.c:476-492 band_limits)
    always classify into the same band on both the 0.1 and 1.0 cm-1
    grids."""
    out = {}
    for phase, seed, nbnd in (("liquid", SEED + 4, 8), ("ice", SEED + 5, 9)):
        rng = np.random.default_rng(seed)
        edges = np.linspace(0.0, 20600.0, nbnd + 1) + 0.3
        band_lims = np.stack([edges[:-1], edges[1:]])
        if phase == "liquid":
            sizereg = np.array([[2.5, 21.0, 60.0], [21.0, 60.0, 90.0]])
            sizeref = np.array([9.0, 35.0, 70.0])
        else:
            sizereg = np.array([[5.0, 30.0, 70.0], [30.0, 70.0, 140.0]])
            sizeref = np.array([15.0, 45.0, 95.0])
        n = m = 3
        nreg = sizeref.size

        def coefs(lo, hi):
            p = np.empty((nbnd, nreg, n))
            q = np.empty((nbnd, nreg, m))
            # Highest-order coefficient FIRST (pade_eval_1 Horner order,
            # cloud_pade_optics.c:204-216).  Small high-order terms keep
            # the rational value in [lo, hi] and the denominator safely
            # positive over the whole radius-offset range (|re| <= 45).
            p[..., 0] = rng.uniform(1e-7, 5e-7, (nbnd, nreg)) * lo
            p[..., 1] = rng.uniform(1e-4, 4e-4, (nbnd, nreg)) * lo
            p[..., 2] = rng.uniform(lo, hi, (nbnd, nreg))
            q[..., 0] = rng.uniform(1e-7, 5e-7, (nbnd, nreg))
            q[..., 1] = rng.uniform(1e-4, 4e-4, (nbnd, nreg))
            q[..., 2] = rng.uniform(1.0, 1.05, (nbnd, nreg))
            return p, q

        ext_p, ext_q = coefs(0.04, 0.12)    # [m-1 per g m-3] -> tau O(1)
        ssa_p, ssa_q = coefs(*((0.82, 0.93) if phase == "liquid"
                               else (0.55, 0.72)))
        asy_p, asy_q = coefs(*((0.72, 0.84) if phase == "liquid"
                               else (0.68, 0.78)))
        out[phase] = dict(band_lims=band_lims, sizereg=sizereg,
                          sizeref=sizeref, n=n, m=m,
                          ext_p=ext_p, ext_q=ext_q, ssa_p=ssa_p,
                          ssa_q=ssa_q, asy_p=asy_p, asy_q=asy_q)
    return out


def catalog_records():
    """All synthetic .par records, sorted by line center."""
    rng = np.random.default_rng(SEED + 1)
    recs = []
    for mol_id, n_lw, n_sw, s_scale in GASES:
        windows = [(LW_GRID[0] + 5.0, LW_GRID[1] - 5.0, n_lw),
                   (SW_GRID[0] + 5.0, SW_GRID[1] - 5.0, n_sw)]
        for w0, w1, count in windows:
            if count == 0:
                continue
            vnn = rng.uniform(w0, w1, count)
            snn = s_scale * 10.0 ** rng.uniform(-3.5, 0.0, count)
            yair = rng.uniform(0.015, 0.11, count)
            yself = rng.uniform(0.05, 0.45, count)
            en = rng.uniform(0.0, 2800.0, count)
            nexp = rng.uniform(0.35, 0.85, count)
            d = rng.uniform(-0.015, 0.015, count)
            iso = rng.choice(["1", "2", "3"], count, p=[0.85, 0.10, 0.05])
            for k in range(count):
                recs.append((float(vnn[k]), _record(
                    mol_id, iso[k], float(vnn[k]), float(snn[k]),
                    float(yair[k]), float(yself[k]), float(en[k]),
                    float(nexp[k]), float(d[k]))))
    recs.sort(key=lambda r: r[0])
    return [r[1] for r in recs]


def _csv(path, header, cols):
    with open(path, "w") as f:
        f.write(header + "\n")
        for row in zip(*cols):
            f.write(",".join(f"{v:.8e}" for v in row) + "\n")


def write_inputs(outdir: str) -> dict:
    """Write every input file into ``outdir``; returns the atmosphere."""
    os.makedirs(outdir, exist_ok=True)
    h2o_dir = os.path.join(outdir, "h2o_ctm")
    os.makedirs(h2o_dir, exist_ok=True)

    with open(os.path.join(outdir, "synthetic.par"), "w") as f:
        for rec in catalog_records():
            f.write(rec + "\n")

    # MT-CKD-style continuum coefficient curves over both bands.
    w = np.arange(0.0, 20601.0, 50.0)
    cs = 2.5e-22 * np.exp(-w / 900.0) + 4e-25
    cf = 6.0e-25 * np.exp(-w / 1500.0) + 1e-27
    t0s = 0.012 + 0.004 * np.sin(w / 800.0)
    t0f = 0.006 + 0.002 * np.cos(w / 1100.0)
    dummy = np.zeros_like(w)
    _csv(os.path.join(h2o_dir, "296MTCKD25_S.csv"), "w,Cs", (w, cs))
    _csv(os.path.join(h2o_dir, "296MTCKD25_F.csv"), "w,Cf", (w, cf))
    _csv(os.path.join(h2o_dir, "CKDS.csv"), "w,T0,a,b",
         (w, t0s, dummy, dummy))
    _csv(os.path.join(h2o_dir, "CKDF.csv"), "w,T0,a,b",
         (w, t0f, dummy, dummy))

    # Ozone (Hartley/Huggins-like) continuum in the SW band only.
    w_o3 = np.arange(9000.0, 20601.0, 100.0)
    sig_o3 = 4e-22 * np.exp(-0.5 * ((w_o3 - 17500.0) / 2600.0) ** 2)
    _csv(os.path.join(outdir, "o3_ctm.csv"), "w,sigma", (w_o3, sig_o3))

    # CFC cross sections in the LW window region.
    w_cfc = np.arange(700.0, 1301.0, 5.0)
    sig11 = 8e-19 * np.exp(-0.5 * ((w_cfc - 850.0) / 45.0) ** 2) \
        + 6e-19 * np.exp(-0.5 * ((w_cfc - 1085.0) / 35.0) ** 2)
    sig12 = 9e-19 * np.exp(-0.5 * ((w_cfc - 920.0) / 30.0) ** 2) \
        + 7e-19 * np.exp(-0.5 * ((w_cfc - 1160.0) / 40.0) ** 2)
    _csv(os.path.join(outdir, "cfc11.csv"), "w,sigma", (w_cfc, sig11))
    _csv(os.path.join(outdir, "cfc12.csv"), "w,sigma", (w_cfc, sig12))

    # CIA cross sections (N2-N2 rototranslational, O2-N2) in the far-IR.
    w_cia = np.arange(1.0, 551.0, 5.0)
    sig_n2n2 = 4e-44 * np.exp(-0.5 * ((w_cia - 95.0) / 70.0) ** 2)
    sig_o2n2 = 1.5e-44 * np.exp(-0.5 * ((w_cia - 150.0) / 90.0) ** 2)
    _csv(os.path.join(outdir, "cia_n2n2.csv"), "w,sigma", (w_cia, sig_n2n2))
    _csv(os.path.join(outdir, "cia_o2n2.csv"), "w,sigma", (w_cia, sig_o2n2))

    # Solar spectrum ~ 5800 K Planck shape (normalized by the reader).
    w_sol = np.arange(1800.0, 20801.0, 50.0)
    x = w_sol / 4000.0
    sol = x ** 3 / (np.expm1(w_sol * 1.4387769 / 5800.0))
    _csv(os.path.join(outdir, "solar.csv"), "w,flux", (w_sol, sol))

    # Aerosol state (CS tier) and deterministic condensate (AF tier).
    aero = aerosol()
    with open(os.path.join(outdir, "aerosol.txt"), "w") as f:
        f.write(f"{NLEV - 1} {aero['alpha']:.10e}\n")
        for i in range(NLEV - 1):
            f.write(f"{aero['tau1um'][i]:.10e} {aero['omega'][i]:.10e} "
                    f"{aero['g'][i]:.10e}\n")
    cld = clouds()
    with open(os.path.join(outdir, "cloud.txt"), "w") as f:
        f.write(f"{NLEV - 1}\n")
        for i in range(NLEV - 1):
            f.write(f"{cld['ql'][i]:.10e} {cld['qi'][i]:.10e} "
                    f"{cld['thickness'][i]:.10e}\n")
    pade = pade_tables()
    for phase in ("liquid", "ice"):
        tb = pade[phase]
        with open(os.path.join(outdir, f"pade_{phase}.txt"), "w") as f:
            nbnd = tb["band_lims"].shape[1]
            nreg = tb["sizeref"].size
            f.write(f"{nbnd} {nreg} {tb['n']} {tb['m']}\n")

            def block(a):
                f.write(" ".join(f"{v:.10e}" for v in
                                 np.asarray(a).ravel()) + "\n")

            block(tb["band_lims"][0])
            block(tb["band_lims"][1])
            block(tb["sizereg"][0])
            block(tb["sizereg"][1])
            block(tb["sizeref"])
            for key in ("ext_p", "ext_q", "ssa_p", "ssa_q",
                        "asy_p", "asy_q"):
                block(tb[key])

    atm = atmosphere()
    with open(os.path.join(outdir, "atm.txt"), "w") as f:
        f.write(f"{NLEV}\n")
        for i in range(NLEV):
            row = [atm["p"][i], atm["t"][i]]
            row += [atm["ppmv"][m][i] for m in (1, 2, 3, 4, 6)]
            row += [atm["cfc_ppmv"][0][i], atm["cfc_ppmv"][1][i]]
            row += [atm["cia_ppmv"][0][i], atm["cia_ppmv"][1][i]]
            f.write(" ".join(f"{v:.10e}" for v in row) + "\n")
        f.write(f"{atm['ts']:.10e} {atm['mu']:.10e} {atm['tsi']:.10e}\n")
        f.write(f"{len(atm['emis_w'])}\n")
        for wv, ev in zip(atm["emis_w"], atm["emis"]):
            f.write(f"{wv:.10e} {ev:.10e}\n")
        f.write(f"{len(atm['alb_w'])}\n")
        for wv, av in zip(atm["alb_w"], atm["alb"]):
            f.write(f"{wv:.10e} {av:.10e}\n")
    return atm


if __name__ == "__main__":
    import sys
    write_inputs(sys.argv[1] if len(sys.argv) > 1 else "/tmp/driver_inputs")

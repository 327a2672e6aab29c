"""HITRAN molecule registry.

Physical metadata (HITRAN 2012 ids, principal-isotopologue masses, number of
isotopologues) matching reference gas-optics/src/molecules.c:30-337 and
molecules.h:31-104.  CFC / HFC and collision pair identifiers follow
cfcs.h:32-67 and collision_induced_absorption.h:36-53.
"""
from __future__ import annotations

import dataclasses
import enum

from .. import constants


class MoleculeId(enum.IntEnum):
    """HITRAN molecule ids (molecules.h:31-104)."""

    H2O = 1
    CO2 = 2
    O3 = 3
    N2O = 4
    CO = 5
    CH4 = 6
    O2 = 7
    NO = 8
    SO2 = 9
    NO2 = 10
    NH3 = 11
    HNO3 = 12
    OH = 13
    HF = 14
    HCl = 15
    HBr = 16
    HI = 17
    ClO = 18
    OCS = 19
    H2CO = 20
    HOCl = 21
    N2 = 22
    HCN = 23
    CH3Cl = 24
    H2O2 = 25
    C2H2 = 26
    C2H6 = 27
    PH3 = 28
    COF2 = 29
    SF6 = 30
    H2S = 31
    HCOOH = 32
    HO2 = 33
    O = 34
    ClONO2 = 35
    NOp = 36
    HOBr = 37
    C2H4 = 38
    CH3OH = 39
    CH3Br = 40
    CH3CN = 41
    CF4 = 42
    C4H2 = 43
    HC3N = 44
    H2 = 45
    CS = 46
    SO3 = 47
    C2N2 = 48
    COCl2 = 49
    SO = 50
    C3H4 = 51
    CH3 = 52
    CS2 = 53


NUM_MOLECULES = 53


@dataclasses.dataclass(frozen=True)
class Molecule:
    id: MoleculeId
    name: str
    molar_mass: float  # [g mol-1] principal isotopologue
    num_isotopologues: int
    linear: bool  # used by the power-law TIPS fallback

    @property
    def mass_g(self) -> float:
        """Molecular mass [g] using the reference's Avogadro constant
        (molecules.c:309)."""
        return self.molar_mass / constants.AVOGADRO_REF


# (name, molar mass, n_iso, linear?) — masses from molecules.c:30-307.
_REGISTRY_DATA = {
    MoleculeId.H2O: ("H2O", 18.010565, 9, False),
    MoleculeId.CO2: ("CO2", 43.98983, 13, True),
    MoleculeId.O3: ("O3", 47.984745, 18, False),
    MoleculeId.N2O: ("N2O", 44.001062, 5, True),
    MoleculeId.CO: ("CO", 27.994915, 9, True),
    MoleculeId.CH4: ("CH4", 16.0313, 4, False),
    MoleculeId.O2: ("O2", 31.98983, 6, True),
    MoleculeId.NO: ("NO", 29.997989, 3, True),
    MoleculeId.SO2: ("SO2", 63.961901, 2, False),
    MoleculeId.NO2: ("NO2", 45.992904, 1, False),
    MoleculeId.NH3: ("NH3", 17.026549, 2, False),
    MoleculeId.HNO3: ("HNO3", 62.995644, 2, False),
    MoleculeId.OH: ("OH", 17.00274, 3, True),
    MoleculeId.HF: ("HF", 20.006229, 2, True),
    MoleculeId.HCl: ("HCl", 35.976678, 4, True),
    MoleculeId.HBr: ("HBr", 79.92616, 4, True),
    MoleculeId.HI: ("HI", 127.912297, 2, True),
    MoleculeId.ClO: ("ClO", 50.963768, 2, True),
    MoleculeId.OCS: ("OCS", 59.966986, 5, True),
    MoleculeId.H2CO: ("H2CO", 30.010565, 3, False),
    MoleculeId.HOCl: ("HOCl", 51.971593, 2, False),
    MoleculeId.N2: ("N2", 28.006148, 3, True),
    MoleculeId.HCN: ("HCN", 27.010899, 3, True),
    MoleculeId.CH3Cl: ("CH3Cl", 49.992328, 2, False),
    MoleculeId.H2O2: ("H2O2", 34.00548, 1, False),
    MoleculeId.C2H2: ("C2H2", 26.01565, 3, True),
    MoleculeId.C2H6: ("C2H6", 30.04695, 2, False),
    MoleculeId.PH3: ("PH3", 33.997238, 1, False),
    MoleculeId.COF2: ("COF2", 65.991722, 2, False),
    MoleculeId.SF6: ("SF6", 145.962492, 1, False),
    MoleculeId.H2S: ("H2S", 33.987721, 3, False),
    MoleculeId.HCOOH: ("HCOOH", 46.00548, 1, False),
    MoleculeId.HO2: ("HO2", 32.997655, 1, False),
    MoleculeId.O: ("O", 15.994915, 0, True),
    MoleculeId.ClONO2: ("ClONO2", 96.956672, 2, False),
    MoleculeId.NOp: ("NO+", 29.997989, 1, True),
    MoleculeId.HOBr: ("HOBr", 95.921076, 2, False),
    MoleculeId.C2H4: ("C2H4", 28.0313, 2, False),
    MoleculeId.CH3OH: ("CH3OH", 32.026215, 1, False),
    MoleculeId.CH3Br: ("CH3Br", 93.941811, 2, False),
    MoleculeId.CH3CN: ("CH3CN", 41.026549, 4, False),
    MoleculeId.CF4: ("CF4", 87.993616, 1, False),
    MoleculeId.C4H2: ("C4H2", 50.01565, 1, True),
    MoleculeId.HC3N: ("HC3N", 51.010899, 6, True),
    MoleculeId.H2: ("H2", 2.01565, 2, True),
    MoleculeId.CS: ("CS", 43.971036, 4, True),
    MoleculeId.SO3: ("SO3", 79.95682, 1, False),
    MoleculeId.C2N2: ("C2N2", 52.006148, 2, True),
    MoleculeId.COCl2: ("COCl2", 97.9326199796, 2, False),
    MoleculeId.SO: ("SO", 48.0644, 3, True),
    MoleculeId.C3H4: ("C3H4", 40.0639, 1, False),
    MoleculeId.CH3: ("CH3", 15.035, 1, False),
    MoleculeId.CS2: ("CS2", 76.139, 4, True),
}

REGISTRY = {
    mid: Molecule(mid, name, mass, niso, linear)
    for mid, (name, mass, niso, linear) in _REGISTRY_DATA.items()
}

BY_NAME = {m.name: m for m in REGISTRY.values()}

# HITRAN/TIPS-2017 *global* isotopologue numbering -> (mol_id, local iso)
# for the CIRC gas set; used by tools/convert_tips.py to match the public
# TIPS-2017 distribution's per-isotopologue q<N>.txt file names.
GLOBAL_ISO_IDS = {
    **{gid: (1, gid) for gid in range(1, 7)},           # H2O 161..172
    **{gid: (2, gid - 6) for gid in range(7, 17)},      # CO2 626..838
    **{gid: (3, gid - 16) for gid in range(17, 22)},    # O3 666..676
    **{gid: (4, gid - 21) for gid in range(22, 27)},    # N2O 446..447
    **{gid: (5, gid - 26) for gid in range(27, 33)},    # CO 26..37
    **{gid: (6, gid - 32) for gid in range(33, 37)},    # CH4 211..312
    **{gid: (7, gid - 36) for gid in range(37, 40)},    # O2 66..67
    **{gid: (22, gid - 68) for gid in range(69, 71)},   # N2 44..45
}


def get(mol) -> Molecule:
    """Look up a molecule by id, enum, or name."""
    if isinstance(mol, Molecule):
        return mol
    if isinstance(mol, str):
        return BY_NAME[mol]
    return REGISTRY[MoleculeId(mol)]


class CfcId(enum.IntEnum):
    """Cross-section species ids (cfcs.h:32-67)."""

    CFC11 = 0
    CFC12 = 1
    CFC113 = 2
    CFC114 = 3
    CFC115 = 4
    HCFC22 = 5
    HCFC141b = 6
    HCFC142b = 7
    HFC23 = 8
    HFC125 = 9
    HFC134a = 10
    HFC143a = 11
    HFC152a = 12
    HFC227ea = 13
    HFC245fa = 14
    CCl4 = 15
    C2F6 = 16
    CF4 = 17
    CH2Cl2 = 18
    NF3 = 19
    SF6 = 20


NUM_CFCS = 21

CFC_NAMES = {
    CfcId.CFC11: "CFC-11",
    CfcId.CFC12: "CFC-12",
    CfcId.CFC113: "CFC-113",
    CfcId.CFC114: "CFC-114",
    CfcId.CFC115: "CFC-115",
    CfcId.HCFC22: "HCFC-22",
    CfcId.HCFC141b: "HCFC-141b",
    CfcId.HCFC142b: "HCFC-142b",
    CfcId.HFC23: "HFC-23",
    CfcId.HFC125: "HFC-125",
    CfcId.HFC134a: "HFC-134a",
    CfcId.HFC143a: "HFC-143a",
    CfcId.HFC152a: "HFC-152a",
    CfcId.HFC227ea: "HFC-227ea",
    CfcId.HFC245fa: "HFC-245fa",
    CfcId.CCl4: "CCl4",
    CfcId.C2F6: "C2F6",
    CfcId.CF4: "CF4",
    CfcId.CH2Cl2: "CH2Cl2",
    CfcId.NF3: "NF3",
    CfcId.SF6: "SF6",
}


class CiaId(enum.IntEnum):
    """Collision-induced-absorption species (collision_induced_absorption.h:36)."""

    N2 = 0
    O2 = 1


NUM_CIA_SPECIES = 2
MAX_NUM_CIAS = 3

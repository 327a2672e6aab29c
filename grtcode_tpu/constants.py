"""Physical constants shared across the framework.

Values match the reference implementation (NOAA-GFDL/GRTCODE) so that flux
outputs are comparable bit-for-bit at the formula level:
  - Planck constants: reference longwave/src/longwave.c:80-81
  - second radiation constant used in line strengths: gas-optics/src/kernels.c:75
  - Doppler constants: gas-optics/src/kernels.c:117-119
  - Curtis-Godson column constant: utilities/src/curtis_godson.c:27
  - CIA pressure-squared column factor inputs: gas-optics/src/kernels.c:611-615
"""

# Spectral radiance Planck constants, c1 = 2*h*c^2 [W cm4 m-2], c2 = h*c/k [cm K].
PLANCK_C1 = 1.1910429526245744e-8
PLANCK_C2 = 1.4387773538277202

# Second radiation constant (negated) used for line-strength T correction [cm K].
LINE_STRENGTH_C2 = -1.4387686

# Reference temperature for HITRAN line parameters [K].
TREF = 296.0

# sqrt(ln 2).
SQRT_LN2 = 0.832554611

# 1/sqrt(pi).
RSQRPI = 0.56418958

# Boltzmann constant [erg K-1] (CGS) used in Doppler half-width.
KB_CGS = 1.380658e-16

# Speed of light [cm s-1].
C_CGS = 2.99792458e10

# Avogadro's number used by the reference for molar mass -> molecular mass.
# (reference molecules.c:309 divides by 6.023e23, keep identical for parity).
AVOGADRO_REF = 6.023e23

# Integrated column number density per unit pressure difference [cm-2 atm-1]
# (Curtis-Godson, utilities/src/curtis_godson.c:27).
COLUMN_DENSITY_C = 2.147822334314468e25

# mb (hPa) -> atm conversion used by the reference (gas_optics.c:447).
MB_TO_ATM = 0.000986923

# Largest allowed argument of exp() in double precision paths
# (utilities/src/grtcode_config.h MAX_EXP_ARG).
MAX_EXP_ARG = 700.0
MAX_EXP_ARG_F32 = 80.0

# Longwave 4-stream secants / weights (longwave.c:159-168).
LW_STREAM_SECANTS = (
    -14.402613260847248,
    -3.0302159969901132,
    -1.4925584280108841,
    -1.0746123148178333,
)
LW_STREAM_WEIGHTS = (
    0.07587638482015649,
    0.676114979733751,
    1.3726594476601073,
    1.0169418413757783,
)

# Effective-Planck blending coefficients (Clough et al. 1992 eq. 16;
# longwave.c:108-109).
EFFECTIVE_PLANCK_A = 0.193
EFFECTIVE_PLANCK_B = 0.013

# Default line cutoff distance from line center [cm-1] (gas_optics.c:47).
DEFAULT_LINE_CUTOFF = 25.0
MIN_LINE_CUTOFF = 1.0
MAX_LINE_CUTOFF = 50.0

# Capacity / validation ceilings (grtcode_config.h:52-58).
MIN_WAVENUMBER = 1.0
MAX_WAVENUMBER = 50000.0
MIN_RESOLUTION = 0.001
MAX_RESOLUTION = 10.0
MIN_TEMPERATURE = 100.0
MAX_TEMPERATURE = 500.0
MAX_NUM_LAYERS = 200

# CIA column factor pieces (kernels.c:611-615): mean molecular mass of air [g],
# gravity [cm s-2], Boltzmann [g cm2 s-2 K-1], atm->barye.
CIA_AIR_MASS = 28.97 / 6.02214076e23
CIA_GRAVITY = 980.0
CIA_KB = 1.38064852e-16
CIA_ATM_TO_BARYE = 1.013e6
# [K atm-2 cm-5]
CIA_COLUMN_FACTOR = (CIA_ATM_TO_BARYE * CIA_ATM_TO_BARYE) / (
    CIA_KB * CIA_AIR_MASS * CIA_GRAVITY * 2.0
)

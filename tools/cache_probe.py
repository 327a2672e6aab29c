"""Detect result-caching in the axon runtime: identical vs varying args."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics.gas_optics import GasOptics
from grtcode_tpu.gas_optics.hitran import synthetic_catalog

grid = SpectralGrid(1.0, 3250.0, 0.1)
nlayers = 54
B = 4
rng = np.random.default_rng(0)
NL = 16384
vnn = np.sort(rng.uniform(grid.w0, grid.last, NL))
cat = synthetic_catalog(
    1, vnn, rng.uniform(1e-23, 1e-19, NL),
    yair=rng.uniform(0.02, 0.1, NL), yself=rng.uniform(0.05, 0.4, NL),
    en=rng.uniform(0.0, 2000.0, NL), n=rng.uniform(0.4, 0.8, NL),
    d=rng.uniform(-0.01, 0.01, NL))
gas = GasOptics(grid, line_chunk=1024)
gas.add_catalog(cat)

nlev = nlayers + 1
p_lev = jnp.asarray(np.linspace(0.01, 1013.0, nlev)[None, :] *
                    np.ones((B, 1)), jnp.float32)
t_levs = [jnp.asarray(np.linspace(210.0, 290.0, nlev)[None, :] +
                      rng.uniform(-5, 5, (B, nlev)), jnp.float32)
          for _ in range(6)]
x = jnp.asarray(rng.uniform(1e-6, 1e-2, (B, nlev)), jnp.float32)


@jax.jit
def step(p_lev, t_lev, x):
    return gas.optical_depth(p_lev, t_lev, {1: x}).sum()


float(step(p_lev, t_levs[0], x))

t0 = time.perf_counter()
outs = [step(p_lev, t_levs[0], x) for _ in range(6)]
vals = [float(o) for o in outs]
print(f"6 identical calls: {time.perf_counter()-t0:.3f}s  vals[0]={vals[0]:.4g}")

t0 = time.perf_counter()
outs = [step(p_lev, t, x) for t in t_levs]
vals = [float(o) for o in outs]
print(f"6 distinct calls:  {time.perf_counter()-t0:.3f}s  vals={np.ptp(vals):.3g}")

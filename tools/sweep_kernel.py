"""Sweep fused-kernel parameters (tile, ch, punroll, newton) on the TPU."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics.gas_optics import GasOptics
from grtcode_tpu.gas_optics import lines as lines_mod
from grtcode_tpu.gas_optics import pallas_kernels as pk
from grtcode_tpu.gas_optics.hitran import synthetic_catalog
from grtcode_tpu.utils import curtis_godson as cg
from grtcode_tpu import constants

B = 16
NL = 100000
grid = SpectralGrid(1.0, 3250.0, 0.1)
nlayers = 54

rng = np.random.default_rng(0)
vnn = np.sort(rng.uniform(grid.w0, grid.last, NL))
cat = synthetic_catalog(
    1, vnn, rng.uniform(1e-23, 1e-19, NL),
    yair=rng.uniform(0.02, 0.1, NL), yself=rng.uniform(0.05, 0.4, NL),
    en=rng.uniform(0.0, 2000.0, NL), n=rng.uniform(0.4, 0.8, NL),
    d=rng.uniform(-0.01, 0.01, NL))

nlev = nlayers + 1
p_lev = jnp.asarray(np.linspace(0.01, 1013.0, nlev)[None, :] *
                    np.ones((B, 1)), jnp.float32) * constants.MB_TO_ATM
t_lev = jnp.asarray(np.linspace(210.0, 290.0, nlev)[None, :] +
                    rng.uniform(-5, 5, (B, nlev)), jnp.float32)
x = jnp.asarray(rng.uniform(1e-6, 1e-2, (B, nlev)), jnp.float32)
rows = B * nlayers

ref_sum = None
for tile, ch, punroll, newton in [
        (64, 32, 4, 2),    # current default
        (32, 32, 4, 2),
        (128, 32, 4, 2),
        (64, 32, 8, 2),
        (64, 64, 4, 2),
        (64, 16, 4, 2),
        (32, 16, 4, 2),
        (128, 64, 8, 2),
]:
    gas = GasOptics(grid, line_chunk=1024, tile=tile, pallas_ch=ch)
    gas.add_catalog(cat)
    bound = gas.molecules[1]
    ranges = gas.chunk_ranges[1]
    near = gas.near_steps[1]
    hw = gas.near_hw[1]
    n2d = cg.number_densities(p_lev)
    pavg, tavg = cg.layer_pressures_temperatures(p_lev, t_lev)
    psavg, ns = cg.partial_pressures_and_densities(p_lev, x, n2d)
    prep = lines_mod.prepare(bound, grid, pavg.reshape(rows),
                             tavg.reshape(rows), psavg.reshape(rows),
                             tips=gas.tips)
    arrs = (prep.center_idx, prep.center_frac, prep.strength,
            prep.lorentz, prep.doppler)
    ns_r = ns.reshape(rows)

    @jax.jit
    def g(arrs, ns, chain, tile=tile, ch=ch, punroll=punroll,
          newton=newton, bound=bound, ranges=ranges, near=near, hw=hw):
        arrs = (arrs[0], arrs[1] + chain) + arrs[2:]
        p = lines_mod.PreparedLines(*arrs)
        tau = pk.accumulate_voigt_pallas(
            p, bound.c0, ns, ranges, num_wpoints=grid.n,
            dw=float(grid.dw), fsteps=gas._fsteps, near=near, hw=hw,
            tile=tile, ch=ch, num_global=grid.n, start=0,
            punroll=punroll, newton=newton)
        return tau.sum() * 1e-30

    t0 = time.perf_counter()
    s = float(g(arrs, ns_r, jnp.float32(0.0)))
    comp = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    chain = jnp.float32(0.0)
    for _ in range(n):
        chain = g(arrs, ns_r, chain)
    s = float(chain)
    dt = (time.perf_counter() - t0) / n
    if ref_sum is None:
        ref_sum = s
    drift = abs(s / ref_sum - 1.0)
    print(f"tile={tile:3d} ch={ch:2d} punroll={punroll} newton={newton}: "
          f"compile {comp:5.1f}s  run {dt*1e3:6.2f} ms  "
          f"(vs_ref {drift:.2e})", flush=True)

"""Compile+run time of the fused Pallas kernel alone (bench geometry)."""
import statistics
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
NL = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
grid = SpectralGrid(1.0, 3250.0, 0.1)
nlayers = 54

rng = np.random.default_rng(0)
vnn = np.sort(rng.uniform(grid.w0, grid.last, NL))
cat = synthetic_catalog(
    1, vnn, rng.uniform(1e-23, 1e-19, NL),
    yair=rng.uniform(0.02, 0.1, NL), yself=rng.uniform(0.05, 0.4, NL),
    en=rng.uniform(0.0, 2000.0, NL), n=rng.uniform(0.4, 0.8, NL),
    d=rng.uniform(-0.01, 0.01, NL))

gas = GasOptics(grid, line_chunk=1024)
gas.add_catalog(cat)
mol = 1
bound = gas.molecules[mol]

nlev = nlayers + 1
p_lev = jnp.asarray(np.linspace(0.01, 1013.0, nlev)[None, :] *
                    np.ones((B, 1)), jnp.float32) * constants.MB_TO_ATM
t_lev = jnp.asarray(np.linspace(210.0, 290.0, nlev)[None, :] +
                    rng.uniform(-5, 5, (B, nlev)), jnp.float32)
x = jnp.asarray(rng.uniform(1e-6, 1e-2, (B, nlev)), jnp.float32)
rows = B * nlayers
n2d = cg.number_densities(p_lev)
pavg, tavg = cg.layer_pressures_temperatures(p_lev, t_lev)
psavg, ns = cg.partial_pressures_and_densities(p_lev, x, n2d)
prep = lines_mod.prepare(bound, grid, pavg.reshape(rows),
                         tavg.reshape(rows), psavg.reshape(rows),
                         tips=gas.tips)
prep = jax.tree.map(jax.block_until_ready,
                    [prep.center_idx, prep.center_frac, prep.strength,
                     prep.lorentz, prep.doppler])
prep = lines_mod.PreparedLines(*prep)
ns = jax.block_until_ready(ns.reshape(rows))
ranges = gas.chunk_ranges[mol]
near = gas.near_steps[mol]


def run(include_near):
    @jax.jit
    def f(arrs, ns):
        prep = lines_mod.PreparedLines(*arrs)
        return pk.accumulate_voigt_pallas(
            prep, bound.c0, ns, ranges,
            num_wpoints=grid.n, dw=float(grid.dw), fsteps=gas._fsteps,
            near=near, hw=gas.near_hw[mol], tile=gas.tile,
            ch=gas.pallas_ch, num_global=grid.n, start=0,
            include_near=include_near)
    @jax.jit
    def g(arrs, ns, chain):
        arrs = (arrs[0], arrs[1] + chain) + arrs[2:]
        return f(arrs, ns).sum() * 1e-30
    arrs = (prep.center_idx, prep.center_frac, prep.strength,
            prep.lorentz, prep.doppler)
    t0 = time.perf_counter()
    s = float(g(arrs, ns, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    n = 10
    t0 = time.perf_counter()
    chain = jnp.float32(0.0)
    for _ in range(n):
        chain = g(arrs, ns, chain)
    s = float(chain)
    dt = (time.perf_counter() - t0) / n
    return compile_s, dt, s


for inc in (False, True):
    c, t, s = run(inc)
    print(f"include_near={inc}: compile {c:.1f}s, run {t*1e3:.2f} ms "
          f"(sum={s:.4g})", flush=True)

"""Bisect the full-pipeline vs staged-kernel time gap on TPU."""
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
from grtcode_tpu.gas_optics.optical_depth import accumulate_near_pointwise
from grtcode_tpu.gas_optics.hitran import synthetic_catalog
from grtcode_tpu.utils import curtis_godson as cg
from grtcode_tpu import constants

B = 4
grid = SpectralGrid(1.0, 3250.0, 0.1)
nlayers = 54


def catalog(mol_id, L, seed):
    rng = np.random.default_rng(seed)
    vnn = np.sort(rng.uniform(grid.w0, grid.last, L))
    return synthetic_catalog(
        mol_id, vnn, rng.uniform(1e-23, 1e-19, L),
        yair=rng.uniform(0.02, 0.1, L), yself=rng.uniform(0.05, 0.4, L),
        en=rng.uniform(0.0, 2000.0, L), n=rng.uniform(0.4, 0.8, L),
        d=rng.uniform(-0.01, 0.01, L))


gas = GasOptics(grid, line_chunk=1024)
gas.add_catalog(catalog(1, 16384, 0))
gas.add_catalog(catalog(2, 8192, 1))

rng = np.random.default_rng(7)
nlev = nlayers + 1
p_lev = jnp.asarray(np.linspace(0.01, 1013.0, nlev)[None, :] *
                    np.ones((B, 1)), jnp.float32)
t_lev = jnp.asarray(np.linspace(210.0, 290.0, nlev)[None, :] +
                    rng.uniform(-5, 5, (B, nlev)), jnp.float32)
vmr = jnp.asarray(rng.uniform(1e-6, 1e-2, (B, 2, nlev)), jnp.float32)
rows = B * nlayers


def timed(fn, *a, n=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return compile_s, statistics.median(ts)


def gas_path(p_lev, t_lev, vmr, mols, do_far=True, do_near=True):
    p2 = p_lev * constants.MB_TO_ATM
    t2 = t_lev
    n2d = cg.number_densities(p2)
    pavg2, tavg2 = cg.layer_pressures_temperatures(p2, t2)
    pavg, tavg = pavg2.reshape(rows), tavg2.reshape(rows)
    tau = jnp.zeros((rows, grid.n), jnp.float32)
    for i, mol_id in enumerate(mols):
        bound = gas.molecules[mol_id]
        x = vmr[:, i]
        psavg2, ns2 = cg.partial_pressures_and_densities(p2, x, n2d)
        psavg, ns = psavg2.reshape(rows), ns2.reshape(rows)
        prep = lines_mod.prepare(bound, grid, pavg, tavg, psavg,
                                 tips=gas.tips)
        near = gas.near_steps[mol_id]
        if do_far:
            ranges = gas.chunk_ranges[mol_id]
            tau = pk.accumulate_voigt_pallas(
                prep, bound.c0, ns, ranges,
                num_wpoints=grid.n, dw=float(grid.dw),
                fsteps=gas._fsteps, near=near, hw=gas.near_hw[mol_id],
                tile=gas.tile, ch=gas.pallas_ch,
                num_global=grid.n, tau0=tau, start=0,
                include_near=do_near)
        if do_near and not do_far:
            ranges = gas.point_ranges[mol_id]
            tau = accumulate_near_pointwise(
                prep.center_idx, prep.center_frac, prep.strength,
                prep.lorentz, prep.doppler, ns,
                jnp.asarray(ranges.lo), jnp.asarray(ranges.hi),
                num_wpoints=grid.n, dw=float(grid.dw), near=near,
                kpad=ranges.kpad, tau0=tau, start=0, num_global=grid.n)
    return tau


variants = {
    "h2o far only": ([1], True, False),
    "h2o near only": ([1], False, True),
    "h2o far+near": ([1], True, True),
    "both far only": ([1, 2], True, False),
    "both far+near": ([1, 2], True, True),
}
for name, (mols, f, nr) in variants.items():
    fn = jax.jit(lambda p, t, v, mols=mols, f=f, nr=nr:
                 gas_path(p, t, v, mols, f, nr))
    c, t = timed(fn, p_lev, t_lev, vmr)
    s = float(fn(p_lev, t_lev, vmr).sum())
    print(f"{name}: compile {c:.1f}s, {t*1e3:.1f} ms  (sum={s:.4g})",
          flush=True)


@jax.jit
def run_gas(p_lev, t_lev, vmr):
    return gas.optical_depth(p_lev, t_lev, {1: vmr[:, 0], 2: vmr[:, 1]})


c, t = timed(run_gas, p_lev, t_lev, vmr)
s = float(run_gas(p_lev, t_lev, vmr).sum())
print(f"gas.optical_depth: compile {c:.1f}s, {t*1e3:.1f} ms  (sum={s:.4g})",
      flush=True)

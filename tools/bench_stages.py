"""Stage-by-stage timing of the bench workload on the real TPU."""
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
from grtcode_tpu.solvers.longwave import longwave_fluxes
from grtcode_tpu.utils import curtis_godson as cg
from grtcode_tpu import constants

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
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
t_surf = t_lev[:, -1] + 1.5
vmr = jnp.asarray(rng.uniform(1e-6, 1e-2, (B, 2, nlev)), jnp.float32)
emis = jnp.ones((B, grid.n), jnp.float32)
w = grid.wavenumbers()
rows = B * nlayers

p2 = p_lev * constants.MB_TO_ATM
n2d = cg.number_densities(p2)
pavg2, tavg2 = cg.layer_pressures_temperatures(p2, t_lev)
pavg, tavg = pavg2.reshape(rows), tavg2.reshape(rows)


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


@jax.jit
def nullop(x):
    return x * 1.000001


_, t_null = timed(nullop, pavg)
print(f"null: {t_null*1e3:.1f} ms")

mol = 1
bound = gas.molecules[mol]
x1 = vmr[:, 0]
psavg2, ns2 = cg.partial_pressures_and_densities(p2, x1, n2d)
psavg, ns = psavg2.reshape(rows), ns2.reshape(rows)


@jax.jit
def run_prep(pavg, tavg, psavg):
    pr = lines_mod.prepare(bound, grid, pavg, tavg, psavg, tips=gas.tips)
    return pr.strength.sum() + pr.lorentz.sum() + pr.doppler.sum()


c, t = timed(run_prep, pavg, tavg, psavg)
print(f"prep(h2o): compile {c:.1f}s, {max(t-t_null,0)*1e3:.1f} ms")

prep = lines_mod.prepare(bound, grid, pavg, tavg, psavg, tips=gas.tips)
prep = jax.tree.map(jax.block_until_ready, prep.__dict__) and prep
near = gas.near_steps[mol]
ranges = gas.chunk_ranges[mol]


def run_far(prep, ns):
    return pk.accumulate_voigt_pallas(
        prep, bound.c0, ns, ranges, num_wpoints=grid.n,
        dw=float(grid.dw), fsteps=gas._fsteps, near=near,
        hw=gas.near_hw[mol], tile=gas.tile, ch=gas.pallas_ch,
        num_global=grid.n, start=0)


c, t = timed(run_far, prep, ns)
print(f"far pallas(h2o): compile {c:.1f}s, {max(t-t_null,0)*1e3:.1f} ms")

ranges = gas.point_ranges[mol]


def run_near(prep, ns):
    return accumulate_near_pointwise(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns, jnp.asarray(ranges.lo), jnp.asarray(ranges.hi),
        num_wpoints=grid.n, dw=float(grid.dw), near=near, kpad=ranges.kpad,
        start=0, num_global=grid.n)


c, t = timed(run_near, prep, ns)
print(f"near(h2o, kpad={ranges.kpad}): compile {c:.1f}s, "
      f"{max(t-t_null,0)*1e3:.1f} ms")

tau = run_far(prep, ns)
tau_b = tau.reshape(B, nlayers, grid.n)
t_layers = 0.5 * (t_lev[:, :-1] + t_lev[:, 1:])


@jax.jit
def run_lw(tau_b):
    return longwave_fluxes(tau_b, jnp.zeros_like(tau_b), t_surf, t_layers,
                           t_lev, emis, w)


c, t = timed(run_lw, tau_b)
print(f"lw solver: compile {c:.1f}s, {max(t-t_null,0)*1e3:.1f} ms")


@jax.jit
def run_gas(p_lev, t_lev, vmr):
    return gas.optical_depth(p_lev, t_lev, {1: vmr[:, 0], 2: vmr[:, 1]})


c, t = timed(run_gas, p_lev, t_lev, vmr)
print(f"full gas optics (2 mol): compile {c:.1f}s, "
      f"{max(t-t_null,0)*1e3:.1f} ms")

"""Isolate the near-pass slowdown inside a fused jit."""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics.gas_optics import GasOptics
from grtcode_tpu.gas_optics import lines as lines_mod
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

rng = np.random.default_rng(7)
nlev = nlayers + 1
p_lev = jnp.asarray(np.linspace(0.01, 1013.0, nlev)[None, :] *
                    np.ones((B, 1)), jnp.float32)
t_lev = jnp.asarray(np.linspace(210.0, 290.0, nlev)[None, :] +
                    rng.uniform(-5, 5, (B, nlev)), jnp.float32)
vmr1 = jnp.asarray(rng.uniform(1e-6, 1e-2, (B, nlev)), jnp.float32)
rows = B * nlayers
mol = 1
bound = gas.molecules[mol]
near = gas.near_steps[mol]
ranges = gas.point_ranges[mol]
lo_r = jnp.asarray(ranges.lo)
hi_r = jnp.asarray(ranges.hi)


def timed(fn, *a, n=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*a))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return c, statistics.median(ts)


def make_prep(p_lev, t_lev, vmr1):
    p2 = p_lev * constants.MB_TO_ATM
    n2d = cg.number_densities(p2)
    pavg2, tavg2 = cg.layer_pressures_temperatures(p2, t_lev)
    pavg, tavg = pavg2.reshape(rows), tavg2.reshape(rows)
    psavg2, ns2 = cg.partial_pressures_and_densities(p2, vmr1, n2d)
    psavg, ns = psavg2.reshape(rows), ns2.reshape(rows)
    prep = lines_mod.prepare(bound, grid, pavg, tavg, psavg, tips=gas.tips)
    return prep, ns


def near(prep, ns):
    return accumulate_near_pointwise(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns, lo_r, hi_r, num_wpoints=grid.n,
        dw=float(grid.dw), near=near_steps, kpad=ranges.kpad,
        start=0, num_global=grid.n)


near_steps = near.__defaults__ if False else gas.near_steps[mol]


def near_fn(prep, ns):
    return accumulate_near_pointwise(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns, lo_r, hi_r, num_wpoints=grid.n,
        dw=float(grid.dw), near=gas.near_steps[mol], kpad=ranges.kpad,
        start=0, num_global=grid.n)


# 1. prep as jit INPUT
def make_prep_tuple(p_lev, t_lev, vmr1):
    prep, ns = make_prep(p_lev, t_lev, vmr1)
    return (prep.center_idx, prep.center_frac, prep.strength,
            prep.lorentz, prep.doppler), ns


prep_t, ns_in = jax.jit(make_prep_tuple)(p_lev, t_lev, vmr1)
prep_in = lines_mod.PreparedLines(*prep_t)
jax.block_until_ready(prep_in.strength)
c, t = timed(jax.jit(lambda pt, ns: near_fn(
    lines_mod.PreparedLines(*pt), ns)), prep_t, ns_in)
print(f"near, prep as input: compile {c:.1f}s, {t*1e3:.1f} ms", flush=True)


# 2. prep inside jit, no barrier
@jax.jit
def fused(p_lev, t_lev, vmr1):
    prep, ns = make_prep(p_lev, t_lev, vmr1)
    return near_fn(prep, ns)


c, t = timed(fused, p_lev, t_lev, vmr1)
print(f"near, prep fused: compile {c:.1f}s, {t*1e3:.1f} ms", flush=True)


# 3. prep inside jit with optimization_barrier
@jax.jit
def barriered(p_lev, t_lev, vmr1):
    prep, ns = make_prep(p_lev, t_lev, vmr1)
    prep = lines_mod.PreparedLines(*jax.lax.optimization_barrier(
        (prep.center_idx, prep.center_frac, prep.strength,
         prep.lorentz, prep.doppler)))
    return near_fn(prep, ns)


c, t = timed(barriered, p_lev, t_lev, vmr1)
print(f"near, prep barriered: compile {c:.1f}s, {t*1e3:.1f} ms", flush=True)

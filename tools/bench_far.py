"""Microbenchmark: far-wing pass, jnp tiled vs Pallas kernel (real TPU).

Bench-scale workload: LW grid 1-3250 @0.1 (32491 pts), 24576 lines,
rows = 4 columns x 54 layers.  Not part of the test suite.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics import lines as lines_mod
from grtcode_tpu.gas_optics import pallas_kernels as pk
from grtcode_tpu.gas_optics.hitran import synthetic_catalog
from grtcode_tpu.gas_optics.optical_depth import accumulate_tiled

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 128
CH = int(sys.argv[3]) if len(sys.argv) > 3 else 128
NLINES = 24576
NLAYERS = 54

grid = SpectralGrid(1.0, 3250.0, 0.1)
rng = np.random.default_rng(0)
vnn = np.sort(rng.uniform(grid.w0, grid.last, NLINES))
cat = synthetic_catalog(
    1, vnn, rng.uniform(1e-23, 1e-19, NLINES),
    yair=rng.uniform(0.02, 0.1, NLINES),
    yself=rng.uniform(0.05, 0.4, NLINES),
    en=rng.uniform(0.0, 2000.0, NLINES), n=rng.uniform(0.4, 0.8, NLINES),
    d=rng.uniform(-0.01, 0.01, NLINES))
bound = lines_mod.bind_to_grid(cat, grid)
fsteps = 250
near = 4
R = B * NLAYERS

prep_np = rng.random((5, R, NLINES), dtype=np.float32)
prep = lines_mod.PreparedLines(
    center_idx=jnp.asarray(np.broadcast_to(bound.c0, (R, NLINES))),
    center_frac=jnp.asarray(np.broadcast_to(bound.frac0, (R, NLINES))),
    strength=jnp.asarray(prep_np[0] * 1e-3),
    lorentz=jnp.asarray(prep_np[1] * 0.1 + 0.01),
    doppler=jnp.asarray(prep_np[2] * 0.005 + 0.001))
ns = jnp.asarray(rng.random(R, dtype=np.float32) * 1e22)

nw = -(-grid.n // TILE) * TILE

# --- Pallas ---
ranges = pk.build_chunk_ranges(
    bound.c0, grid.n, fsteps, TILE, CH, near_hw=near + 2)
print(f"tiles={len(ranges.lo)} lpad={ranges.lpad} "
      f"mean_chunks={ranges.nchunks.mean():.1f}", file=sys.stderr)


@jax.jit
def run_pallas(prep_ci, prep_cf, s, lor, dop, ns):
    p = lines_mod.PreparedLines(prep_ci, prep_cf, s, lor, dop)
    return pk.accumulate_voigt_pallas(
        p, bound.c0, ns, ranges, num_wpoints=nw,
        dw=float(grid.dw), fsteps=fsteps, near=near, hw=near + 2,
        tile=TILE, ch=CH, num_global=grid.n, start=0,
        include_near=False)


tiles = lines_mod.build_tiles(bound, grid.n, fsteps, tile=TILE,
                              lane_multiple=128)
tl = jnp.asarray(tiles.tile_lines)
print(f"jnp tiles lmax={tiles.lmax}", file=sys.stderr)


@jax.jit
def run_jnp(prep_ci, prep_cf, s, lor, dop, ns):
    return accumulate_tiled(
        prep_ci, prep_cf, s, lor, dop, ns, tl,
        num_wpoints=nw, dw=float(grid.dw), fsteps=fsteps, tile=TILE,
        lchunk=128, start=0, num_global=grid.n, exclude_within=near,
        far_kernel=True)


args = (prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns)

for name, fn in (("pallas", run_pallas), ("jnp", run_jnp)):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    print(f"{name} compile+run: {time.perf_counter()-t0:.2f}s",
          file=sys.stderr)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    evals = R * NLINES * (2 * fsteps + 1)
    print(f"{name}: {dt*1e3:.1f} ms/step  {evals/dt/1e9:.2f} Geval/s "
          f"sum={float(out.sum()):.6e}")

# Robust timing over the axon tunnel: block per call, median of N,
# subtract median null-op round-trip.
import statistics

@jax.jit
def nullop(s):
    return s * 1.000001

def timed(fn, *a, n=7):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)

jax.block_until_ready(nullop(prep.strength))
t_null = timed(nullop, prep.strength)
print(f"nullop blocked: {t_null*1e3:.1f} ms")
evals = R * NLINES * (2 * fsteps + 1)
for name, fn in (("pallas", run_pallas), ("jnp", run_jnp)):
    t = timed(fn, *args)
    dt = max(t - t_null, 1e-9)
    print(f"{name}: {t*1e3:.1f} ms raw, {dt*1e3:.1f} ms net, "
          f"{evals/dt/1e9:.2f} Geval/s")

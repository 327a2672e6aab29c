"""Profile the headline bench step and print per-op time breakdown."""
import glob
import gzip
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from grtcode_tpu.spectral import SpectralGrid
from grtcode_tpu.gas_optics.gas_optics import GasOptics
from grtcode_tpu.gas_optics.hitran import synthetic_catalog
from grtcode_tpu.solvers.longwave import longwave_fluxes

grid = SpectralGrid(1.0, 3250.0, 0.1)
nlayers = 54
B = 4


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


@jax.jit
def step(p_lev, t_lev, t_surf, vmr, emis):
    tau = gas.optical_depth(p_lev, t_lev, {1: vmr[:, 0], 2: vmr[:, 1]})
    t_layers = 0.5 * (t_lev[:, :-1] + t_lev[:, 1:])
    return longwave_fluxes(tau, jnp.zeros_like(tau), t_surf,
                           t_layers, t_lev, emis, w)


args = (p_lev, t_lev, t_surf, vmr, emis)
jax.block_until_ready(step(*args))
t0 = time.perf_counter()
for _ in range(3):
    out = step(*args)
jax.block_until_ready(out)
print(f"3 steps: {time.perf_counter() - t0:.3f}s", flush=True)

with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        out = step(*args)
    jax.block_until_ready(out)

# Parse the trace: sum durations per op name on the device track.
files = sorted(glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True))
path = files[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
# Find device-lane pids (TPU core tracks).
name_by_pid = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        name_by_pid[e["pid"]] = e["args"].get("name", "")
device_pids = {p for p, n in name_by_pid.items()
               if "TPU" in n or "/device" in n.lower()}
tot = {}
for e in events:
    if e.get("ph") == "X" and e.get("pid") in device_pids:
        tot[e["name"]] = tot.get(e["name"], 0.0) + e.get("dur", 0.0)
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{us/3000:9.3f} ms  {name[:110]}")

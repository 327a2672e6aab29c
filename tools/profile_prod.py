"""Profile the production-scale bench step; print per-op device time."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

bench.enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

lw_gas, sw_gas, solar, batch, B, nlayers = bench.build("--smoke" in sys.argv)
step = bench.make_step(lw_gas, sw_gas, solar)
args = (batch["p_lev"], batch["t_lev"], batch["vmr"], batch["cfc_vmr"],
        batch["cia_vmr"], batch["mu"], batch["tsi"])
t0 = time.perf_counter()
out = step(*args, jnp.float32(0.0))
float(out[4])
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

NIT = 2
t0 = time.perf_counter()
chain = jnp.float32(0.0)
with jax.profiler.trace("/tmp/jaxtrace_prod"):
    for _ in range(NIT):
        out = step(*args, chain)
        chain = out[4]
    float(chain)
print(f"{NIT} steps: {time.perf_counter() - t0:.3f}s", flush=True)

files = sorted(glob.glob("/tmp/jaxtrace_prod/**/*.trace.json.gz",
                         recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
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
total_us = sum(tot.values())
print(f"total device time: {total_us/1000/NIT:.1f} ms/step over "
      f"{len(tot)} op names")
for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{us/1000/NIT:9.3f} ms  {name[:110]}")

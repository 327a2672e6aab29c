"""Prewarm the persistent compile cache for the production bench step.

Round-4 finding: a warm-cache bench start still costs ~90-130 s, because
the cache IS hit but the ~83 MB serialized jit step must deserialize and
load onto the device through the remote-TPU tunnel; the cold cost
(~300 s) adds the XLA+Mosaic compile itself.  This tool (VERDICT r4 #7):

  1. traces + compiles the standard bench signatures into the repo's
     ``.jax_cache`` WITHOUT running a step (so a production job's first
     run pays only the deserialize+load floor, never the compile), and
  2. reports the measured trace / compile(or cache-deserialize) / first
     execution split, so the warm-start floor is documented with data
     instead of folklore.

Run:  python tools/prewarm_cache.py [--batch 16 32] [--method line_sample]
      (TPU-backed; add --execute to also time the first device step)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def prewarm(batch: int, method: str, lw_res: float,
            execute: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import build, make_step

    lw_gas, sw_gas, solar, batch_d, B, nlayers = build(
        batch_size=batch, lw_method=method, lw_res=lw_res)
    lw_blocks = max(1, -(-lw_gas.grid.n // 32768)) \
        if lw_gas.grid.n > 40000 else 1
    step = make_step(lw_gas, sw_gas, solar, lw_blocks=lw_blocks)

    args = (batch_d["p_lev"], batch_d["t_lev"], batch_d["vmr"],
            batch_d["cfc_vmr"], batch_d["cia_vmr"], batch_d["mu"],
            batch_d["tsi"], jnp.float32(0.0))
    t0 = time.perf_counter()
    lowered = step.lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    out = {"batch": batch, "method": method, "trace_s": round(t_trace, 1),
           "compile_or_deserialize_s": round(t_compile, 1)}
    if execute:
        t0 = time.perf_counter()
        r = compiled(*args)
        float(jax.device_get(r[4]))
        out["first_exec_s"] = round(time.perf_counter() - t0, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[16, 32])
    ap.add_argument("--method", default="line_sample")
    ap.add_argument("--lw-res", type=float, default=0.1)
    ap.add_argument("--execute", action="store_true",
                    help="also run the first step to time the device "
                         "load/execute floor")
    opts = ap.parse_args()

    from bench import enable_compile_cache

    enable_compile_cache()
    import json

    for b in opts.batch:
        info = prewarm(b, opts.method, opts.lw_res, opts.execute)
        print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main()

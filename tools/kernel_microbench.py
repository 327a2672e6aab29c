"""Microbenchmark the fused Voigt kernel in isolation on the TPU.

Times ONE GasOptics.optical_depth (a single LW-band molecule set at
production scale) so kernel-layout/tiling experiments iterate in ~1-2 min
instead of the full bench's ~2 min compile + both bands.  Not part of the
test suite; a tuning tool.

  python tools/kernel_microbench.py --layout points --tile 64 --ch 32
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default=None,
                    help="far layout: points | lines (default: env/default)")
    ap.add_argument("--tile", type=int, default=64)
    ap.add_argument("--ch", type=int, default=32)
    ap.add_argument("--lines", type=int, default=200_000)
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-near", action="store_true",
                    help="far wings only (include_near=False)")
    ap.add_argument("--method", default="line_sample",
                    choices=["line_sample", "wavenumber_sweep",
                             "line_sweep"])
    ap.add_argument("--bin-group", type=int, default=8,
                    help="bins per bin-kernel grid step (multiple of 8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import enable_compile_cache  # noqa: E402

    enable_compile_cache()
    from grtcode_tpu.gas_optics.gas_optics import GasOptics
    from grtcode_tpu.gas_optics.hitran import synthetic_catalog
    from grtcode_tpu.spectral import SpectralGrid

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    grid = SpectralGrid(1.0, 3250.0, 0.1)
    B, nlayers = args.B, 54
    nlev = nlayers + 1
    L = args.lines
    rng = np.random.default_rng(0)
    cat = synthetic_catalog(
        1, np.sort(rng.uniform(grid.w0, grid.last, L)),
        10.0 ** rng.uniform(-23.5, -19.5, L),
        yair=rng.uniform(0.02, 0.11, L), yself=rng.uniform(0.05, 0.4, L),
        en=rng.uniform(0.0, 2800.0, L), n=rng.uniform(0.35, 0.85, L),
        d=rng.uniform(-0.01, 0.01, L))

    kw = {}
    if args.layout:
        kw["pallas_layout"] = args.layout
    gas = GasOptics(grid, line_chunk=1024, tile=args.tile,
                    pallas_ch=args.ch, method=("tiled" if args.method ==
                    "line_sample" else args.method),
                    bin_group=args.bin_group, **kw)
    gas.add_catalog(cat)

    p = np.linspace(0.01, 1013.0, nlev)[None] * np.ones((B, 1))
    t = np.linspace(210.0, 290.0, nlev)[None] + rng.uniform(-5, 5, (B, nlev))
    vmr = {1: np.full((B, nlev), 3e-3)}

    @jax.jit
    def f(p_, t_, v_, chain):
        tau = gas.optical_depth(p_, t_ + chain, v_)
        return tau[0, 0, 0] * 1e-30

    pj = jnp.asarray(p, jnp.float32)
    tj = jnp.asarray(t, jnp.float32)
    vj = {1: jnp.asarray(vmr[1], jnp.float32)}
    t0 = time.perf_counter()
    chain = jnp.float32(0.0)
    chain = f(pj, tj, vj, chain)
    float(chain)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    chain = jnp.float32(0.0)
    for _ in range(args.iters):
        chain = f(pj, tj, vj, chain)
    float(chain)
    dt = (time.perf_counter() - t0) / args.iters
    pts = B * nlayers * grid.n
    print(f"method={args.method} layout={args.layout or gas.pallas_layout} "
          f"tile={args.tile} G={args.bin_group} "
          f"ch={args.ch}: {dt * 1e3:.1f} ms/step, "
          f"{pts / dt / 1e6:.1f} M pts/s")


if __name__ == "__main__":
    main()

"""Compiled-Pallas vs jnp parity on REAL TPU hardware.

tests/test_pallas.py proves the fused kernel's math in interpreter mode on
CPU; this script closes the remaining gap (VERDICT r2): the *compiled*
Mosaic kernel on an actual TPU chip must match the jnp ground-truth path
value-for-value on a dense catalog, including spectral block offsets.

Run:  python tools/tpu_parity_check.py        (needs the TPU backend)
Exits 0 and prints PARITY OK on success; exits 2 if no TPU is attached
(callers treat that as skip).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RTOL = 2e-6
ATOL = 1e-12


def main() -> int:
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"no TPU (backend={jax.default_backend()})", file=sys.stderr)
        return 2
    import jax.numpy as jnp
    from grtcode_tpu.gas_optics.gas_optics import GasOptics
    from grtcode_tpu.gas_optics.hitran import synthetic_catalog
    from grtcode_tpu.spectral import SpectralGrid

    grid = SpectralGrid(1.0, 200.0, 0.1)      # 1991 points, dense lines
    L, B, nlev = 2000, 2, 9
    rng = np.random.default_rng(42)
    cat = synthetic_catalog(
        1, np.sort(rng.uniform(grid.w0, grid.last, L)),
        10.0 ** rng.uniform(-22.0, -19.0, L),
        yair=rng.uniform(0.02, 0.11, L), yself=rng.uniform(0.05, 0.4, L),
        en=rng.uniform(0.0, 2000.0, L), n=rng.uniform(0.35, 0.85, L),
        d=rng.uniform(-0.01, 0.01, L))

    p = np.linspace(0.01, 1013.0, nlev)[None] * np.ones((B, 1))
    t = np.linspace(220.0, 290.0, nlev)[None] + rng.uniform(-3, 3, (B, nlev))
    vmr = {1: np.full((B, nlev), 3e-3)}

    def tau(pallas_mode, block=None):
        gas = GasOptics(grid, line_chunk=256, pallas=pallas_mode)
        gas.add_catalog(cat)
        kw = {}
        if block is not None:
            kw = dict(block_start=block[0], block_size=block[1])
        f = jax.jit(lambda p_, t_, v_: gas.optical_depth(p_, t_, v_, **kw))
        return np.asarray(jax.block_until_ready(
            f(jnp.asarray(p, jnp.float32), jnp.asarray(t, jnp.float32),
              {1: jnp.asarray(vmr[1], jnp.float32)})))

    def tau_bins(pallas_mode, block=None):
        gas = GasOptics(grid, line_chunk=256, pallas=pallas_mode,
                        method="wavenumber_sweep")
        gas.add_catalog(cat)
        kw = {}
        if block is not None:
            kw = dict(block_start=block[0], block_size=block[1])
        f = jax.jit(lambda p_, t_, v_: gas.optical_depth(p_, t_, v_, **kw))
        return np.asarray(jax.block_until_ready(
            f(jnp.asarray(p, jnp.float32), jnp.asarray(t, jnp.float32),
              {1: jnp.asarray(vmr[1], jnp.float32)})))

    failures = 0
    for block in (None, (0, 512), (512, 512), (1536, 512)):
        on = tau("on", block)
        off = tau("off", block)
        denom = np.maximum(np.abs(off), ATOL / RTOL)
        rel = (np.abs(on - off) / denom).max()
        label = "full grid" if block is None else f"block {block}"
        ok = rel <= RTOL
        print(f"{label}: max rel diff {rel:.3e} "
              f"{'ok' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1

    # Bin-method (wavenumber_sweep) compiled kernel vs jnp ground truth.
    # Block starts must align to the Pallas path's bin-group quantum
    # (ppb * bin_group = 88 here); the relative tolerance is wider than
    # line_sample's because the coarse-wing sums feed the quadratic
    # interpolation, which amplifies pairwise/approx-recip rounding.
    for block in (None, (0, 880), (880, 880)):
        on = tau_bins("on", block)
        off = tau_bins("off", block)
        denom = np.maximum(np.abs(off), 1e-7)
        rel = (np.abs(on - off) / denom).max()
        label = ("bins full grid" if block is None
                 else f"bins block {block}")
        ok = rel <= 2e-5
        print(f"{label}: max rel diff {rel:.3e} "
              f"{'ok' if ok else 'FAIL'}", flush=True)
        failures += 0 if ok else 1
    if failures:
        print(f"PARITY FAILED ({failures} cases)")
        return 1
    print("PARITY OK: compiled Pallas == jnp ground truth on TPU")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Line-by-line optical-depth accumulation (the hottest kernel).

TPU-native re-architecture of the reference's ``line_sample`` method
(gas-optics/src/kernels.c:410-465 and its CUDA twin cuda_kernels.c) — the
production method used by the driver (framework/src/driver.c:618).

The reference scatters each line's +-cutoff window into tau with
``omp atomic`` / ``atomicAdd``.  TPUs have no atomics; instead each line
evaluates its Voigt profile over a *static* window of ``2*fsteps+1`` grid
points and the windows are combined with one batched scatter-add
(``tau.at[idx].add``) per line chunk, which XLA lowers to a sorted
segmented reduction.  Lines stream through a ``lax.scan`` so peak memory is
``nlayers * chunk * window`` regardless of catalog size.

A fused Pallas kernel for the same computation lives in
:mod:`grtcode_tpu.gas_optics.pallas_kernels`; this module is the portable
reference path and the numerical ground truth.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import constants
from .hitran import STRENGTH_SCALE
from .lines import PreparedLines
from .voigt import voigt_line_shape


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("num_wpoints", "dw", "fsteps", "chunk"))
def accumulate_line_sample(center_idx, center_frac, strength, lorentz, doppler,
                           ns, *, num_wpoints: int, dw: float, fsteps: int,
                           chunk: int = 1024, tau0=None):
    """Accumulate per-line Voigt contributions into tau.

    Args:
      center_idx: (nlayers, L) int32 nearest grid index of shifted center.
      center_frac: (nlayers, L) f32 fractional grid offset of center.
      strength: (nlayers, L) f32, scaled by STRENGTH_SCALE.
      lorentz, doppler: (nlayers, L) f32 half-widths [cm-1].
      ns: (nlayers,) species column density [cm-2].
      num_wpoints, dw: spectral grid size / resolution.
      fsteps: half-window in grid points (= ceil(cutoff/dw)).
      chunk: lines per scan step (static).
      tau0: optional (nlayers, num_wpoints) to accumulate into.

    Returns (nlayers, num_wpoints) optical depth.
    """
    nlayers, L = strength.shape
    Lp = _round_up(max(L, 1), chunk)
    pad = Lp - L
    if pad:
        center_idx = jnp.pad(center_idx, ((0, 0), (0, pad)),
                             constant_values=-(10 ** 9))
        center_frac = jnp.pad(center_frac, ((0, 0), (0, pad)))
        strength = jnp.pad(strength, ((0, 0), (0, pad)))
        lorentz = jnp.pad(lorentz, ((0, 0), (0, pad)), constant_values=1e-3)
        doppler = jnp.pad(doppler, ((0, 0), (0, pad)), constant_values=1e-3)

    nchunks = Lp // chunk
    # (nchunks, nlayers, chunk) so scan slices the leading axis.
    def to_chunks(a):
        return a.reshape(nlayers, nchunks, chunk).transpose(1, 0, 2)

    xs = tuple(to_chunks(a) for a in
               (center_idx, center_frac, strength, lorentz, doppler))

    offsets = jnp.arange(-fsteps, fsteps + 1, dtype=jnp.int32)  # (G,)
    offs_f = offsets.astype(jnp.float32)
    ns_scaled = (jnp.asarray(ns, jnp.float32) / STRENGTH_SCALE)[:, None, None]

    if tau0 is None:
        tau0 = jnp.zeros((nlayers, num_wpoints), jnp.float32)

    def body(tau, args):
        cidx, cfrac, s, lor, dop = args                      # (nlayers, C)
        f = cidx[..., None] + offsets[None, None, :]         # (nlayers, C, G)
        # Offset from line center, exact in f32 (split representation).
        dv = (offs_f[None, None, :] - cfrac[..., None]) * jnp.float32(dw)
        k = voigt_line_shape(dv, lor[..., None], dop[..., None])
        valid_center = (cidx >= 0) & (cidx < num_wpoints)    # kernels.c:433
        in_bounds = (f >= 0) & (f < num_wpoints)
        vals = jnp.where(valid_center[..., None] & in_bounds,
                         s[..., None] * ns_scaled * k, 0.0)
        idx = jnp.clip(f, 0, num_wpoints - 1)
        tau = jax.vmap(lambda t, i, v: t.at[i].add(v))(
            tau, idx.reshape(nlayers, -1), vals.reshape(nlayers, -1))
        return tau, None

    tau, _ = jax.lax.scan(body, tau0, xs)
    return tau


def optical_depth_line_sample(prep: PreparedLines, ns, grid, *,
                              cutoff: float = constants.DEFAULT_LINE_CUTOFF,
                              chunk: int = 1024, tau0=None):
    """Convenience wrapper taking PreparedLines + SpectralGrid."""
    fsteps = int(math.ceil(cutoff / grid.dw))
    return accumulate_line_sample(
        prep.center_idx, prep.center_frac, prep.strength, prep.lorentz,
        prep.doppler, ns, num_wpoints=grid.n, dw=float(grid.dw),
        fsteps=fsteps, chunk=chunk, tau0=tau0)

"""Fused Pallas TPU kernel for Voigt optical-depth accumulation.

This is the TPU-native expression of the reference's hottest kernel — the
line -> grid optical-depth scatter (gas-optics/src/kernels.c:410-465,
cuda_kernels.c with atomicAdd).  The jnp formulation in
:mod:`grtcode_tpu.gas_optics.optical_depth` (accumulate_tiled +
accumulate_near_pointwise) is the numerical ground truth; this kernel
computes the identical accumulation in ONE pass with explicit VMEM
residency and double-buffered HBM DMA:

  * grid = spectral tiles; tile t owns ``tile`` consecutive grid points.
  * Lines are sorted by center, so the lines reaching tile t form one
    contiguous index range [lo_t, lo_t + CH * nchunks_t) — streamed from
    HBM in CH-line chunks with two overlapping DMAs (no gather).
  * **Far wings** (|grid offset from line center| > near): Humlicek
    regions 0/1 + pure-Lorentz.  All per-(row, line) factors that don't
    depend on the grid point are precomputed once by XLA into a
    (NCH, lines, rows) channel stack.  Chunks are host-classified into
    three zones per tile (build_chunk_ranges):
      - *core-adjacent* [m0l, m0h): some line is within region0_hw of the
        tile — full region-0/1 select + window/near masks (~25 VPU ops).
      - *interior* [fll, flh) u [frl, frh): every line covers the whole
        tile, is beyond region0_hw (so |x| >= 124 => pure region 0 for
        every y, lines.region0_halfwidth), and cannot shift off the grid
        — K = snum0/(xq+yq) with NO masks (~12 VPU ops).  This is the
        bulk of the work: region0_hw is ~10 grid points at LW resolution
        while the line_sample window is ~250.
      - *edge*: pure region 0 + the window mask only (~17 ops).
    The zone split is bit-exact: it only skips selects whose outcome is
    host-provably constant.
  * **Near core** (|offset| <= near): the full RFM Humlicek region
    scheme (regions 0-4) evaluated at a static window of ``2*hw + 1``
    offsets around each line's *unshifted* grid index c0, then placed
    into the tile with a one-hot (lines x points) MXU matmul — the
    TPU-native replacement for the reference's atomicAdd scatter.  Only
    the few chunks whose line centers fall inside the tile run this
    branch (host-precomputed chunk sub-ranges).  hw = near + the
    pressure-shift margin, so the |g - cidx| <= near mask (cidx = c0 +
    per-row rounding of the shifted center) is always covered.
  * Layout: lines on sublanes, rows (column x layer) on lanes; the
    output is written (points, rows) and transposed once outside.

Rows are the flattened (batch, layer) axis — batching columns makes the
kernel denser instead of replaying it under vmap.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants
from .hitran import STRENGTH_SCALE

_PI = 3.14159265358979323846
_RSQRPI = 0.56418958354775628694  # 1/sqrt(pi)

# 6-term CPF expansion coefficients (RFM_voigt.c:156-161).
_C6 = (1.0117281, -0.75197147, 0.012557727, 0.010022008, -0.00024206814,
       0.00000050084806)
_S6 = (1.393237, 0.23115241, -0.15535147, 0.0062183662, 0.000091908299,
       -0.00000062752596)
_T6 = (0.31424038, 0.94778839, 1.5976826, 2.2795071, 3.0206370, 3.8897249)

# Channel indices in the (NCH, L, R) stack.
NCH = 10
(CH_C0, CH_FTOT, CH_RW, CH_SNUM0, CH_YQ, CH_XLIM0, CH_A0, CH_D0,
 CH_D2, CH_Y) = range(NCH)

# Per-channel pad values keeping padded lines inert AND division-safe
# (c0 = -1e9 fails every mask; denominators stay >= 1).
_PAD_VALS = (-1e9, 0.0, 1.0, 0.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0)

LANE = 128
SUBLANE = 8
PUNROLL = 4  # points per inner-loop iteration


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def far_channels(prep, c0, ns, *, dw: float, num_global: int, lpad: int,
                 rpad: int, keep_offgrid: bool = False):
    """Precompute the (NCH, lpad, rpad) channel stack (XLA, fused).

    Args:
      prep: PreparedLines with (rows, L) arrays.
      c0: (L,) int32 unshifted nearest grid index (GridLines.c0).
      ns: (rows,) species column density.

    Channel math mirrors :func:`grtcode_tpu.gas_optics.voigt.voigt_far_wing`
    exactly: Humlicek regions 0/1 with the pure-Lorentz limit folded in by
    forcing region 0 (xlim0 = -1) and substituting the unclamped y.  The
    near-core branch additionally uses the clamped y (CH_Y) and the
    unrounded center split (CH_C0 global index + CH_FTOT fractional
    offset, grid units).
    """
    center_idx, center_frac = prep.center_idx, prep.center_frac
    strength, lorentz, doppler = prep.strength, prep.lorentz, prep.doppler
    rows, L = strength.shape
    s = strength * (jnp.asarray(ns, jnp.float32) / STRENGTH_SCALE)[:, None]
    repwid = jnp.float32(constants.SQRT_LN2) / doppler
    y_true = repwid * lorentz
    lor = y_true >= 70.55
    y = jnp.minimum(y_true, 70.0)
    yq = y * y
    c_scale = jnp.float32(constants.RSQRPI * constants.RSQRPI) * repwid
    snum0 = s * jnp.where(lor, repwid * y_true / _PI, c_scale * y)
    yq_ch = jnp.where(lor, y_true * y_true, yq)
    xlim0 = jnp.where(lor, -1.0, 15100.0 + y * (40.0 - y * 3.6))
    a0 = yq + 0.5
    d0 = a0 * a0
    d2 = yq + yq - 1.0
    c0b = jnp.broadcast_to(jnp.asarray(c0, jnp.int32)[None, :], (rows, L))
    if keep_offgrid:
        # Bin-method use: line validity is decided by host index ranges,
        # not grid bounds — lines just outside the band still contribute
        # wings (kernels.c brackets on centers, not grid coverage).
        c0_f = c0b.astype(jnp.float32)
    else:
        valid = (center_idx >= 0) & (center_idx < num_global)
        c0_f = jnp.where(valid, c0b.astype(jnp.float32), -1e9)
    # Unrounded shifted center, relative to c0 (grid units): the rounding
    # adjustment adj = center_idx - c0 is a small integer, exact in f32.
    ftot = center_frac + (center_idx - c0b).astype(jnp.float32)
    rw = jnp.float32(dw) * repwid

    chans = [c0_f, ftot, rw, snum0, yq_ch, xlim0, a0, d0, d2, y]
    out = []
    for ch, pad_val in zip(chans, _PAD_VALS):
        ch = jnp.pad(ch, ((0, rpad - rows), (0, lpad - L)),
                     constant_values=pad_val)
        out.append(ch.T)                       # (lpad, rpad)
    return jnp.stack(out)                      # (NCH, lpad, rpad)


def _humlicek_y_coeffs(y, yq, xlim0):
    """Per-line (xi-independent) Humlicek region coefficients
    (RFM_voigt.c:108-277), hoisted out of the near-window offset loop."""
    xlim1 = jnp.where(y >= 8.425, 0.0,
                      jnp.sqrt(jnp.maximum(164.0 - y * (4.3 + y * 1.8),
                                           0.0)))
    xlim2 = 6.8 - y
    xlim3 = 2.4 * y
    xlim4 = 18.1 * y + 1.65
    tiny_y = y <= 0.000001
    xlim0_s = jnp.sqrt(jnp.maximum(xlim0, 0.0))
    xlim1 = jnp.where(tiny_y, xlim0_s, xlim1)
    xlim2 = jnp.where(tiny_y, xlim0_s, xlim2)

    h0 = 0.5625 + yq * (4.5 + yq * (10.5 + yq * (6.0 + yq)))
    h2 = -4.5 + yq * (9.0 + yq * (6.0 + yq * 4.0))
    h4 = 10.5 - yq * (6.0 - yq * 6.0)
    h6 = -6.0 + yq * 4.0
    e0 = 1.875 + yq * (8.25 + yq * (5.5 + yq))
    e2 = 5.25 + yq * (1.0 + yq * 3.0)
    e4 = 0.75 * h6

    z0 = 272.1014 + y * (1280.829 + y * (2802.870 + y * (3764.966
         + y * (3447.629 + y * (2256.981 + y * (1074.409 + y * (369.1989
         + y * (88.26741 + y * (13.39880 + y)))))))))
    z2 = 211.678 + y * (902.3066 + y * (1758.336 + y * (2037.310
         + y * (1549.675 + y * (793.4273 + y * (266.2987
         + y * (53.59518 + y * 5.0)))))))
    z4 = 78.86585 + y * (308.1852 + y * (497.3014 + y * (479.2576
         + y * (269.2916 + y * (80.39278 + y * 10.0)))))
    z6 = 22.03523 + y * (55.02933 + y * (92.75679 + y * (53.59518
         + y * 10.0)))
    z8 = 1.496460 + y * (13.39880 + y * 5.0)
    p0 = 153.5168 + y * (549.3954 + y * (919.4955 + y * (946.8970
         + y * (662.8097 + y * (328.2151 + y * (115.3772 + y * (27.93941
         + y * (4.264678 + y * 0.3183291))))))))
    p2 = -34.16955 + y * (-1.322256 + y * (124.5975 + y * (189.7730
         + y * (139.4665 + y * (56.81652 + y * (12.79458
         + y * 1.2733163))))))
    p4 = 2.584042 + y * (10.46332 + y * (24.01655 + y * (29.81482
         + y * (12.79568 + y * 1.9099744))))
    p6 = -0.07272979 + y * (0.9377051 + y * (4.266322 + y * 1.273316))
    p8 = 0.0005480304 + y * 0.3183291

    ypy0 = y + 1.5
    ypy0q = ypy0 * ypy0
    yf = y + 3.0
    return (xlim0_s, xlim1, xlim2, xlim3, xlim4, h0, h2, h4, h6, e0, e2,
            e4, z0, z2, z4, z6, z8, p0, p2, p4, p6, p8, ypy0, ypy0q, yf)


def _humlicek_eval(xi, xq, y, yq, a0, d0, d2, coeffs, rcp=None):
    """Full RFM Humlicek region scheme K(x, y) given hoisted coefficients.

    Matches grtcode_tpu.gas_optics.voigt.humlicek_k for y < 70.55; callers
    handle the pure-Lorentz limit separately.  ``rcp`` substitutes a fast
    ~1-ulp reciprocal for the 14 divides (in-kernel use).
    """
    if rcp is None:
        def rcp(x):
            return 1.0 / x
    (xlim0_s, xlim1, xlim2, xlim3, xlim4, h0, h2, h4, h6, e0, e2, e4,
     z0, z2, z4, z6, z8, p0, p2, p4, p6, p8, ypy0, ypy0q, yf) = coeffs
    abx = jnp.abs(xi)

    yrrtpi = y * _RSQRPI
    k0 = yrrtpi * rcp(xq + yq)
    k1 = (_RSQRPI * rcp(d0 + xq * (d2 + xq))) * y * (a0 + xq)
    k2 = (_RSQRPI * rcp(h0 + xq * (h2 + xq * (h4 + xq * (h6 + xq))))) * \
        y * (e0 + xq * (e2 + xq * (e4 + xq)))
    k3 = (1.7724538 * rcp(z0 + xq * (z2 + xq * (z4 + xq * (z6
          + xq * (z8 + xq)))))) * \
        (p0 + xq * (p2 + xq * (p4 + xq * (p6 + xq * p8))))

    k4a = jnp.zeros_like(xi)
    k4b = jnp.zeros_like(xi)
    for j in range(6):
        d = xi - _T6[j]
        mq = d * d
        mf = rcp(mq + ypy0q)
        xm = mf * d
        ym = mf * ypy0
        dp = xi + _T6[j]
        pq = dp * dp
        pf = rcp(pq + ypy0q)
        xp = pf * dp
        yp = pf * ypy0
        k4a = k4a + _C6[j] * (ym + yp) - _S6[j] * (xm - xp)
        k4b = k4b + (
            (_C6[j] * (mq * mf - 1.5 * ym) + _S6[j] * yf * xm)
            * rcp(mq + 2.25)
            + (_C6[j] * (pq * pf - 1.5 * yp) - _S6[j] * yf * xp)
            * rcp(pq + 2.25)
        )
    k4b = y * k4b + jnp.exp(-xq)
    k4 = jnp.where(abx <= xlim4, k4a, k4b)

    return jnp.where(
        abx >= xlim0_s, k0,
        jnp.where(abx >= xlim1, k1,
                  jnp.where(abx >= xlim2, k2,
                            jnp.where(abx < xlim3, k3, k4))))


def _voigt_kernel(lo_ref, nchunks_ref, cnl_ref, cnh_ref, m0l_ref, m0h_ref,
                  fll_ref, flh_ref, frl_ref, frh_ref, start_ref,
                  near_ref, params,
                  out_ref, buf, sems, *, tile: int, ch: int, fsteps: int,
                  hw: int, rblock: int, include_near: bool,
                  num_global: int, punroll: int = PUNROLL,
                  newton: int = 1, far_layout: str = "lines"):
    t = pl.program_id(0)
    rb = pl.program_id(1)
    lo = lo_ref[t]
    nchunks = nchunks_ref[t]
    cnl = cnl_ref[t]
    cnh = cnh_ref[t]
    m0l = m0l_ref[t]
    m0h = m0h_ref[t]
    fll = fll_ref[t]
    flh = flh_ref[t]
    frl = frl_ref[t]
    frh = frh_ref[t]
    g0 = (start_ref[0] + t * tile).astype(jnp.float32)

    out_ref[:] = jnp.zeros_like(out_ref)

    def get_dma(slot, c):
        # lo is ch-aligned by build_chunk_ranges; tell Mosaic so it can
        # prove sublane-tile divisibility of the HBM slice offset.
        off = pl.multiple_of(lo + c * ch, ch)
        roff = pl.multiple_of(rb * rblock, rblock)
        return pltpu.make_async_copy(
            params.at[:, pl.ds(off, ch), pl.ds(roff, rblock)],
            buf.at[slot], sems.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    # near arrives as a DYNAMIC scalar so every molecule of a band shares
    # ONE compiled kernel (the per-molecule near-core half-width only
    # enters through these masks; the static unroll uses the band maximum
    # hw).  fsteps stays STATIC: it is band-constant (wcutoff/dw), and
    # bands compile separately anyway (num_global differs).
    fs = jnp.float32(fsteps)
    nr = near_ref[0].astype(jnp.float32)

    def chunk_body(c, _):
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            get_dma((c + 1) % 2, c + 1).start()

        get_dma(slot, c).wait()

        is_core = (c >= m0l) & (c < m0h)
        is_interior = ((c >= fll) & (c < flh)) | ((c >= frl) & (c < frh))

        if far_layout == "lines":
            c0 = buf[slot, CH_C0]                  # (ch, rblock)
            ftot = buf[slot, CH_FTOT]
            rw = buf[slot, CH_RW]
            snum0 = buf[slot, CH_SNUM0]
            yq = buf[slot, CH_YQ]
            xlim0 = buf[slot, CH_XLIM0]
            a0 = buf[slot, CH_A0]
            d0 = buf[slot, CH_D0]
            d2 = buf[slot, CH_D2]

            # Per-row rounded center (kernels.c line_sample fcenterid) —
            # the pressure shift can round differently per row.
            adj = jnp.floor(ftot + 0.5)
            cidx = c0 + adj
            frac = ftot - adj

            # --- Far wings, three host-classified zones (module doc). ---
            # Points are processed PUNROLL at a time so the channel reads
            # from VMEM amortize over PUNROLL x the compute.  The zone
            # split is bit-exact: interior/edge chunks compute exactly the
            # value the full select would have picked (region 0 /
            # pure-Lorentz share num = snum0, den = xq + yq by channel
            # construction).
            h = ch // 2

            def far_loop(mode):
                def point_body(jj, _):
                    j4 = jj * punroll
                    for k in range(punroll):
                        j = j4 + k
                        delta = (g0 + j.astype(jnp.float32)) - cidx
                        xi = (delta - frac) * rw
                        xq = xi * xi
                        if mode == "core":
                            adelta = jnp.abs(delta)
                            m = (adelta <= fs) & (adelta > nr)
                            reg0 = xq >= xlim0
                            num = jnp.where(reg0, snum0, snum0 * (a0 + xq))
                            den = jnp.where(reg0, xq + yq,
                                            d0 + xq * (d2 + xq))
                        else:
                            num = snum0
                            den = xq + yq
                            if mode == "edge":
                                m = jnp.abs(delta) <= fs
                        if mode != "interior":
                            # Mask num -> 0 AND den -> 1: an invalid
                            # line's den can reach ~1e23 (xi ~ 1e9 * rw),
                            # whose pairwise product overflows to inf and
                            # poisons bign with 0 * inf = NaN.  Interior
                            # chunks are all-valid with den <= ~1e10 by
                            # construction.
                            num = jnp.where(m, num, 0.0)
                            den = jnp.where(m, den, 1.0)
                        # Pairwise rational combine: one reciprocal serves
                        # two lines (n1/d1 + n2/d2 =
                        # (n1 d2 + n2 d1)/(d1 d2)).  Every term is
                        # non-negative (no cancellation) and d1*d2 <=
                        # ~1e21 stays in f32 range; errors are a few
                        # ulps, inside the kernel's 2e-6 parity budget.
                        bign = num[:h] * den[h:] + num[h:] * den[:h]
                        bigd = den[:h] * den[h:]
                        # Fast reciprocal + Newton steps: ~1 ulp of a true
                        # divide at a fraction of the VPU cost.
                        r = pl.reciprocal(bigd, approx=True)
                        for _ in range(newton):
                            r = r * (2.0 - bigd * r)
                        contrib = bign * r
                        row = jnp.sum(contrib, axis=0,
                                      keepdims=True)       # (1, rblock)
                        out_ref[pl.ds(j, 1), :] += row
                    return 0
                return point_body

            @pl.when(is_core)
            def _():
                jax.lax.fori_loop(0, tile // punroll, far_loop("core"), 0)

            @pl.when(jnp.logical_not(is_core) & is_interior)
            def _():
                jax.lax.fori_loop(0, tile // punroll, far_loop("interior"),
                                  0)

            @pl.when(jnp.logical_not(is_core) & jnp.logical_not(is_interior))
            def _():
                jax.lax.fori_loop(0, tile // punroll, far_loop("edge"), 0)
        else:
            # --- Transposed far wings: points on SUBLANES, rows on
            # LANES, lines SEQUENTIAL (static pairwise unroll).  Each
            # line's channel values are ONE (1, rblock) VMEM load
            # broadcast over the whole (tile, rblock) block, so the
            # per-(point, line) channel re-reads of the "lines" layout
            # (~9 (ch, rblock) loads per point per chunk — the measured
            # issue/load bottleneck) collapse to ~5 loads per LINE per
            # chunk; virtually every issue slot is arithmetic.  The
            # accumulator lives in vector registers across the line
            # unroll and hits out_ref once per chunk.
            # Full-shape point positions hoisted once per chunk: every
            # per-line op then has at most ONE broadcasting operand.
            pos = g0 + jax.lax.broadcasted_iota(
                jnp.int32, (tile, rblock), 0).astype(jnp.float32)

            def ld(chan, l):
                return buf[slot, chan, l:l + 1, :]        # (1, rblock)

            def far_tr(mode):
                acc = jnp.zeros((tile, rblock), jnp.float32)
                for l0 in range(0, ch, 2):
                    nd = []
                    for l in (l0, l0 + 1):
                        ftot = ld(CH_FTOT, l)
                        c0l = ld(CH_C0, l)
                        # pos and c0 are exact f32 integers: subtracting
                        # them FIRST keeps xi at full precision (adding
                        # ftot to a ~1e4-scale c0 would round the
                        # fractional center at ~2e-3 grid points).
                        dint = pos - c0l                  # (tile, rblock)
                        xi = (dint - ftot) * ld(CH_RW, l)
                        xq = xi * xi
                        snum0 = ld(CH_SNUM0, l)
                        yq = ld(CH_YQ, l)
                        if mode == "core":
                            adelta = jnp.abs(dint - jnp.floor(ftot + 0.5))
                            m = (adelta <= fs) & (adelta > nr)
                            reg0 = xq >= ld(CH_XLIM0, l)
                            num = jnp.where(
                                reg0, snum0,
                                snum0 * (ld(CH_A0, l) + xq))
                            den = jnp.where(
                                reg0, xq + yq,
                                ld(CH_D0, l) + xq * (ld(CH_D2, l) + xq))
                        else:
                            num = snum0            # (1, rblock), implicit
                            den = xq + yq
                            if mode == "edge":
                                m = jnp.abs(
                                    dint - jnp.floor(ftot + 0.5)) <= fs
                        if mode != "interior":
                            # Same masking rationale as the "lines"
                            # layout: den -> 1 keeps the pairwise
                            # product finite for invalid lines.
                            num = jnp.where(m, num, 0.0)
                            den = jnp.where(m, den, 1.0)
                        nd.append((num, den))
                    (n1, d1), (n2, d2_) = nd
                    bign = n1 * d2_ + n2 * d1
                    bigd = d1 * d2_
                    r = pl.reciprocal(bigd, approx=True)
                    for _ in range(newton):
                        r = r * (2.0 - bigd * r)
                    acc = acc + bign * r
                out_ref[:] += acc

            @pl.when(is_core)
            def _():
                far_tr("core")

            @pl.when(jnp.logical_not(is_core) & is_interior)
            def _():
                far_tr("interior")

            @pl.when(jnp.logical_not(is_core) & jnp.logical_not(is_interior))
            def _():
                far_tr("edge")

        # --- Near core: full Humlicek at 2*hw+1 offsets around c0, placed
        # with a one-hot MXU matmul (only chunks with centers in-tile). --
        if include_near:
            @pl.when((c >= cnl) & (c < cnh))
            def _():
                c0 = buf[slot, CH_C0]              # (ch, rblock)
                ftot = buf[slot, CH_FTOT]
                rw = buf[slot, CH_RW]
                snum0 = buf[slot, CH_SNUM0]
                yq = buf[slot, CH_YQ]
                xlim0 = buf[slot, CH_XLIM0]
                a0 = buf[slot, CH_A0]
                d0 = buf[slot, CH_D0]
                d2 = buf[slot, CH_D2]
                adj = jnp.floor(ftot + 0.5)
                y = buf[slot, CH_Y]
                lor = xlim0 < 0.0
                # snum0 = s*RSQRPI^2*repwid*y for non-Lorentz lines, so the
                # full-Voigt prefactor s*RSQRPI*repwid = snum0/(RSQRPI*y).
                sfac = snum0 / (jnp.float32(_RSQRPI) * jnp.maximum(y, 1e-30))
                pos = c0 - g0                      # (ch, rblock), row-const
                # Mosaic only supports integer iota; cast after.
                iota_t = jax.lax.broadcasted_iota(
                    jnp.int32, (ch, tile), 1).astype(jnp.float32)
                valid_line = c0 > -1e8
                coeffs = _humlicek_y_coeffs(y, yq, xlim0)
                xlim0_s = coeffs[0]
                # Lanes with |x| >= sqrt(164) are Humlicek region 0/1 for
                # every y (xlim1^2 <= 164), EXCEPT the tiny-y branch
                # (y <= 1e-6 forces xlim1 = xlim2 = xlim0_s, i.e. the CPF
                # region reaches out to xlim0).
                tiny = y <= 0.000001
                acc = jnp.zeros((tile, rblock), jnp.float32)

                def dot_place(onehot, contrib):
                    # HIGHEST: the MXU's default bf16 passes would round
                    # the near-core (peak) tau values to ~1e-3 relative.
                    return jax.lax.dot_general(
                        onehot, contrib, (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

                def rcp(x):
                    # ~1-ulp reciprocal (see voigt_pallas newton note).
                    r = pl.reciprocal(x, approx=True)
                    for _ in range(newton):
                        r = r * (2.0 - x * r)
                    return r

                for o in range(2 * hw + 1):
                    off = jnp.float32(o - hw)
                    # g - cidx = off - adj; in-window, near-core, and
                    # global-bounds mask (the line_sample kernel clamps
                    # e = min(center + fsteps, n - 1), kernels.c:433-436).
                    m = (jnp.abs(off - adj) <= nr) & valid_line & \
                        (c0 + off < jnp.float32(num_global))
                    xi = (off - ftot) * rw
                    xq = xi * xi
                    abx = jnp.abs(xi)
                    # Cheap regions 0/1 value — exact for every unmasked
                    # lane with xq >= 164 (non-tiny y); always accumulated.
                    # ONE reciprocal of (xq + yq) serves both k0 and the
                    # Lorentz-lane value.
                    r0 = rcp(xq + yq)
                    k0 = (y * jnp.float32(_RSQRPI)) * r0
                    k1 = (jnp.float32(_RSQRPI)
                          * rcp(d0 + xq * (d2 + xq))) * y * (a0 + xq)
                    k01 = jnp.where(abx >= xlim0_s, k0, k1)
                    k_lor = snum0 * r0             # exact Lorentz lanes
                    cheap = jnp.where(lor, k_lor, sfac * k01)
                    cheap = jnp.where(m, cheap, 0.0)   # (ch, rblock)
                    onehot = jnp.where(pos[:, :1] + off == iota_t, 1.0, 0.0)
                    acc = acc + dot_place(onehot, cheap)

                    # Full-region correction, only when some lane actually
                    # falls inside the expensive regions 2-4.  At SW
                    # resolution most (chunk, offset) pairs skip this —
                    # the dominant near-core cost (the ~300-op CPF/k3/k4
                    # evaluation) runs rarely instead of always.
                    need = m & jnp.logical_not(lor) & \
                        ((xq < 164.1) | tiny)
                    pred = jnp.any(need)

                    @pl.when(pred)
                    def _(xi=xi, xq=xq, k01=k01, need=need, onehot=onehot):
                        k_full = _humlicek_eval(xi, xq, y, yq, a0, d0, d2,
                                                coeffs, rcp=rcp)
                        corr = jnp.where(need, sfac * (k_full - k01), 0.0)
                        out_ref[:] += dot_place(onehot, corr)
                out_ref[:] += acc
        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "ch", "fsteps", "hw", "ntiles_block",
                     "rpad", "rblock", "include_near", "num_global",
                     "punroll", "newton", "interpret", "far_layout"))
def voigt_pallas(channels, lo, nchunks, cnl, cnh, m0l, m0h, fll, flh, frl,
                 frh, start, near, *, tile: int,
                 ch: int, fsteps: int, hw: int,
                 ntiles_block: int, rpad: int, num_global: int,
                 rblock: int | None = None, include_near: bool = True,
                 punroll: int = PUNROLL, newton: int | None = None,
                 interpret: bool = False, far_layout: str = "lines"):
    """Run the fused Voigt kernel over ``ntiles_block`` spectral tiles.

    Args:
      channels: (NCH, lpad, rpad) from :func:`far_channels`.
      lo / nchunks: (ntiles_block,) int32 per-tile line-range start
        (CH-aligned into lpad) and number of CH-line chunks.
      cnl / cnh: (ntiles_block,) int32 sub-range [cnl, cnh) of chunk
        indices whose lines' centers can land inside the tile (the
        near-core branch runs only for those).
      m0l / m0h, fll / flh, frl / frh: per-tile far-zone chunk sub-ranges
        (core-adjacent / interior-left / interior-right) from
        :func:`build_chunk_ranges`.
      start: scalar int32 global grid index of the block's first point.
      tile / ch / fsteps / near / hw: static geometry.

    Returns (ntiles_block * tile, rpad) float32 — tau transposed
    (points, rows).
    """
    # Rows split into rblock-wide grid steps so VMEM stays bounded for
    # arbitrarily large column batches.  Pick the lane-multiple block
    # that minimizes total padded lanes (rpad = 896 as 1 x 896, not
    # 2 x 512 = 1024 lanes of work), capped so the kernel's scoped VMEM
    # (double-buffered channel stack + output block + point-loop
    # temporaries) stays under the ~16 MB/core budget with headroom.
    if newton is None:
        # Newton steps on the approximate reciprocal: the TPU's hardware
        # approx recip + ONE step lands at ~1 ulp (compiled parity
        # 5.8e-7, +4% kernel throughput vs two steps), but the
        # interpreter emulates a coarser seed (~1.4e-5 after one step),
        # so interpret mode keeps two.
        newton = 2 if interpret else 1
    if rblock is None:
        if far_layout == "points":
            # Transposed layout: the line unroll carries a
            # (tile, rblock) register accumulator; one lane-tile keeps
            # it (and the pairwise temporaries) register-resident.
            # rpad is LANE-aligned so rblock = LANE never pads lanes.
            rblock = LANE
        else:
            per_lane = 4 * (2 * NCH * ch    # double-buffered DMA stack
                            + 3 * tile      # out block + near acc + slack
                            + 4 * punroll * ch)  # live point temporaries
            rb_cap = max((10_000_000 // per_lane) // LANE * LANE, LANE)
            best, best_cost = LANE, None
            for rb in range(LANE, min(rpad, rb_cap, 1024) + 1, LANE):
                cost = -(-rpad // rb) * rb
                if best_cost is None or cost < best_cost or \
                        (cost == best_cost and rb > best):
                    best, best_cost = rb, cost
            rblock = best
    nrb = -(-rpad // rblock)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=(ntiles_block, nrb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile, rblock), lambda t, rb, *_: (t, rb),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NCH, ch, rblock), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_voigt_kernel, tile=tile, ch=ch,
                               fsteps=fsteps, hw=hw,
                               rblock=rblock, include_near=include_near,
                               num_global=num_global, punroll=punroll,
                               newton=newton, far_layout=far_layout)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles_block * tile, rpad),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(lo, jnp.int32), jnp.asarray(nchunks, jnp.int32),
      jnp.asarray(cnl, jnp.int32), jnp.asarray(cnh, jnp.int32),
      jnp.asarray(m0l, jnp.int32), jnp.asarray(m0h, jnp.int32),
      jnp.asarray(fll, jnp.int32), jnp.asarray(flh, jnp.int32),
      jnp.asarray(frl, jnp.int32), jnp.asarray(frh, jnp.int32),
      jnp.asarray(start, jnp.int32).reshape(1),
      jnp.asarray(near, jnp.int32).reshape(1), channels)


@dataclasses.dataclass(frozen=True)
class ChunkRanges:
    """Per-tile chunk tables for the fused kernel (host-precomputed).

    All arrays are (ntiles,) int32; chunk indices are relative to
    ``lo[t]`` (in CH-line units).
    """

    lo: np.ndarray        # CH-aligned line-range start per tile
    nchunks: np.ndarray   # CH-line chunks covering the tile's reach
    cnl: np.ndarray       # [cnl, cnh): chunks whose line centers can
    cnh: np.ndarray       #   land inside the tile (near-core branch)
    m0l: np.ndarray       # [m0l, m0h): chunks with ANY line within
    m0h: np.ndarray       #   region0_hw of the tile (full-select zone)
    fll: np.ndarray       # [fll, flh) u [frl, frh): chunks whose EVERY
    flh: np.ndarray       #   line covers the whole tile, sits beyond
    frl: np.ndarray       #   region0_hw, and cannot shift off the grid
    frh: np.ndarray       #   (unmasked pure-region-0 zone)
    lpad: int             # padded line-array length for in-bounds DMA


def build_chunk_ranges(c0_sorted: np.ndarray, num_wpoints: int, fsteps: int,
                       tile: int, ch: int, shift_margin: int = 2,
                       near_hw: int | None = None,
                       region0_hw: int | None = None) -> ChunkRanges:
    """Host-side per-tile contiguous line ranges, CH-chunk aligned.

    ``lo[t]`` is the CH-aligned start index of the line range reaching
    tile t, ``nchunks[t]`` the number of CH-line chunks covering it,
    ``[cnl[t], cnh[t])`` the chunk sub-range (relative indices) whose
    line centers can land inside the tile (the near-core branch), and
    ``lpad`` the padded line-array length every in-bounds DMA needs.
    Mirrors lines.build_tiles bucketing (kernels.c:177-304 bin
    structure) without materializing index lists.

    ``region0_hw`` (from :func:`lines.region0_halfwidth`) additionally
    classifies far-wing chunks into the three zones the kernel
    specializes on; when None, every chunk is conservatively
    core-adjacent (full select math — the pre-zone behavior).
    """
    ntiles = -(-num_wpoints // tile)
    reach = fsteps + shift_margin
    first = np.arange(ntiles) * tile
    lo = np.searchsorted(c0_sorted, first - reach, side="left")
    hi = np.searchsorted(c0_sorted, first + (tile - 1) + reach, side="right")
    lo_al = (lo // ch) * ch
    nchunks = np.maximum(-(-(hi - lo_al) // ch), 0)
    # Near-core chunk sub-range: lines whose c0 +- hw window overlaps the
    # tile, i.e. c0 in [first - hw, first + tile - 1 + hw].
    hw = (fsteps if near_hw is None else near_hw)
    nlo = np.searchsorted(c0_sorted, first - hw, side="left")
    nhi = np.searchsorted(c0_sorted, first + (tile - 1) + hw, side="right")
    cnl = np.clip((nlo - lo_al) // ch, 0, nchunks)
    cnh = np.clip(-(-(nhi - lo_al) // ch), 0, nchunks)

    zeros = np.zeros(ntiles, np.int64)
    if region0_hw is None:
        # Everything core-adjacent, no interior fast zone.
        m0l, m0h = zeros, nchunks.astype(np.int64)
        fll = flh = frl = frh = zeros
    else:
        # Edge/interior chunks skip the near-core exclusion mask, which is
        # only sound when every line beyond the core zone is also beyond
        # the near window: force region0_hw >= the near reach.
        reach0 = max(region0_hw, hw) + shift_margin
        # Core-adjacent (ANY line within reach0 of the tile): chunk
        # intersects [il, ih) -> floor start, ceil end.
        il = np.searchsorted(c0_sorted, first - reach0, side="left")
        ih = np.searchsorted(c0_sorted, first + (tile - 1) + reach0,
                             side="right")
        m0l = np.clip((il - lo_al) // ch, 0, nchunks)
        m0h = np.clip(-(-(ih - lo_al) // ch), 0, nchunks)
        # Interior (EVERY line in chunk qualifies): ceil start, floor
        # end.  Left range: window covers the whole tile
        # (c0 >= first + tile - 1 - fsteps + margin), strictly beyond
        # reach0 (c0 <= first - reach0 - 1), and the shifted center
        # cannot leave the grid (c0 >= margin).
        def all_sub(vmin, vmax):
            a = np.searchsorted(c0_sorted, vmin, side="left")
            b = np.searchsorted(c0_sorted, vmax, side="right")
            cl = np.clip(-(-(a - lo_al) // ch), 0, nchunks)
            chh = np.clip((b - lo_al) // ch, 0, nchunks)
            return cl, np.maximum(chh, cl)

        fll, flh = all_sub(
            np.maximum(first + (tile - 1) - fsteps + shift_margin,
                       shift_margin),
            first - reach0 - 1)
        frl, frh = all_sub(
            first + tile + reach0,
            np.minimum(first + fsteps - shift_margin,
                       num_wpoints - 1 - shift_margin))

    # lpad covers every DMA end AND the full catalog (far_channels pads the
    # (rows, L) arrays up to lpad, so lpad >= L).
    lpad = int(_round_up(max(int((lo_al + nchunks * ch).max(initial=ch)),
                             len(c0_sorted), ch), ch))
    i32 = np.int32
    return ChunkRanges(lo_al.astype(i32), nchunks.astype(i32),
                       cnl.astype(i32), cnh.astype(i32),
                       m0l.astype(i32), m0h.astype(i32),
                       fll.astype(i32), flh.astype(i32),
                       frl.astype(i32), frh.astype(i32), lpad)


def accumulate_voigt_pallas(prep, c0, ns, ranges: ChunkRanges, *,
                            num_wpoints: int,
                            dw: float, fsteps: int, near: int, hw: int,
                            tile: int, ch: int, lpad: int | None = None,
                            num_global: int,
                            tau0=None, start=0, include_near: bool = True,
                            punroll: int = PUNROLL, newton: int | None = None,
                            rblock: int | None = None,
                            interpret: bool = False,
                            far_layout: str = "lines"):
    """Fused near+far Voigt accumulation via the Pallas kernel.

    Semantically equal to ``accumulate_tiled(..., exclude_within=near,
    far_kernel=True)`` plus (when ``include_near``)
    ``accumulate_near_pointwise(...)`` — i.e. the complete line_sample
    optical depth (kernels.c:410-465) partitioned at |g - cidx| == near.

    Args:
      prep: PreparedLines with (rows, L) arrays (rows = batch x layers).
      c0: (L,) int32 unshifted grid indices (GridLines.c0).
      ns: (rows,) species column density.
      ranges: :class:`ChunkRanges` global per-tile tables from
        :func:`build_chunk_ranges`.
      hw: STATIC near-window half-width in grid points (the unroll
        length).  The production caller passes each molecule's own hw
        (gas_optics.py: padding every molecule to the band maximum costs
        ~2% whole-bench in wasted masked offsets); molecules SHARING an
        hw still share one compiled kernel because ``near`` is a dynamic
        scalar.
      start: traced global index of the output block (tile-aligned).

    Returns (rows, num_wpoints) accumulated into ``tau0`` if given.
    """
    rows, L = prep.strength.shape
    rpad = _round_up(rows, LANE)
    ntiles_block = -(-num_wpoints // tile)
    if lpad is None:
        lpad = ranges.lpad

    channels = far_channels(prep, c0, ns, dw=dw, num_global=num_global,
                            lpad=lpad, rpad=rpad)

    tables = [jnp.asarray(a) for a in
              (ranges.lo, ranges.nchunks, ranges.cnl, ranges.cnh,
               ranges.m0l, ranges.m0h, ranges.fll, ranges.flh,
               ranges.frl, ranges.frh)]
    ntiles_global = tables[0].shape[0]
    start = jnp.asarray(start, jnp.int32)
    t0 = start // tile
    # Per-block rows of the global tables (tiles past the grid end get
    # nchunks = 0 so their output stays zero).
    pad_t = max(ntiles_block - 1, 0)

    def block_rows(a):
        return jax.lax.dynamic_slice_in_dim(jnp.pad(a, (0, pad_t)), t0,
                                            ntiles_block)

    tables = [block_rows(a) for a in tables]
    tvalid = t0 + jnp.arange(ntiles_block, dtype=jnp.int32) < ntiles_global
    tables[1] = jnp.where(tvalid, tables[1], 0)

    tau_t = voigt_pallas(channels, *tables, start, near,
                         tile=tile, ch=ch, fsteps=fsteps, hw=hw,
                         ntiles_block=ntiles_block, rpad=rpad,
                         num_global=num_global, include_near=include_near,
                         punroll=punroll, newton=newton, rblock=rblock,
                         interpret=interpret, far_layout=far_layout)
    tau = tau_t[:num_wpoints, :rows].T
    return tau if tau0 is None else tau0 + tau



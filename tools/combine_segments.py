"""Merge per-segment ERA5 flux files along the lon dimension.

TPU-native replacement for the reference's post-hoc combiners
(era5/test/combine-segments.py:8-36, extra-tools/grtcode-results-combiner.c):
each shard writes its lon slice with `lon_start/lon_stop/lon_global_size`
global attributes (era5.c:156-159) and this tool assembles the global
domain.  In multi-host mesh runs the sharded writer makes this
unnecessary; it exists for parity with the segment workflow.

Usage: python tools/combine_segments.py [--rebin N] out.nc seg1.nc seg2.nc ...

``--rebin N`` additionally coarsens any trailing spectral axis of 4-D+
variables by N (mean over bins, matching the reference combiner's
`coarsen(...).sum()/N`, GRTworkflow/combiner.py:40-60) — e.g. N=10 turns
0.1 cm-1 spectrally-resolved output into 1 cm-1 bins.
"""
from __future__ import annotations

import argparse

import h5py
import numpy as np


def rebin_spectral(data: np.ndarray, factor: int) -> np.ndarray:
    """Mean over blocks of `factor` along the last axis, trimming the
    remainder (xarray coarsen boundary='trim' + sum()/factor)."""
    n = data.shape[-1] // factor * factor
    trimmed = data[..., :n]
    return trimmed.reshape(*trimmed.shape[:-1], n // factor, factor).mean(-1)


_DIM_NAMES = ("time", "lat", "lon", "level", "layer",
              "lw_wavenumber", "sw_wavenumber")


def combine(segment_paths, out_path, rebin: int | None = None):
    segs = []
    for p in segment_paths:
        with h5py.File(p, "r") as f:
            segs.append({
                "lon_start": int(f.attrs["lon_start"]),
                "lon_stop": int(f.attrs["lon_stop"]),
                "lon_global_size": int(f.attrs["lon_global_size"]),
                "vars": {k: np.asarray(f[k]) for k in f
                         if k not in _DIM_NAMES},
                # Writer stores each variable's dimension names in a
                # "_dims" attribute; the lon axis position varies
                # (axis 2 for flux variables, axis 3 for the
                # (time, level, lat, lon) state profiles).
                "dims": {k: [d.decode() for d in f[k].attrs["_dims"]]
                         if "_dims" in f[k].attrs else None
                         for k in f if k not in _DIM_NAMES},
            })
    nglobal = segs[0]["lon_global_size"]
    seen = np.zeros(nglobal, bool)
    with h5py.File(out_path, "w") as out:
        for name in segs[0]["vars"]:
            sample = segs[0]["vars"][name]
            dims = segs[0]["dims"][name]
            lon_axis = dims.index("lon") if dims is not None else 2
            shape = list(sample.shape)
            shape[lon_axis] = nglobal
            data = np.zeros(shape, sample.dtype)
            for s in segs:
                idx = [slice(None)] * data.ndim
                idx[lon_axis] = slice(s["lon_start"], s["lon_stop"] + 1)
                data[tuple(idx)] = s["vars"][name]
            spectral_last = (dims[-1].endswith("wavenumber")
                             if dims is not None else data.ndim > 4)
            if rebin and spectral_last:
                data = rebin_spectral(data, rebin)
            out.create_dataset(name, data=data)
        for s in segs:
            seen[s["lon_start"]:s["lon_stop"] + 1] = True
        if not seen.all():
            missing = np.where(~seen)[0]
            raise ValueError(f"missing lon indices: {missing.tolist()}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rebin", type=int, default=None)
    ap.add_argument("out")
    ap.add_argument("segments", nargs="+")
    a = ap.parse_args()
    combine(a.segments, a.out, rebin=a.rebin)
    print(f"wrote {a.out}")

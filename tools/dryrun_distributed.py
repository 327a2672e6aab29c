"""Simulated multi-host dryrun: 2 CPU processes x 4 virtual devices.

Validates the production multi-host flow (grtcode_tpu/parallel/
distributed.py) without pod hardware: an orchestrator spawns two worker
processes that join one jax.distributed process group, each builds a
(2 columns x 2 spectral) mesh over its *local* devices, computes its
column slice of the flagship two-band step, and writes a combinable
segment + done-marker.  The orchestrator then merges the segments and
compares byte-identically against the same step on a single-process
(4 x 2) mesh — the TPU analogue of the reference's SLURM-sharded run
vs single-node run producing identical netCDF contents
(GRTworkflow/run-rfmip-irf.sh:102-125 + combiner).

Worker mode:    python tools/dryrun_distributed.py --worker --process-id I \
                    --num-processes N --coordinator HOST:PORT --out-dir D
Orchestrator:   python tools/dryrun_distributed.py  (or call orchestrate())
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICES_PER_PROC = 4
NUM_PROCESSES = 2
N_SPECTRAL = 2
BATCH_COLUMNS = 8


def _build_model_and_batch():
    sys.path.insert(0, REPO_ROOT)
    import __graft_entry__ as ge

    model, batch = ge._build(lw_points=256, sw_points=128, nlines=96,
                             chunk=32)
    return model, batch(B=BATCH_COLUMNS, nlev=9)


def run_worker(process_id: int, num_processes: int, coordinator: str,
               out_dir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO_ROOT)
    from grtcode_tpu.parallel import distributed

    distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_processes,
                           process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == DEVICES_PER_PROC

    model, batch = _build_model_and_batch()
    path = distributed.run_process_segment(
        model, batch, out_dir, "dryrun", n_spectral=N_SPECTRAL)
    # Spectrally-resolved segment: exercises the cross-process tiled
    # all_gather along the wavenumber axis (the spectral-output path).
    path_s = distributed.run_process_segment(
        model, batch, out_dir, "dryrun_spec", n_spectral=N_SPECTRAL,
        integrated=False)
    print(f"worker {process_id}: wrote {path} and {path_s}", flush=True)


def orchestrate(out_dir: str, timeout: float = 600.0) -> None:
    """Spawn the workers, combine their segments, check vs single-process."""
    import numpy as np

    coordinator = "127.0.0.1:29753"
    procs = []
    for pid in range(NUM_PROCESSES):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--process-id", str(pid),
             "--num-processes", str(NUM_PROCESSES),
             "--coordinator", coordinator, "--out-dir", out_dir],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for pid, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=timeout)
        if proc.returncode != 0:
            raise RuntimeError(
                f"distributed worker {pid} failed:\n{out[-4000:]}")

    sys.path.insert(0, REPO_ROOT)
    from grtcode_tpu.parallel import distributed
    from grtcode_tpu.parallel.mesh import make_mesh
    import jax

    # Reference: the same steps on this process's own devices (the driver
    # runs us under --xla_force_host_platform_device_count=8).
    model, batch = _build_model_and_batch()
    devices = jax.devices()
    n_cols = max(len(devices) // N_SPECTRAL, 1)
    mesh = make_mesh(n_cols, N_SPECTRAL, devices=devices[:n_cols * N_SPECTRAL])
    for name, integ in (("dryrun", True), ("dryrun_spec", False)):
        combined = distributed.combine_column_segments(out_dir, name)
        single = {k: np.asarray(v) for k, v in
                  model.step(mesh=mesh, integrated=integ)(batch).items()}
        for key, ref in single.items():
            got = combined[key]
            if got.shape != ref.shape:
                raise AssertionError(
                    f"{name}/{key}: shape {got.shape} != {ref.shape}")
            if not np.array_equal(got, ref):
                worst = np.abs(got - ref).max()
                raise AssertionError(
                    f"{name}/{key}: combined segments differ from "
                    f"single-process run (max abs diff {worst:.3e})")
    print(f"distributed dryrun ok: {NUM_PROCESSES} processes x "
          f"{DEVICES_PER_PROC} devices, integrated AND spectral segments "
          f"byte-identical ({', '.join(sorted(single))})", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=NUM_PROCESSES)
    ap.add_argument("--coordinator", default="127.0.0.1:29753")
    ap.add_argument("--out-dir", default="/tmp/grtcode_dryrun_distributed")
    args = ap.parse_args()
    if args.worker:
        run_worker(args.process_id, args.num_processes, args.coordinator,
                   args.out_dir)
    else:
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            orchestrate(d)


if __name__ == "__main__":
    main()

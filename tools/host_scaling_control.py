"""Spark-free host scaling controls (round-4 BENCH evidence).

Two process-pool microbenchmarks that bound what ANY engine can achieve
on this host at a given parallelism, independent of Spark:

  compute  — cache-resident NumPy matmul+sin loop (single-threaded BLAS),
             fixed total work split across N processes. Measures the
             hypervisor's deliverable CPU scaling.
  bandwidth — 64 MB out-of-LLC streaming copy per process. Measures the
             memory-subsystem scaling that scan/shuffle-bound stages see.

Usage: python tools/host_scaling_control.py [compute|bandwidth] [N ...]
Defaults: both controls at 2, 8, 32 processes, 2 reps each.

Round-4 measurements on the sandbox host (2026-08-21, quiet host):
  compute:   2->8 efficiency ~0.99 (10.5s -> 2.66s), 8->32 ~0.545
             (5.4s -> 2.48s; stable over 3 reps)
  bandwidth: aggregate ~33 GB/s at 2 procs, ~62-81 GB/s at 8 (2->8
             efficiency ~0.55), erratic 25-180 GB/s at 32
Interpretation: the host scales pure compute linearly from 2 to 8
processes but caps at ~2.2x from 8 to 32, and its memory subsystem
delivers only ~2-2.5x more streaming bandwidth from 2 to 8. A mixed
compute+scan/shuffle job on this host therefore has a hardware scaling
ceiling strictly below 1.0 on both pairs; the flagship's measured ratios
must be read against these bounds (BENCH/NOTES.md).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import multiprocessing as mp
import time

import numpy as np


def _compute_work(args):
    seed, iters = args
    rng = np.random.default_rng(seed)
    a = rng.random((384, 384))
    s = 0.0
    for _ in range(iters):
        s += float((a @ a).sum())
        a = np.sin(a) * 0.5 + 0.5
    return s


def _bandwidth_work(args):
    seed, iters = args
    a = np.random.default_rng(seed).integers(0, 255, 64_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(iters):
        np.copyto(b, a)
    dt = time.time() - t0
    return iters * 2 * a.nbytes / dt / 1e9  # GB/s per process


def run(kind: str, n_procs: int, total: int) -> tuple[float, float]:
    fn = _compute_work if kind == "compute" else _bandwidth_work
    t0 = time.time()
    with mp.Pool(n_procs) as p:
        out = p.map(fn, [(i, total // n_procs) for i in range(n_procs)], chunksize=1)
    dt = time.time() - t0
    agg = sum(out) if kind == "bandwidth" else 0.0
    return dt, agg


def main() -> None:
    kinds = [a for a in sys.argv[1:] if a in ("compute", "bandwidth")] or [
        "compute",
        "bandwidth",
    ]
    ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2, 8, 32]
    totals = {"compute": 2400, "bandwidth": 768}
    for kind in kinds:
        for _rep in range(2):
            for n in ns:
                dt, agg = run(kind, n, totals[kind])
                extra = f", aggregate {agg:.1f} GB/s" if kind == "bandwidth" else ""
                print(f"{kind}: {n} procs: {dt:.2f}s{extra}", flush=True)


if __name__ == "__main__":
    main()

"""Profile the full correction pipeline at scale on the real TPU.

Usage: python scripts/profile_pipeline_tpu.py [n_molecules] [--no-warmup]

Prints per-stage wall seconds (bench.py stage marks) plus the fine-grained
profiler report (msa.* sub-stages, align.*, GCUPS counters) for a
``n_molecules``-molecule mock workload (~11 reads/molecule).  VERDICT r2 #3:
the headline must be measured at >= 10k reads, where per-launch fixed costs
stop dominating; this script is the measurement tool for that regime.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from sarlacc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_mol = int(args[0]) if args else 900
    warmup = "--no-warmup" not in sys.argv

    from bench import build_workload, run_pipeline
    from sarlacc_tpu.utils.profiling import (
        PipelineProfiler,
        get_profiler,
        set_profiler,
    )

    t0 = time.time()
    adaptor1, adaptor2, batch = build_workload(n_molecules=n_mol)
    print(
        f"[workload] {len(batch)} reads in {time.time() - t0:.1f}s",
        file=sys.stderr,
        flush=True,
    )

    import jax

    print(f"[device] {jax.devices()}", file=sys.stderr, flush=True)

    if warmup:
        t0 = time.time()
        run_pipeline(adaptor1, adaptor2, batch)
        print(
            f"[warmup] {time.time() - t0:.1f}s", file=sys.stderr, flush=True
        )

    set_profiler(PipelineProfiler())
    timings: list = []
    t0 = time.time()
    nreads, ncons = run_pipeline(adaptor1, adaptor2, batch, timings=timings)
    elapsed = time.time() - t0

    stages = {
        name: round(t - prev, 3)
        for (name, t), (_, prev) in zip(timings[1:], timings[:-1])
    }
    out = {
        "n_reads": nreads,
        "n_consensus": ncons,
        "seconds": round(elapsed, 3),
        "reads_per_s": round(nreads / elapsed, 2),
        "stages": stages,
    }
    print(json.dumps(out))
    print(get_profiler().report(), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

"""Standalone vignette-scale (~500k-read) pipeline run (BASELINE config 4).

Runs bench.py's ``pipeline_500k`` config by itself, printing each stage's
wall time the moment it completes (so a late failure still leaves the
earlier stages on record) and writing the bench-shaped JSON entry to the
path given as argv[1] (default /tmp/pipeline_500k.json).

Relies on the persistent compile cache for warm kernel shapes; the 10k
``pipeline`` config (same shape buckets) is the natural warmer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sarlacc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import bench


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pipeline_500k.json"
    n_mol = int(sys.argv[2]) if len(sys.argv) > 2 else 47_500

    t0 = time.time()
    adaptor1, adaptor2, batch = bench.build_workload(n_molecules=n_mol)
    print(f"[500k] workload built: {len(batch)} reads in {time.time()-t0:.0f} s",
          flush=True)

    timings: list = []
    t0 = time.time()
    nreads, ncons = bench.run_pipeline(adaptor1, adaptor2, batch, timings=timings)
    elapsed = time.time() - t0
    stages = {
        name: round(t - prev, 3)
        for (name, t), (_, prev) in zip(timings[1:], timings[:-1])
    }
    entry = {
        "reads_per_s": round(nreads / elapsed, 2),
        "n_reads": nreads,
        "n_consensus": ncons,
        "seconds": round(elapsed, 3),
        "stages": stages,
    }
    print(f"[500k] {json.dumps(entry)}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"pipeline_500k": entry}, f, indent=1)


if __name__ == "__main__":
    main()

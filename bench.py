"""Benchmark: end-to-end pipeline throughput on one chip.

Workload (seeded, in-memory): mock long reads with planted adaptors, barcode
and UMI -> adaptor_align -> umi_group -> multi_read_align -> consensus.
Metric: reads/s through the full correction pipeline (BASELINE.md).

``vs_baseline`` is relative to a nominal 100 reads/s/core estimate for the
reference's single-core C++ path on the same workload (the reference
publishes no numbers — BASELINE.md; its own vignette calls the MSA "often
the most time-consuming step").  One warmup pass absorbs jit compilation,
mirroring steady-state streaming operation.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent compilation cache: TPU compiles through the remote tunnel are
# extremely slow (minutes); cache them across bench runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

NOMINAL_BASELINE_READS_PER_S = 100.0


def build_workload(n_molecules=24, reads_per_mol=(8, 14), seqlen=(400, 700), seed=7):
    from sarlacc_tpu.core.encode import SeqBatch
    from sarlacc_tpu.io.mock import mock_reads
    import tempfile, os

    adaptor1 = "ACGCTAGCATCAGTC" + "NNNN" + "CACAGCTACGA" + "NNNNNNNN" + "CGTACGCAT"
    adaptor2 = "TGCATCGATCGCAT"
    fp = tempfile.mktemp(suffix=".fastq")
    mock_reads(
        adaptor1,
        adaptor2,
        fp,
        nmolecules=n_molecules,
        nreads_range=reads_per_mol,
        seqlen_range=seqlen,
        seed=seed,
    )
    from sarlacc_tpu.io.fastq import read_fastq

    batch = read_fastq(fp)
    os.remove(fp)
    return adaptor1, adaptor2, batch


def run_pipeline(adaptor1, adaptor2, batch, tolerance=250, timings=None):
    import sarlacc_tpu as st

    def mark(name):
        if timings is not None:
            timings.append((name, time.time()))

    mark("start")
    aligned = st.adaptor_align(
        adaptor1, adaptor2, reads=batch, tolerance=tolerance
    )
    mark("adaptor_align")
    umis = aligned["adaptor1"]["subseq"]["Sub2"]
    groups = st.umi_group(umis, threshold1=2)
    mark("umi_group")
    filt = [g for g in groups if len(g) >= 2]
    reads = st.realize_reads(aligned, reads=batch, trim=False)
    msa = st.multi_read_align(reads, groups=filt, bandwidth=100)
    mark("multi_read_align")
    cons = st.consensus_read_seq(msa)
    mark("consensus")
    return len(batch), len(cons)


def main():
    adaptor1, adaptor2, batch = build_workload()

    # Warmup on the full workload so every bucket shape is compiled; the
    # measured pass is steady-state streaming throughput.
    run_pipeline(adaptor1, adaptor2, batch)

    import sys

    timings: list = []
    t0 = time.time()
    nreads, ncons = run_pipeline(adaptor1, adaptor2, batch, timings=timings)
    elapsed = time.time() - t0

    for (name, t), (_, prev) in zip(timings[1:], timings[:-1]):
        print(f"[bench] {name}: {t - prev:.2f}s", file=sys.stderr)

    value = nreads / elapsed
    print(
        json.dumps(
            {
                "metric": "pipeline_reads_per_s",
                "value": round(value, 2),
                "unit": "reads/s/chip",
                "vs_baseline": round(value / NOMINAL_BASELINE_READS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

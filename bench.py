"""Benchmarks: end-to-end pipeline + BASELINE.json workload configs.

Configs (BASELINE.md / BASELINE.json):

* ``pipeline``   — mock long reads with planted adaptors, barcode and UMI ->
  adaptor_align -> umi_group -> multi_read_align -> consensus.  Headline
  metric: reads/s through the full correction pipeline.
* ``demux_100k`` — 100k reads x 2 adaptors (score-only strand resolution) +
  12 barcodes, the calibration/demux path.  Reports reads/s, measured DP
  GCUPS, and the fraction of the score kernel's VPU-issue roofline.
* ``umi_100k``   — 100k-UMI single pre-group thresholded grouping through
  the sparse device neighbour kernel.

``vs_baseline`` is relative to a nominal 100 reads/s/core estimate for the
reference's single-core C++ path on the pipeline workload (the reference
publishes no numbers — BASELINE.md; its own vignette calls the MSA "often
the most time-consuming step").  One warmup pass absorbs jit compilation,
mirroring steady-state streaming operation.

Output: ONE JSON line with the headline metric; per-config results ride in
the same object under ``configs`` and per-stage seconds under ``stages``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: TPU compiles through the remote tunnel are
# extremely slow; cache them across bench runs.  MUST go through the config
# API — the axon sitecustomize imports jax before this file runs, so the
# env-var route is silently ignored (utils/cache.py).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sarlacc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

NOMINAL_BASELINE_READS_PER_S = 100.0

# Speed-of-light for the score-only Pallas kernel: VPU issue rate =
# cores x 4 ALUs x (8 sublanes x 128 lanes) x clock, divided by the
# kernel's static issue-slot count per DP cell.  Census of the shipped
# column body (ops/pallas_align.py:_kernel, 4-column unroll so S/H state
# stays in registers between columns):
#   IUPAC bitmask probe (splat, >>, &1)            3
#   cost select (==, vsel)                          2
#   horizontal gap Hn (2 sub, max)                  3
#   diagonal M (roll, fill-select, add)             3
#   mv / ramped cum (max, add — open charge folded) 2
#   log-shift prefix-max, 8 stages x (roll,sel,max) 24
#   V close (roll, fill-select, sub)                3
#   final Sn (max)                                  1
#   cost-plane loads cm/cmm (dyn-indexed VMEM)      2
#   state stores S,H                                2
#   TOTAL                                          45
# This assumes every op (including cross-sublane rolls and VMEM moves)
# retires one slot/cycle — the honest static ceiling for THIS instruction
# stream; roofline_frac is measured device GCUPS against it.
_VPU_OPS_PER_S = {
    # chip kind -> (TensorCores, clock Hz)
    "v5e": 1 * 4 * (8 * 128) * 1.74e9,  # TPU v5 lite: 1 core @ ~1.74 GHz
    "v5p": 2 * 4 * (8 * 128) * 1.75e9,
}
KERNEL_OPS_PER_CELL = 45.0

#: Hardware-measured structural ceiling for the score kernel's shape
#: (serial column chain, l1=256, 128-lane blocks): the fully-ablated
#: skeleton variant's device rate (scripts/microbench_score_ablation.py,
#: v5e r4 — docs/kernel_roofline.md).  The static census roofline above is
#: kept for reference but measured both ways as wrong: plane-op throughput
#: is 2-3x nominal while the dependent column chain binds far below it.
#: Keyed by device kind — the figure is chip-specific, and reporting it on
#: an unmeasured generation would be wrong while looking authoritative
#: (ADVICE r4); ``roofline_frac`` is emitted only for measured chips.
MEASURED_ROOFLINE_GCUPS = {"v5e": 128.9}


def _device_kind_key() -> str:
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    return "v5e" if ("lite" in kind or "v5e" in kind) else kind or "unknown"


def _roofline_gcups() -> float:
    import jax

    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    key = "v5e" if ("lite" in kind or "v5e" in kind) else "v5p"
    return _VPU_OPS_PER_S[key] / KERNEL_OPS_PER_CELL / 1e9


def build_workload(n_molecules=950, reads_per_mol=(8, 14), seqlen=(400, 700), seed=7):
    """Mock long-read workload (default ~10k reads, VERDICT r2 #3).

    The UMI stretch is 12 bp: at 1000-molecule depth random 8-mers
    single-link into ~150-read mega-groups (8-mer space is only 65k), a
    regime no UMI protocol operates in — production designs use 10-16 bp
    UMIs precisely so groups stay at molecule granularity.
    """
    from sarlacc_tpu.io.mock import mock_reads
    import tempfile

    adaptor1 = "ACGCTAGCATCAGTC" + "NNNN" + "CACAGCTACGA" + "N" * 12 + "CGTACGCAT"
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


def bench_pipeline(n_molecules=950, warmup=True, passes=3):
    """Median-of-``passes`` timed pipeline runs.

    The shared TPU tunnel shows +/-30% wall drift across identical warm
    runs (docs/performance.md), so a single pass can't attribute
    round-over-round deltas; the median of 3 passes plus the min/max spread
    makes them trustworthy (VERDICT r4 #4).  Stage seconds come from the
    median pass.
    """
    adaptor1, adaptor2, batch = build_workload(n_molecules=n_molecules)
    if warmup:
        run_pipeline(adaptor1, adaptor2, batch)  # warmup: compile every bucket
        n_timed = passes
    else:
        # Unwarmed configs (pipeline_500k) fold compile cost into pass 1;
        # one pass only — the config exists to prove scale, not stability.
        n_timed = 1

    runs = []
    for _ in range(n_timed):
        timings: list = []
        t0 = time.time()
        nreads, _ = run_pipeline(adaptor1, adaptor2, batch, timings=timings)
        elapsed = time.time() - t0
        stages = {
            name: round(t - prev, 3)
            for (name, t), (_, prev) in zip(timings[1:], timings[:-1])
        }
        runs.append((elapsed, stages, nreads))
    runs.sort(key=lambda r: r[0])
    med = runs[len(runs) // 2]
    out = {
        "reads_per_s": round(med[2] / med[0], 2),
        "n_reads": med[2],
        "seconds": round(med[0], 3),
        "stages": med[1],
    }
    if n_timed > 1:
        out["passes"] = n_timed
        out["seconds_all"] = sorted(round(r[0], 3) for r in runs)
        out["spread_frac"] = round(
            (runs[-1][0] - runs[0][0]) / med[0], 3
        )
    return out


def _random_reads(n, length, seed):
    from sarlacc_tpu.core.encode import SeqBatch

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, (n, length)).astype(np.int8)
    lengths = np.full(n, length, dtype=np.int64)
    quals = rng.integers(20, 60, (n, length)).astype(np.uint8) + 33
    return SeqBatch(codes, lengths, quals, None)


def bench_demux(n_reads=100_000, tolerance=250, n_barcodes=12, bc_len=12, seed=3):
    """Score-only adaptor scan (strand resolution) + 12-barcode demux.

    Reports wall GCUPS over the whole demux pass AND pure device-kernel
    GCUPS (5-rep block_until_ready loop on prebuilt cost planes) — the
    roofline metric; the difference is dispatch + readback overhead through
    the remote tunnel (VERDICT r2 #1).
    """
    import jax
    import jax.numpy as jnp
    import sarlacc_tpu as st
    from sarlacc_tpu.api.align_internal import (
        align_scores_only, prepare_adaptor, prepare_scores_input,
        resolve_strand,
    )
    from sarlacc_tpu.ops.pallas_align import (
        fit_scores_from_planes, fit_scores_segments,
    )

    a1 = prepare_adaptor("ACGCTAGCATCAGTCNNNNCACAGCTACGA" + "N" * 12 + "CGTACGCAT")
    a2 = prepare_adaptor("TGCATCGATCGCAT")
    front = _random_reads(n_reads, tolerance, seed)
    back = _random_reads(n_reads, tolerance, seed + 1)
    rng = np.random.default_rng(seed + 2)
    barcodes = [
        "".join(rng.choice(list("ACGT"), bc_len)) for _ in range(n_barcodes)
    ]
    observed = _random_reads(n_reads, bc_len, seed + 3)

    # One upload + one cost-plane build per batch, reused by both adaptors
    # and every tuning/threshold launch (the production pattern).
    pfront = prepare_scores_input(a1, front)
    pback = prepare_scores_input(a1, back)
    l1, n_pad = pfront.plane_geometry()
    segs = [
        (a1.modes, a1.matched, 5.0, 1.0, True),
        (a2.modes, a2.matched, 5.0, 1.0, True),
    ]

    use_segments = True

    def one_pass():
        nonlocal use_segments
        if use_segments:
            try:
                # Both adaptors per batch ride ONE multi-segment launch; the
                # two launches' [2, n] outputs stack into ONE readback.
                sf = fit_scores_segments(pfront.planes(), pfront.lengths,
                                         segs, l1=l1, n_pad=n_pad)
                sb = fit_scores_segments(pback.planes(), pback.lengths,
                                         segs, l1=l1, n_pad=n_pad)
                s = np.asarray(
                    jnp.concatenate([sf, sb])[:, :n_reads], dtype=np.float64
                )  # ONE readback: a1@front, a2@front, a1@back, a2@back
                resolve_strand(s[0], s[3], s[2], s[1])
                st.barcode_align(observed, barcodes)
                return
            except Exception as e:
                print(f"[bench] segments demux unavailable: {str(e)[:120]}",
                      file=sys.stderr)
                use_segments = False
        dev = [
            align_scores_only(a1, None, 5.0, 1.0, prepared=pfront, as_device=True),
            align_scores_only(a2, None, 5.0, 1.0, prepared=pback, as_device=True),
            align_scores_only(a1, None, 5.0, 1.0, prepared=pback, as_device=True),
            align_scores_only(a2, None, 5.0, 1.0, prepared=pfront, as_device=True),
        ]
        s = np.asarray(jnp.stack(dev), dtype=np.float64)  # ONE readback
        resolve_strand(s[0], s[1], s[2], s[3])
        st.barcode_align(observed, barcodes)

    one_pass()  # warmup/compile
    t0 = time.time()
    one_pass()
    elapsed = time.time() - t0

    # Pure kernel device time: the roofline numerator.
    l1, n_pad = pfront.plane_geometry()
    planes = pfront.planes()
    kargs = (planes, pfront.lengths, a1.modes, a1.matched, 5.0, 1.0)
    out = fit_scores_from_planes(*kargs, l1=l1, n_pad=n_pad)
    jax.block_until_ready(out)
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = fit_scores_from_planes(*kargs, l1=l1, n_pad=n_pad)
    jax.block_until_ready(out)
    kdt = (time.time() - t0) / reps
    kcells = n_pad * l1 * len(a1)

    cells = n_reads * tolerance * 2 * (len(a1) + len(a2))
    roofline = _roofline_gcups()
    kernel_gcups = kcells / kdt / 1e9
    out = {
        "reads_per_s": round(n_reads / elapsed, 1),
        "n_reads": n_reads,
        "seconds": round(elapsed, 3),
        "dp_cells": int(cells),
        "gcups_wall": round(cells / elapsed / 1e9, 2),
        "kernel_ms": round(kdt * 1e3, 2),
        "kernel_gcups": round(kernel_gcups, 2),
        "census_roofline_gcups": round(roofline, 1),
    }
    measured = MEASURED_ROOFLINE_GCUPS.get(_device_kind_key())
    if measured:  # only on chips the ceiling was actually measured on
        out["measured_roofline_gcups"] = measured
        out["roofline_frac"] = round(kernel_gcups / measured, 4)
    return out


def bench_umi(n_umis=100_000, umi_len=10, n_clusters=20_000, threshold=2,
              seed=5, warmup=True):
    """Single-pre-group thresholded UMI grouping at scale: symmetric-delete
    candidate filter + device DP verification (BASELINE.json configs list
    1M-read UMI grouping; ``umi_1m`` uses 12 bp UMIs so the problem itself
    stays sparse at that depth)."""
    import sarlacc_tpu as st
    from sarlacc_tpu.core.encode import SeqBatch

    rng = np.random.default_rng(seed)
    centers = rng.integers(0, 4, (n_clusters, umi_len)).astype(np.int8)
    pick = rng.integers(0, n_clusters, n_umis)
    codes = centers[pick]
    # mutate ~30% of reads by 1 base
    mut = rng.random(n_umis) < 0.3
    pos = rng.integers(0, umi_len, n_umis)
    sub = rng.integers(0, 4, n_umis).astype(np.int8)
    codes[mut, pos[mut]] = sub[mut]
    batch = SeqBatch(codes, np.full(n_umis, umi_len, np.int64), None, None)

    if warmup:  # compile every verify-kernel bucket
        st.umi_group(batch.take(np.arange(n_umis // 4)), threshold1=threshold)
    t0 = time.time()
    groups = st.umi_group(batch, threshold1=threshold)
    elapsed = time.time() - t0
    return {
        "umis_per_s": round(n_umis / elapsed, 1),
        "n_umis": n_umis,
        "n_groups": len(groups),
        "seconds": round(elapsed, 3),
    }


def main():
    configs: dict = {}
    t_all = time.time()
    configs["pipeline"] = bench_pipeline()
    print(f"[bench] pipeline: {configs['pipeline']}", file=sys.stderr)
    if os.environ.get("SARLACC_BENCH_FULL"):
        # Vignette-scale config (BASELINE.json: "~500k reads"): ~50 min on
        # one v5e chip, so it only runs when explicitly requested.
        try:
            # No second warmup pass: the 10k pipeline above already compiled
            # the shared buckets and the persistent cache covers the rest —
            # a warmed 500k pass doubles a ~40 min config for <2% effect.
            configs["pipeline_500k"] = bench_pipeline(
                n_molecules=47_500, warmup=False
            )
            print(
                f"[bench] pipeline_500k: {configs['pipeline_500k']}",
                file=sys.stderr,
            )
        except Exception as e:
            configs["pipeline_500k"] = {"error": str(e)[:200]}
    try:
        configs["demux_100k"] = bench_demux()
        print(f"[bench] demux_100k: {configs['demux_100k']}", file=sys.stderr)
    except Exception as e:  # never lose the headline metric
        configs["demux_100k"] = {"error": str(e)[:200]}
    try:
        configs["umi_100k"] = bench_umi()
        print(f"[bench] umi_100k: {configs['umi_100k']}", file=sys.stderr)
    except Exception as e:
        configs["umi_100k"] = {"error": str(e)[:200]}
    try:
        configs["umi_1m"] = bench_umi(
            n_umis=1_000_000, umi_len=12, n_clusters=200_000, seed=9,
            warmup=False,  # umi_100k already compiled the kernels
        )
        print(f"[bench] umi_1m: {configs['umi_1m']}", file=sys.stderr)
    except Exception as e:
        configs["umi_1m"] = {"error": str(e)[:200]}

    value = configs["pipeline"]["reads_per_s"]
    out = {
        "metric": "pipeline_reads_per_s",
        "value": value,
        "unit": "reads/s/chip",
        "vs_baseline": round(value / NOMINAL_BASELINE_READS_PER_S, 3),
        "stages": configs["pipeline"]["stages"],
        "configs": configs,
        "total_bench_seconds": round(time.time() - t_all, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

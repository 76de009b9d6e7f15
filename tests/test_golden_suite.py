"""Seed-locked golden snapshots for the paths the single pipeline golden
does not pin: dual-UMI grouping, solexa/illumina quality encodings, barcode
demux + thresholds, and the curated indel suite.

Mirrors the reference's fixture strategy
(/root/reference/tests/testthat/test-adaptor-align.R:7-19,142-184 and
test-umicluster.R:167-208): seeded generators, curated corner cases, and
byte-for-byte assertions — the safety net under performance refactors.

Regenerate (only after a *deliberate, documented* semantic change):
    SARLACC_REGEN_GOLDEN=1 python -m pytest tests/test_golden_suite.py
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _check(name: str, snap: dict):
    path = GOLDEN_DIR / name
    if os.environ.get("SARLACC_REGEN_GOLDEN"):
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_text(json.dumps(snap, indent=1))
        raise AssertionError(f"golden {name} regenerated; rerun without SARLACC_REGEN_GOLDEN")
    want = json.loads(path.read_text())
    assert sorted(snap) == sorted(want)
    for key in want:
        assert snap[key] == want[key], f"golden mismatch in {name}:{key!r}"


def _mutate_umis(rng, centers, n, umi_len, with_n=False):
    """Noisy UMI draws from a center set (substitutions + occasional N)."""
    pick = rng.integers(0, centers.shape[0], n)
    codes = centers[pick].copy()
    mut = rng.random(n) < 0.4
    pos = rng.integers(0, umi_len, n)
    codes[mut, pos[mut]] = rng.integers(0, 4, n)[mut]
    if with_n:
        nmask = rng.random(n) < 0.15
        npos = rng.integers(0, umi_len, n)
        codes[nmask, npos[nmask]] = 4  # masked base
    return codes


def test_golden_dual_umi():
    """Dual-UMI grouping: UMI2-query emission order intersected against UMI1
    (src/umi_group.cpp:65-102), with N-masked bases in play, plus the
    expected_dist calibration vector (R/expectedDist.R)."""
    import sarlacc_tpu as st
    from sarlacc_tpu.core.encode import SeqBatch

    rng = np.random.default_rng(20250820)
    L1, L2, n = 8, 6, 120
    centers1 = rng.integers(0, 4, (18, L1)).astype(np.int8)
    centers2 = rng.integers(0, 4, (18, L2)).astype(np.int8)
    c1 = _mutate_umis(rng, centers1, n, L1, with_n=True)
    c2 = _mutate_umis(rng, centers2, n, L2, with_n=True)
    u1 = SeqBatch(c1, np.full(n, L1, np.int64), None, None)
    u2 = SeqBatch(c2, np.full(n, L2, np.int64), None, None)

    groups_dual = st.umi_group(u1, threshold1=2, umi2=u2, threshold2=1)
    groups_solo = st.umi_group(u1, threshold1=2)
    # Pre-grouped (factor vector) path, R split() order.
    pregroups = rng.integers(0, 4, n)
    groups_pre = st.umi_group(u1, threshold1=2, umi2=u2, threshold2=1,
                              groups=pregroups)
    edist = st.expected_dist(u1.take(np.arange(40)))

    snap = {
        "umi1": u1.seq_strings(),
        "umi2": u2.seq_strings(),
        "groups_dual": [[int(i) for i in g] for g in groups_dual],
        "groups_solo": [[int(i) for i in g] for g in groups_solo],
        "groups_pre": [[int(i) for i in g] for g in groups_pre],
        "expected_dist": [float(d) for d in edist],
    }
    _check("dual_umi.json", snap)


ADAPTOR1 = "ACGCTAGCATCAGTC" + "NNNN" + "CACAGCTACGA" + "NNNNNNNN" + "CGTACGCAT"
ADAPTOR2 = "TGCATCGATCGCAT"


def test_golden_encodings():
    """adaptor_align + quality_mask under solexa and illumina encodings
    (.qual2class, R/adaptorAlign.R:97-99; table semantics R/qualityMask.R:19-28)."""
    import sarlacc_tpu as st
    from sarlacc_tpu.core.encode import SeqBatch
    from sarlacc_tpu.io.fastq import read_fastq
    from sarlacc_tpu.io.mock import mock_reads

    fp = tempfile.mktemp(suffix=".fastq")
    mock_reads(ADAPTOR1, ADAPTOR2, fp, nmolecules=6, nreads_range=(3, 6),
               seqlen_range=(300, 500), seed=77)
    batch = read_fastq(fp)
    os.remove(fp)

    snap = {}
    for qt, (lo, hi) in (("solexa", (59 + 10, 122)), ("illumina", (64 + 8, 126))):
        # Re-map the mock phred qualities into the encoding's char range.
        rng = np.random.default_rng(5)
        quals = rng.integers(lo, hi, batch.codes.shape).astype(np.uint8)
        b = SeqBatch(batch.codes, batch.lengths, quals, batch.names)
        aligned = st.adaptor_align(ADAPTOR1, ADAPTOR2, reads=b, tolerance=200,
                                   qual_type=qt)
        masked = st.quality_mask(b, max_err=0.05, qual_type=qt)
        snap[qt] = {
            "a1_score": [round(float(s), 4) for s in aligned["adaptor1"]["score"]],
            "a1_start": [int(x) for x in aligned["adaptor1"]["start"]],
            "a1_end": [int(x) for x in aligned["adaptor1"]["end"]],
            "a2_score": [round(float(s), 4) for s in aligned["adaptor2"]["score"]],
            "reversed": [bool(r) for r in aligned["reversed"]],
            "umi": aligned["adaptor1"]["subseq"]["Sub2"].seq_strings(),
            "masked_first10": masked.take(np.arange(10)).seq_strings(),
        }
    _check("encodings.json", snap)


def test_golden_barcode_demux():
    """Barcode planting -> adaptor_align -> barcode_align -> thresholds
    (R/barcodeAlign.R:20-38, R/getBarcodeThresholds.R:10-14)."""
    import sarlacc_tpu as st
    from sarlacc_tpu.io.fastq import read_fastq
    from sarlacc_tpu.io.mock import mock_reads

    rng = np.random.default_rng(11)
    barcodes = ["".join(rng.choice(list("ACGT"), 4)) for _ in range(6)]
    fp = tempfile.mktemp(suffix=".fastq")
    mock_reads(ADAPTOR1, ADAPTOR2, fp, all_barcodes=barcodes, nmolecules=12,
               nreads_range=(3, 6), seqlen_range=(300, 500), seed=42)
    batch = read_fastq(fp)
    os.remove(fp)

    aligned = st.adaptor_align(ADAPTOR1, ADAPTOR2, reads=batch, tolerance=200)
    observed = aligned["adaptor1"]["subseq"]["Sub1"]
    baligned = st.barcode_align(observed, barcodes)
    thr = st.get_barcode_thresholds(baligned, nmads=3)

    snap = {
        "barcodes": barcodes,
        "observed": observed.seq_strings(),
        "assigned": [int(b) for b in baligned["barcode"]],
        "score": [round(float(s), 4) for s in baligned["score"]],
        "gap": [round(float(g), 4) for g in baligned["gap"]],
        "thr_score": round(thr["score"], 4),
        "thr_gap": round(thr["gap"], 4),
    }
    _check("barcode_demux.json", snap)


def test_golden_indel_suite():
    """Curated indel/substitution reads through the full coordinate +
    subsequence extraction path (test-adaptor-align.R:7-19 analog): each case
    plants a known edit inside the adaptor region and pins scores, spans and
    extracted sections byte-for-byte."""
    import sarlacc_tpu as st

    from sarlacc_tpu.core.encode import SeqBatch

    adaptor = "ACGTACGTAA" + "NNNNN" + "TTGCAGCATT"
    base = "ACGTACGTAA" + "GGCCA" + "TTGCAGCATT"
    cases = [
        base,                                    # exact
        base[:4] + base[5:],                     # deletion in adaptor prefix
        base[:7] + "TT" + base[7:],              # insertion in adaptor prefix
        base[:12] + base[13:],                   # deletion inside the UMI
        base[:12] + "A" + base[12:],             # insertion inside the UMI
        base[:22] + "C" + base[23:],             # substitution in suffix
        base[2:],                                # truncated front
        base[:-3],                               # truncated back
        "",                                      # empty read
        base[::-1],                              # garbage (reversed)
    ]
    reads = ["GGAT" + c + "CCTA" if c else "" for c in cases]
    quals = ["J" * len(r) for r in reads]  # near-certain bases
    batch = SeqBatch.from_strings(reads, quals=quals)
    aligned = st.adaptor_align(adaptor, "TGCATCGATCGCAT", reads=batch,
                               tolerance=40)
    f = aligned["adaptor1"]
    snap = {
        "reads": reads,
        "score": [round(float(s), 4) for s in f["score"]],
        "start": [int(x) for x in f["start"]],
        "end": [int(x) for x in f["end"]],
        "umi": f["subseq"]["Sub1"].seq_strings(),
        "reversed": [bool(r) for r in aligned["reversed"]],
    }
    _check("indel_suite.json", snap)

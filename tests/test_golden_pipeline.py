"""Seed-locked golden snapshot of the full mock-reads pipeline.

The reference pins end-to-end behaviour with seeded testthat fixtures
(/root/reference/tests/testthat/test-adaptor-align.R:141-184); this is the
equivalent guard for the whole correction pipeline: adaptor coordinates,
strand calls, UMI groups, MSA strings, and consensus sequence + qualities
are asserted byte-for-byte against a checked-in snapshot, so perf refactors
cannot silently shift semantics.

Regenerate (only after a *deliberate, documented* semantic change):
    SARLACC_REGEN_GOLDEN=1 python -m pytest tests/test_golden_pipeline.py
"""

from __future__ import annotations

import json
import os
import pathlib
import tempfile

import numpy as np

GOLDEN = pathlib.Path(__file__).parent / "golden" / "pipeline_mock.json"

ADAPTOR1 = "ACGCTAGCATCAGTC" + "NNNN" + "CACAGCTACGA" + "NNNNNNNN" + "CGTACGCAT"
ADAPTOR2 = "TGCATCGATCGCAT"


def _run_pipeline():
    import sarlacc_tpu as st
    from sarlacc_tpu.io.fastq import read_fastq
    from sarlacc_tpu.io.mock import mock_reads

    fp = tempfile.mktemp(suffix=".fastq")
    mock_reads(
        ADAPTOR1,
        ADAPTOR2,
        fp,
        nmolecules=10,
        nreads_range=(4, 9),
        seqlen_range=(350, 600),
        seed=20240817,
    )
    batch = read_fastq(fp)
    os.remove(fp)

    aligned = st.adaptor_align(ADAPTOR1, ADAPTOR2, reads=batch, tolerance=250)
    umis = aligned["adaptor1"]["subseq"]["Sub2"]
    groups = st.umi_group(umis, threshold1=2)
    filt = [g for g in groups if len(g) >= 2]
    reads = st.realize_reads(aligned, reads=batch, trim=False)
    msa = st.multi_read_align(reads, groups=filt, bandwidth=100)
    cons = st.consensus_read_seq(msa)

    snap = {
        "n_reads": int(len(batch)),
        "adaptor1_score": [round(float(s), 4) for s in aligned["adaptor1"]["score"]],
        "adaptor1_start": [int(x) for x in aligned["adaptor1"]["start"]],
        "adaptor1_end": [int(x) for x in aligned["adaptor1"]["end"]],
        "adaptor2_score": [round(float(s), 4) for s in aligned["adaptor2"]["score"]],
        "adaptor2_start": [int(x) for x in aligned["adaptor2"]["start"]],
        "adaptor2_end": [int(x) for x in aligned["adaptor2"]["end"]],
        "reversed": [bool(r) for r in aligned["reversed"]],
        "umi": umis.seq_strings(),
        "groups": [[int(i) for i in g] for g in groups],
        "alignments": [list(a) for a in msa["alignments"]],
        "consensus_seq": cons.seq_strings(),
        "consensus_qual": cons.qual_strings(),
    }
    return snap


def test_golden_pipeline_snapshot():
    snap = _run_pipeline()
    if os.environ.get("SARLACC_REGEN_GOLDEN"):
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(snap, indent=1))
        raise AssertionError("golden regenerated; rerun without SARLACC_REGEN_GOLDEN")
    want = json.loads(GOLDEN.read_text())
    assert sorted(snap) == sorted(want)
    for key in want:
        assert snap[key] == want[key], f"golden mismatch in {key!r}"

"""Masking/unmasking tests (reference test-masking.R model)."""

import numpy as np
import pytest

from sarlacc_tpu.api.umi import quality_mask
from sarlacc_tpu.core.encode import SeqBatch
from sarlacc_tpu.core.quality import get_encoding
from sarlacc_tpu.refimpl.masking import mask_bad_bases, unmask_alignment

ENC = get_encoding("phred")


def test_mask_elementwise_oracle(rng):
    # Direct elementwise check (test-masking.R:5-41).
    for rep in range(10):
        n = int(rng.integers(1, 8))
        seqs, quals = [], []
        for _ in range(n):
            ln = int(rng.integers(1, 30))
            seqs.append("".join(rng.choice(list("ACGT"), ln)))
            quals.append("".join(chr(int(c)) for c in rng.integers(33, 70, ln)))
        batch = SeqBatch.from_strings(seqs, quals)
        thr = float(rng.uniform(0.001, 0.2))
        out = mask_bad_bases(batch, ENC, thr).seq_strings()
        for s, q, o in zip(seqs, quals, out):
            expect = "".join(
                "N" if ENC.to_error_scalar(c) > thr else b for b, c in zip(s, q)
            )
            assert o == expect


def test_quality_mask_none_drops_quals():
    batch = SeqBatch.from_strings(["ACGT"], ["II#I"])
    out = quality_mask(batch, None)
    assert out.quals is None
    assert out.seq_strings() == ["ACGT"]


def test_mask_requires_quals():
    with pytest.raises(ValueError, match="qualities"):
        quality_mask(SeqBatch.from_strings(["ACGT"]), 0.01)


def test_unmask_structured_cases():
    # Deletions at start/middle/end (test-masking.R:57-91).
    assert unmask_alignment(["NCGT"], ["ACGT"]) == ["ACGT"]
    assert unmask_alignment(["--NNGT"], ["TAGT"]) == ["--TAGT"]
    assert unmask_alignment(["AC--NT"], ["ACGT"]) == ["AC--GT"]
    assert unmask_alignment(["ACN---"], ["ACG"]) == ["ACG---"]
    assert unmask_alignment(["A-n-T"], ["ACT"]) == ["A-C-T"]
    # Multiple rows.
    assert unmask_alignment(["NN-", "-NN"], ["AC", "GT"]) == ["AC-", "-GT"]


def test_unmask_error_cases():
    with pytest.raises(ValueError, match="same number"):
        unmask_alignment(["AC"], ["AC", "GT"])
    with pytest.raises(ValueError, match="equal width"):
        unmask_alignment(["AC", "A"], ["AC", "A"])
    with pytest.raises(ValueError, match="longer than the original"):
        unmask_alignment(["ACN"], ["AC"])
    with pytest.raises(ValueError, match="different lengths"):
        unmask_alignment(["AC"], ["ACG"])

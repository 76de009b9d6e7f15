"""Frame container, FASTQ/SAM I/O, and simulator tests."""

import os
import tempfile

import numpy as np
import pytest

from sarlacc_tpu.core.encode import SeqBatch
from sarlacc_tpu.core.frame import Frame
from sarlacc_tpu.io.fastq import (
    count_fastq,
    read_fastq,
    sample_fastq,
    stream_fastq,
    write_fastq,
)
from sarlacc_tpu.io.mock import mock_reads
from sarlacc_tpu.io.sam import cigar_ref_width, clip_length, sam2ranges


def test_frame_basics():
    f = Frame(a=np.arange(4), b=["w", "x", "y", "z"])
    assert len(f) == 4 and f.colnames == ["a", "b"]
    sub = f.take([2, 0])
    assert sub["a"].tolist() == [2, 0] and sub["b"] == ["y", "w"]
    mask = f.take(np.array([True, False, True, False]))
    assert mask["a"].tolist() == [0, 2]
    merged = Frame.rbind([f, f])
    assert len(merged) == 8
    with pytest.raises(ValueError, match="length"):
        Frame(a=np.arange(3), b=[1, 2])


def test_frame_nested_and_batch_columns():
    inner = Frame(x=np.arange(3))
    batch = SeqBatch.from_strings(["AA", "CC", "GG"])
    f = Frame(inner=inner, seqs=batch, v=np.arange(3))
    sub = f.take([1, 2])
    assert sub["inner"]["x"].tolist() == [1, 2]
    assert sub["seqs"].seq_strings() == ["CC", "GG"]
    merged = Frame.rbind([f, f.take([0])])
    assert merged["seqs"].seq_strings() == ["AA", "CC", "GG", "AA"]
    empty = Frame(nrow=5)
    assert len(empty) == 5 and len(empty.take([0, 1])) == 2


def test_fastq_roundtrip_and_stream():
    fp = tempfile.mktemp(suffix=".fastq")
    seqs = ["ACGT", "GGCCA", "T"]
    quals = ["III!", "ABCDE", "~"]
    names = ["r1", "r2", "r3"]
    write_fastq(fp, seqs=seqs, quals=quals, names=names)
    back = read_fastq(fp)
    assert back.seq_strings() == seqs
    assert back.qual_strings() == quals
    assert back.names == names
    assert count_fastq(fp) == 3
    chunks = list(stream_fastq(fp, chunk_size=2))
    assert [len(c) for c in chunks] == [2, 1]
    sampled = sample_fastq(fp, 2, seed=1)
    assert len(sampled) == 2
    os.remove(fp)


def test_fastq_gzip_roundtrip():
    fp = tempfile.mktemp(suffix=".fastq.gz")
    write_fastq(fp, seqs=["ACGT"], quals=["IIII"], names=["a"])
    assert read_fastq(fp).seq_strings() == ["ACGT"]
    os.remove(fp)


def test_fastq_malformed():
    fp = tempfile.mktemp(suffix=".fastq")
    open(fp, "w").write("not a fastq\n")
    with pytest.raises(ValueError, match="header"):
        read_fastq(fp)
    open(fp, "w").write("@r1\nACGT\n+\nIII\n")
    with pytest.raises(ValueError, match="lengths differ"):
        read_fastq(fp)
    os.remove(fp)


def test_mock_reads_deterministic():
    fp1 = tempfile.mktemp(suffix=".fastq")
    fp2 = tempfile.mktemp(suffix=".fastq")
    a1 = "ACGTNNNNACGTNNNNNNGGTT"
    refs1, _ = mock_reads(a1, "TTGGCCAA", fp1, nmolecules=2, nreads_range=(3, 5),
                          seqlen_range=(50, 80), seed=11)
    refs2, _ = mock_reads(a1, "TTGGCCAA", fp2, nmolecules=2, nreads_range=(3, 5),
                          seqlen_range=(50, 80), seed=11)
    assert refs1 == refs2
    assert open(fp1).read() == open(fp2).read()
    # Reads embed the adaptor prefix (up to noise) and references carry it.
    assert all(r.startswith("ACGT") for r in refs1)
    os.remove(fp1)
    os.remove(fp2)


def test_cigar_helpers():
    assert cigar_ref_width("10M") == 10
    assert cigar_ref_width("5S10M3D2I10M2H") == 23
    assert cigar_ref_width("10M100N10M") == 120
    assert clip_length("5S10M", True) == 5
    assert clip_length("3H5S10M", True) == 8
    assert clip_length("10M4S2H", False) == 6
    assert clip_length("10M", False) == 0


def test_sam2ranges():
    fp = tempfile.mktemp(suffix=".sam")
    with open(fp, "w") as fh:
        fh.write("@HD\tVN:1.6\n@SQ\tSN:chrA\tLN:500\n@SQ\tSN:chrB\tLN:300\n")
        fh.write("r1\t0\tchrA\t10\t60\t50M\t*\t0\t0\t*\t*\n")
        fh.write("r2\t16\tchrB\t20\t60\t10S40M\t*\t0\t0\t*\t*\n")
        fh.write("r3\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*\n")
        fh.write("r4\t0\tchrA\t5\t2\t30M\t*\t0\t0\t*\t*\n")
    out = sam2ranges(fp, minq=10)
    assert out.rownames == ["r1", "r2"]
    assert out["strand"] == ["+", "-"]
    assert out["left.clip"].tolist() == [0, 10]
    assert out.metadata["seqlengths"] == {"chrA": 500, "chrB": 300, "*": 0}
    # restricted / no-minq variants
    assert sam2ranges(fp, minq=None).rownames == ["r1", "r2", "r4"]
    assert sam2ranges(fp, minq=None, restricted=["chrB"]).rownames == ["r2"]
    os.remove(fp)

"""Checkpointing and profiling utility tests."""

import os
import tempfile

import numpy as np

from sarlacc_tpu.core.encode import SeqBatch
from sarlacc_tpu.core.frame import Frame
from sarlacc_tpu.utils import PipelineProfiler, load_frame, save_frame


def test_frame_roundtrip():
    inner = Frame(score=np.arange(3.0), start=np.arange(3, dtype=np.int32))
    inner.metadata = {"sequence": "ACGT", "gapOpening": 5}
    batch = SeqBatch.from_strings(["AC", "GGT", "T"], ["II", "JJJ", "K"], ["a", "b", "c"])
    f = Frame(
        {"w": np.asarray([10, 20, 30]), "sub": inner, "seqs": batch,
         "labels": ["x", "y", "z"]},
        metadata={"filepath": "/tmp/x.fastq", "tolerance": 250,
                  "trans": np.eye(4, dtype=np.int64)},
        rownames=["r1", "r2", "r3"],
    )
    fp = tempfile.mktemp(suffix=".npz")
    save_frame(f, fp)
    g = load_frame(fp)
    assert len(g) == 3 and g.rownames == ["r1", "r2", "r3"]
    assert np.array_equal(g["w"], f["w"])
    assert g["labels"] == ["x", "y", "z"]
    assert g["sub"].metadata["sequence"] == "ACGT"
    assert np.array_equal(g["sub"]["score"], inner["score"])
    assert g["seqs"].seq_strings() == ["AC", "GGT", "T"]
    assert g["seqs"].qual_strings() == ["II", "JJJ", "K"]
    assert g["seqs"].names == ["a", "b", "c"]
    assert g.metadata["tolerance"] == 250
    assert np.array_equal(g.metadata["trans"], np.eye(4, dtype=np.int64))
    os.remove(fp)


def test_profiler():
    p = PipelineProfiler()
    with p.stage("align", items=100, cells=1000):
        pass
    with p.stage("align", items=50):
        pass
    st = p.stages["align"]
    assert st.calls == 2 and st.items == 150 and st.cells == 1000
    assert "align" in p.report()

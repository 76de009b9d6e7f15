"""Every heavy API accepts ``mesh=`` (the BPPARAM analog — R/adaptorAlign.R:8,
R/tuneAlignment.R:8, R/getAdaptorThresholds.R:6, R/barcodeAlign.R:4,
R/multiReadAlign.R:7, R/extractSubseq.R:5) and produces results identical to
the single-device run on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from sarlacc_tpu.core.encode import SeqBatch


@pytest.fixture(scope="module")
def mesh():
    from sarlacc_tpu.parallel import make_mesh

    return make_mesh(8)


@pytest.fixture(scope="module")
def workload():
    import os
    import tempfile

    from sarlacc_tpu.io.fastq import read_fastq
    from sarlacc_tpu.io.mock import mock_reads

    a1 = "ACGCTAGCATCAGTC" + "NNNN" + "CACAGCTACGA" + "NNNNNNNN" + "CGTACGCAT"
    a2 = "TGCATCGATCGCAT"
    fp = tempfile.mktemp(suffix=".fastq")
    mock_reads(
        a1, a2, fp,
        nmolecules=6, nreads_range=(3, 6), seqlen_range=(250, 420), seed=11,
    )
    batch = read_fastq(fp)
    os.remove(fp)
    return a1, a2, batch


def test_adaptor_align_mesh_equal(workload, mesh):
    import sarlacc_tpu as st

    a1, a2, batch = workload
    serial = st.adaptor_align(a1, a2, reads=batch, tolerance=120)
    sharded = st.adaptor_align(a1, a2, reads=batch, tolerance=120, mesh=mesh)
    np.testing.assert_allclose(
        sharded["adaptor1"]["score"], serial["adaptor1"]["score"], rtol=1e-6
    )
    np.testing.assert_array_equal(sharded["adaptor1"]["start"], serial["adaptor1"]["start"])
    np.testing.assert_array_equal(sharded["adaptor2"]["end"], serial["adaptor2"]["end"])
    np.testing.assert_array_equal(sharded["reversed"], serial["reversed"])


def test_tune_alignment_mesh_equal(workload, mesh):
    import sarlacc_tpu as st

    a1, a2, batch = workload
    kw = dict(reads=batch, tolerance=100, gap_op_range=(4, 5), gap_ext_range=(1, 2))
    serial = st.tune_alignment(a1, a2, **kw)
    sharded = st.tune_alignment(a1, a2, mesh=mesh, **kw)
    assert sharded["parameters"] == serial["parameters"]
    np.testing.assert_allclose(
        sharded["scores"]["reads"], serial["scores"]["reads"], rtol=1e-6
    )


def test_get_adaptor_thresholds_mesh_equal(workload, mesh):
    import sarlacc_tpu as st

    a1, a2, batch = workload
    aligned = st.adaptor_align(a1, a2, reads=batch, tolerance=120)
    serial = st.get_adaptor_thresholds(aligned, error=0.1, reads=batch)
    sharded = st.get_adaptor_thresholds(aligned, error=0.1, reads=batch, mesh=mesh)
    assert sharded["threshold1"] == pytest.approx(serial["threshold1"], rel=1e-6)
    assert sharded["threshold2"] == pytest.approx(serial["threshold2"], rel=1e-6)
    # psum'd global histograms: replicated, one count per real read.
    assert int(sharded["histogram1"].sum()) == len(batch)
    assert int(sharded["histogram2"].sum()) == len(batch)


def test_barcode_align_mesh_equal(mesh):
    import sarlacc_tpu as st

    rng = np.random.default_rng(3)
    barcodes = ["ACGTACGTAC", "TTGACCAGTA", "CAGGTTACCA"]
    seqs, quals = [], []
    for i in range(23):
        base = list(barcodes[i % 3])
        if i % 4 == 0:
            base[2] = "T" if base[2] != "T" else "A"
        seqs.append("".join(base))
        quals.append("".join(chr(int(c)) for c in rng.integers(40, 70, len(base))))
    batch = SeqBatch.from_strings(seqs, quals)
    serial = st.barcode_align(batch, barcodes)
    sharded = st.barcode_align(batch, barcodes, mesh=mesh)
    np.testing.assert_array_equal(sharded["barcode"], serial["barcode"])
    np.testing.assert_allclose(sharded["score"], serial["score"], rtol=1e-6)
    np.testing.assert_allclose(sharded["gap"], serial["gap"], rtol=1e-6)


def test_msa_and_consensus_mesh_equal(workload, mesh):
    import sarlacc_tpu as st

    a1, a2, batch = workload
    aligned = st.adaptor_align(a1, a2, reads=batch, tolerance=120)
    umis = aligned["adaptor1"]["subseq"]["Sub2"]
    groups = [g for g in st.umi_group(umis, threshold1=2) if len(g) >= 2]
    reads = st.realize_reads(aligned, reads=batch, trim=False)

    serial_msa = st.multi_read_align(reads, groups=groups, bandwidth=100)
    sharded_msa = st.multi_read_align(reads, groups=groups, bandwidth=100, mesh=mesh)
    assert list(sharded_msa["alignments"]) == list(serial_msa["alignments"])

    serial_cons = st.consensus_read_seq(serial_msa)
    sharded_cons = st.consensus_read_seq(sharded_msa, mesh=mesh)
    assert sharded_cons.seq_strings() == serial_cons.seq_strings()
    assert sharded_cons.qual_strings() == serial_cons.qual_strings()


def test_extract_subseq_mesh_equal(workload, mesh):
    import sarlacc_tpu as st

    a1, a2, batch = workload
    aligned = st.adaptor_align(a1, a2, reads=batch, tolerance=120)
    sections = ([16], [19])  # the first N-stretch of adaptor1
    serial = st.extract_subseq(aligned, subseq1=sections, reads=batch)
    sharded = st.extract_subseq(aligned, subseq1=sections, reads=batch, mesh=mesh)
    assert (
        serial["adaptor1"]["Sub1"].seq_strings()
        == sharded["adaptor1"]["Sub1"].seq_strings()
    )

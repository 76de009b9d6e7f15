"""Pallas score-kernel parity (interpret mode) against the XLA scan path.

The kernel is the production TPU scorer for tuning/thresholding/demux
(fitting mode) and barcode assignment (global mode); CPU CI runs it under
``interpret=True`` against the oracle-validated scan (test_device_align.py
ties the scan itself to refimpl).  Covers the shared-cost-plane path used
by PreparedReads — one plane build, many adaptors/penalties.
"""

import numpy as np
import pytest

from sarlacc_tpu.api.align_internal import prepare_adaptor
from sarlacc_tpu.core.encode import SeqBatch
from sarlacc_tpu.ops.align import dp_align, prepare_reads
from sarlacc_tpu.ops.pallas_align import (
    build_cost_planes,
    fit_dirs_pallas,
    fit_scores_from_planes,
    fit_scores_pallas,
    plane_dims,
)

ADAPTOR = "ACGCTAGCATCAGTCNNNNCACAGCTACGANNNNNNNNCGTACGCAT"
BARCODE = "ACGTTGCACGTA"


def _batch(rng, n=37, minl=0, maxl=60):
    seqs, quals = [], []
    for _ in range(n):
        ln = int(rng.integers(minl, maxl + 1))
        seqs.append("".join(rng.choice(list("ACGTN"), ln)))
        quals.append("".join(chr(int(c)) for c in rng.integers(35, 90, ln)))
    return SeqBatch.from_strings(seqs, quals=quals)


@pytest.mark.parametrize("local,ref", [(True, ADAPTOR), (False, BARCODE)])
@pytest.mark.parametrize("go,ge", [(5.0, 1.0), (2.0, 3.0)])
def test_pallas_scores_match_scan(rng, local, ref, go, ge):
    ad = prepare_adaptor(ref)
    batch = _batch(rng)
    codes, qidx, lengths = prepare_reads(batch, ad.tables)
    want, _ = dp_align(
        codes, qidx, lengths, ad.modes, ad.matched, ad.match_tab,
        ad.mismatch_tab, go, ge, local=local, need_directions=False,
    )
    got = fit_scores_pallas(
        np.asarray(codes), np.asarray(qidx), np.asarray(lengths),
        ad.modes, ad.matched, ad.match_tab, ad.mismatch_tab,
        go, ge, local=local, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want).astype(np.float32), rtol=0, atol=2e-4
    )


@pytest.mark.parametrize("local", [True, False])
def test_pallas_dirs_match_scan(rng, local):
    """The direction-emitting kernel reproduces the scan path's run-length
    directions bit-for-bit (same tie rules), and the device walks give
    identical query maps / gapped strings from the plane layout."""
    from sarlacc_tpu.ops.backtrack import qmap_walk_device, string_walk_device

    ad = prepare_adaptor(ADAPTOR)
    batch = _batch(rng, n=19, minl=0, maxl=50)
    codes, qidx, lengths = prepare_reads(batch, ad.tables)
    want_scores, want_dirs = dp_align(
        codes, qidx, lengths, ad.modes, ad.matched, ad.match_tab,
        ad.mismatch_tab, 5.0, 1.0, local=local, need_directions=True,
    )
    got_scores, got_dirs, l1 = fit_dirs_pallas(
        np.asarray(codes), np.asarray(qidx), np.asarray(lengths),
        ad.modes, ad.matched, ad.match_tab, ad.mismatch_tab,
        5.0, 1.0, local=local, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_scores), np.asarray(want_scores).astype(np.float32),
        rtol=0, atol=2e-4,
    )
    R, N, L1 = np.asarray(want_dirs).shape
    live = np.asarray(got_dirs)[:, :L1, :N].transpose(0, 2, 1)
    np.testing.assert_array_equal(live, np.asarray(want_dirs))

    om_w, orow_w = qmap_walk_device(want_dirs, lengths)
    om_g, orow_g = qmap_walk_device(got_dirs, lengths, plane_layout=True)
    np.testing.assert_array_equal(np.asarray(om_g)[:N], np.asarray(om_w))
    np.testing.assert_array_equal(np.asarray(orow_g)[:N], np.asarray(orow_w))

    oa_w, ob_w, nc_w = string_walk_device(want_dirs, lengths)
    oa_g, ob_g, nc_g = string_walk_device(got_dirs, lengths, plane_layout=True)
    np.testing.assert_array_equal(np.asarray(nc_g)[:N], np.asarray(nc_w))
    T = min(oa_w.shape[1], oa_g.shape[1])
    np.testing.assert_array_equal(
        np.asarray(oa_g)[:N, :T], np.asarray(oa_w)[:, :T]
    )
    np.testing.assert_array_equal(
        np.asarray(ob_g)[:N, :T], np.asarray(ob_w)[:, :T]
    )


def test_shared_planes_across_adaptors(rng):
    """One plane build serves different references and penalties (the
    demux/tuning production pattern)."""
    a1 = prepare_adaptor(ADAPTOR)
    a2 = prepare_adaptor(BARCODE)
    batch = _batch(rng, n=21, minl=5, maxl=40)
    codes, qidx, lengths = prepare_reads(batch, a1.tables)
    l1, n_pad = plane_dims(*np.asarray(codes).shape)
    import jax.numpy as jnp

    planes = build_cost_planes(
        codes, qidx, jnp.asarray(a1.match_tab), jnp.asarray(a1.mismatch_tab),
        l1=l1, n_pad=n_pad,
    )
    for ad, local, go, ge in [
        (a1, True, 5.0, 1.0), (a2, False, 5.0, 1.0), (a1, True, 3.0, 2.0),
    ]:
        want, _ = dp_align(
            codes, qidx, lengths, ad.modes, ad.matched, ad.match_tab,
            ad.mismatch_tab, go, ge, local=local, need_directions=False,
        )
        got = fit_scores_from_planes(
            planes, lengths, ad.modes, ad.matched, go, ge,
            l1=l1, n_pad=n_pad, local=local, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want).astype(np.float32),
            rtol=0, atol=2e-4,
        )


def test_segments_kernel_matches_single_launches(rng):
    """One multi-segment launch (many adaptors/barcodes/penalty pairs over
    the same batch) must equal the per-segment launches bit-for-bit — the
    demux/tuning launch-amortization path (VERDICT r4 #6)."""
    a1 = prepare_adaptor(ADAPTOR)
    a2 = prepare_adaptor(BARCODE)
    batch = _batch(rng, n=21, minl=5, maxl=40)
    codes, qidx, lengths = prepare_reads(batch, a1.tables)
    l1, n_pad = plane_dims(*np.asarray(codes).shape)
    import jax.numpy as jnp

    from sarlacc_tpu.ops.pallas_align import fit_scores_segments

    planes = build_cost_planes(
        codes, qidx, jnp.asarray(a1.match_tab), jnp.asarray(a1.mismatch_tab),
        l1=l1, n_pad=n_pad,
    )
    segs = [
        (a1.modes, a1.matched, 5.0, 1.0, True),
        (a2.modes, a2.matched, 5.0, 1.0, False),
        (a1.modes, a1.matched, 3.0, 2.0, True),
        (a2.modes, a2.matched, 7.0, 1.0, True),
        (a2.modes, a2.matched, 4.0, 3.0, False),
    ]
    got = np.asarray(
        fit_scores_segments(planes, lengths, segs, l1=l1, n_pad=n_pad,
                            interpret=True)
    )
    assert got.shape[0] == len(segs)
    for s, (modes, matched, go, ge, local) in enumerate(segs):
        want = fit_scores_from_planes(
            planes, lengths, modes, matched, go, ge,
            l1=l1, n_pad=n_pad, local=local, interpret=True,
        )
        np.testing.assert_array_equal(got[s], np.asarray(want), err_msg=str(s))

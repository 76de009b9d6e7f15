"""Calibration — ``tune_alignment`` and ``get_adaptor_thresholds``.

Parity with R/tuneAlignment.R and R/getAdaptorThresholds.R: a grid search
over integer gap penalties maximizes the tied-rank separation between real
and per-read-scrambled alignment scores, and the adaptor score thresholds
are the smallest real scores whose scramble-estimated FDR falls below
``error``.  Both run on the score-only device path (no direction matrices),
which is the GCUPS-roofline workload.
"""

from __future__ import annotations

import numpy as np

from ..core.encode import SeqBatch
from ..core.frame import Frame
from ..io.fastq import sample_fastq, stream_fastq
from .align_internal import (
    align_scores_only,
    prepare_adaptor,
    prepare_scores_input,
    resolve_strand,
)
from ..utils.profiling import profiled

__all__ = ["tune_alignment", "get_adaptor_thresholds"]


def scramble_input(batch: SeqBatch, rng: np.random.Generator) -> SeqBatch:
    """Per-read permutation of bases and qualities (R/getAdaptorThresholds.R:68-92).

    One batched argsort of iid uniform keys (a uniform random permutation per
    read) replaces the per-read ``rng.permutation`` loop; pad positions sort
    last so each read's valid prefix permutes in place.
    """
    N, L = batch.codes.shape
    if N == 0 or L == 0:
        quals = np.zeros_like(batch.quals) if batch.quals is not None else None
        return SeqBatch(
            np.full_like(batch.codes, 5), batch.lengths.copy(), quals, batch.names
        )
    keys = rng.random((N, L))
    pad = np.arange(L)[None, :] >= batch.lengths[:, None]
    keys[pad] = 2.0  # uniforms are < 1, so padding sorts strictly last
    order = np.argsort(keys, axis=1)
    codes = np.take_along_axis(batch.codes, order, axis=1)
    codes[pad] = 5
    quals = None
    if batch.quals is not None:
        quals = np.take_along_axis(batch.quals, order, axis=1)
        quals[pad] = 0
    return SeqBatch(codes, batch.lengths.copy(), quals, batch.names)


def _prep_four(a1, front, back, pad_n=None, mesh=None):
    """One-time device upload of the stacked orientation batches."""
    fb = SeqBatch.concat([front, back])
    bf = SeqBatch.concat([back, front])
    pn = 2 * pad_n if pad_n else None
    return (
        prepare_scores_input(a1, fb, pn, mesh),
        prepare_scores_input(a1, bf, pn, mesh),
        len(front),
    )


def _four_scores(a1, a2, front, back, go, ge, pad_n=None, mesh=None, prep=None):
    """START/END/RSTART/REND score vectors (R/tuneAlignment.R:99-112).

    Each adaptor's two orientations stack into one device launch; ``mesh``
    shards the stacked batch over devices (the BPPARAM analog,
    R/tuneAlignment.R:56-59).  ``prep`` (from :func:`_prep_four`) reuses one
    upload across grid points — the quality tables are per qual_type, so
    both adaptors share the prepared planes.
    """
    if prep is None:
        prep = _prep_four(a1, front, back, pad_n, mesh)
    pfb, pbf, n = prep
    s1 = align_scores_only(a1, None, go, ge, mesh=mesh, prepared=pfb)
    s2 = align_scores_only(a2, None, go, ge, mesh=mesh, prepared=pbf)
    return s1[:n], s2[:n], s1[n:], s2[n:]


def _grid_four_scores(a1, a2, combos, prep):
    """All grid points' START/END/RSTART/REND vectors in TWO launches.

    The per-(go, ge) loop issued one launch + one readback per grid point
    per stacked batch (70 tunnel round trips for the 35-point default grid);
    the multi-segment kernel scores every penalty pair in one launch per
    prepared batch and one readback carries the whole [C, n] matrix
    (R/tuneAlignment.R:54-72 runs the same grid through one worker pool).
    """
    from ..ops.pallas_align import fit_scores_segments

    pfb, pbf, n = prep
    l1, n_pad = pfb.plane_geometry()
    s1 = np.asarray(
        fit_scores_segments(
            pfb.planes(), pfb.lengths,
            [(a1.modes, a1.matched, go, ge, True) for go, ge in combos],
            l1=l1, n_pad=n_pad,
        )
    ).astype(np.float64)[:, : pfb.n]
    s2 = np.asarray(
        fit_scores_segments(
            pbf.planes(), pbf.lengths,
            [(a2.modes, a2.matched, go, ge, True) for go, ge in combos],
            l1=l1, n_pad=n_pad,
        )
    ).astype(np.float64)[:, : pbf.n]
    return [
        (s1[i, :n], s2[i, :n], s1[i, n:], s2[i, n:])
        for i in range(len(combos))
    ]


def tied_overlap(real: np.ndarray, fake: np.ndarray) -> float:
    """Tie-averaged rank overlap (R/tuneAlignment.R:78-85)."""
    fake = np.sort(fake)
    upper = np.searchsorted(fake, real, side="right")
    lower = np.searchsorted(fake, real, side="left")
    return float((upper + lower).sum() / 2.0 / (real.size * fake.size))


@profiled("tune_alignment")
def tune_alignment(
    adaptor1: str,
    adaptor2: str,
    filepath: str | None = None,
    reads: SeqBatch | None = None,
    tolerance: int = 200,
    number: int = 10_000,
    gap_op_range: tuple[int, int] = (4, 10),
    gap_ext_range: tuple[int, int] = (1, 5),
    qual_type: str = "phred",
    seed: int = 0,
    mesh=None,
) -> dict:
    """Grid-search integer gap penalties maximizing real/scrambled separation.

    ``mesh`` data-shards every grid point's score batch over devices — the
    TPU analog of the reference's ``BPPARAM`` (R/tuneAlignment.R:8).
    """
    a1 = prepare_adaptor(adaptor1.upper(), qual_type)
    a2 = prepare_adaptor(adaptor2.upper(), qual_type)

    if reads is None:
        if filepath is None:
            raise ValueError("either filepath or reads must be supplied")
        reads = sample_fastq(filepath, number, seed=seed)

    if len(reads) == 0:
        return {
            "parameters": {"gapOpening": None, "gapExtension": None},
            "scores": {"reads": np.zeros(0), "scrambled": np.zeros(0)},
        }

    rng = np.random.default_rng(seed)
    front, back = reads.front_and_back(tolerance)
    sfront = scramble_input(front, rng)
    sback = scramble_input(back, rng)

    lo_op, hi_op = np.maximum.accumulate(np.asarray(gap_op_range, dtype=int))
    lo_ext, hi_ext = np.maximum.accumulate(np.asarray(gap_ext_range, dtype=int))

    max_score = 0.0
    best = {"gapOpening": None, "gapExtension": None}
    best_scores = {"reads": None, "scrambled": None}
    prep_r = _prep_four(a1, front, back, mesh=mesh)
    prep_s = _prep_four(a1, sfront, sback, mesh=mesh)
    combos = [
        (go, ge)
        for go in range(int(lo_op), int(hi_op) + 1)
        for ge in range(int(lo_ext), int(hi_ext) + 1)
    ]
    from ..ops.pallas_align import pallas_available

    use_segments = pallas_available() and mesh is None
    if use_segments:
        try:
            rs_all = _grid_four_scores(a1, a2, combos, prep_r)
            ss_all = _grid_four_scores(a1, a2, combos, prep_s)
        except Exception as e:  # pragma: no cover — device-specific
            import sys

            print(
                f"[tune_alignment] segments kernel unavailable "
                f"({str(e)[:120]}); falling back to per-point launches",
                file=sys.stderr,
            )
            use_segments = False
    for ci, (go, ge) in enumerate(combos):
        if use_segments:
            rs, ss = rs_all[ci], ss_all[ci]
        else:
            rs = _four_scores(a1, a2, front, back, go, ge, mesh=mesh, prep=prep_r)
            ss = _four_scores(a1, a2, sfront, sback, go, ge, mesh=mesh, prep=prep_s)
        _, read_scores = resolve_strand(*rs)
        _, scram_scores = resolve_strand(*ss)
        cur = tied_overlap(read_scores, scram_scores)
        if max_score < cur:
            max_score = cur
            best = {"gapOpening": go, "gapExtension": ge}
            best_scores = {"reads": read_scores, "scrambled": scram_scores}
    return {"parameters": best, "scores": best_scores}


def compute_threshold(real: np.ndarray, scrambled: np.ndarray, error: float) -> float:
    """Smallest real score with scramble-FDR <= error (R/getAdaptorThresholds.R:94-103)."""
    real = np.sort(real)
    scrambled = np.sort(scrambled)
    n = real.size
    denom = n - np.arange(1, n + 1, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        fdr = (scrambled.size - np.searchsorted(scrambled, real, side="right")) / denom
    ok = np.flatnonzero(fdr <= error)
    if ok.size == 0:
        raise ValueError("no score threshold achieves the requested error")
    return float(real[ok[0]])


@profiled("get_adaptor_thresholds")
def get_adaptor_thresholds(
    aligned: Frame,
    error: float = 0.01,
    number: int = 100_000,
    reads: SeqBatch | None = None,
    seed: int = 0,
    mesh=None,
) -> dict:
    """Scramble-FDR adaptor score thresholds (R/getAdaptorThresholds.R:6-64).

    With a ``mesh`` (BPPARAM analog, R/getAdaptorThresholds.R:6) the
    scrambled realignment runs data-parallel via
    :func:`..parallel.mesh.sharded_adaptor_scores`, whose psum'd global
    score histograms are returned under ``histogram1``/``histogram2`` —
    every host sees the global distribution without gathering reads.
    Thresholds themselves use the exact gathered scores, so results are
    identical to the single-device path.
    """
    meta = aligned.metadata
    a1meta = aligned["adaptor1"].metadata
    a2meta = aligned["adaptor2"].metadata
    go, ge = a1meta["gapOpening"], a1meta["gapExtension"]
    tolerance = meta["tolerance"]
    qual_type = meta.get("qual.type", "phred")
    a1 = prepare_adaptor(a1meta["sequence"], qual_type)
    a2 = prepare_adaptor(a2meta["sequence"], qual_type)

    if reads is None:
        filepath = meta.get("filepath")
        if filepath is None:
            raise ValueError("aligned frame metadata carries no filepath")
        parts = []
        wanted = np.asarray(aligned.rownames or [], dtype=object)
        for chunk in stream_fastq(filepath, chunk_size=number):
            # Vectorized membership test: this is the one calibration path
            # that must touch the whole file (R/getAdaptorThresholds.R:35-48).
            names = np.asarray(chunk.names or [], dtype=object)
            keep = np.flatnonzero(np.isin(names, wanted))
            if keep.size:
                parts.append(chunk.take(keep))
        reads = SeqBatch.concat(parts)

    rng = np.random.default_rng(seed)
    name_to_row = {nm: i for i, nm in enumerate(aligned.rownames or [])}
    m = np.asarray([name_to_row[nm] for nm in (reads.names or [])])

    front, back = reads.front_and_back(tolerance)
    sfront = scramble_input(front, rng)
    sback = scramble_input(back, rng)
    hist1 = hist2 = None
    if mesh is not None:
        scram1, scram2, hist1, hist2 = _sharded_scrambled_scores(
            a1, a2, sfront, sback, go, ge, mesh
        )
    else:
        s_start, s_end, s_rstart, s_rend = _four_scores(
            a1, a2, sfront, sback, go, ge
        )
        is_rev, _ = resolve_strand(s_start, s_end, s_rstart, s_rend)
        scram1 = np.where(is_rev, s_rstart, s_start)
        scram2 = np.where(is_rev, s_rend, s_end)

    real1 = np.asarray(aligned["adaptor1"]["score"], dtype=np.float64)[m]
    real2 = np.asarray(aligned["adaptor2"]["score"], dtype=np.float64)[m]
    out = {
        "threshold1": compute_threshold(real1, scram1, error),
        "threshold2": compute_threshold(real2, scram2, error),
        "scores1": {"reads": real1, "scrambled": scram1},
        "scores2": {"reads": real2, "scrambled": scram2},
    }
    if hist1 is not None:
        out["histogram1"] = hist1
        out["histogram2"] = hist2
    return out


def _sharded_scrambled_scores(a1, a2, sfront, sback, go, ge, mesh):
    """Mesh-parallel scrambled scores + psum'd global histograms."""
    from ..ops.align import prepare_reads
    from ..parallel.context import pad_to_mesh
    from ..parallel.mesh import sharded_adaptor_scores, shard_reads

    n = len(sfront)
    pad_n = pad_to_mesh(n, mesh)
    from .align_internal import _pad_batch

    pf, _ = _pad_batch(sfront, pad_n)
    pb, _ = _pad_batch(sback, pad_n)
    front_arrays = shard_reads(mesh, *prepare_reads(pf, a1.tables))
    back_arrays = shard_reads(mesh, *prepare_reads(pb, a1.tables))
    p1 = (a1.modes, a1.matched, a1.match_tab, a1.mismatch_tab)
    p2 = (a2.modes, a2.matched, a2.match_tab, a2.mismatch_tab)
    s1, s2, _, h1, h2 = sharded_adaptor_scores(
        mesh, front_arrays, back_arrays, p1, p2, float(go), float(ge)
    )
    return (
        np.asarray(s1, np.float64)[:n],
        np.asarray(s2, np.float64)[:n],
        np.asarray(h1),
        np.asarray(h2),
    )

"""Barcode demultiplexing — ``barcode_align`` / ``get_barcode_thresholds``.

Parity with R/barcodeAlign.R + src/barcode_align.cpp: every observed barcode
subsequence is **globally** aligned (quality-aware) against each reference
barcode in one device launch; best and second-best scores give the assignment
and its gap.  Thresholds are median − nmads·MAD (R/getBarcodeThresholds.R).
"""

from __future__ import annotations

import numpy as np

from ..core.encode import SeqBatch
from ..core.frame import Frame
from ..ops.align import dp_align, prepare_reads
from .align_internal import prepare_adaptor
from ..utils.profiling import profiled

__all__ = ["barcode_align", "get_barcode_thresholds"]


@profiled("barcode_align")
def barcode_align(
    sequences: SeqBatch,
    barcodes: list[str],
    gap_opening: float = 5,
    gap_extension: float = 1,
    qual_type: str = "phred",
    mesh=None,
) -> Frame:
    """Assign each sequence to its best-scoring barcode.

    Returns Frame(barcode, score, gap) where ``barcode`` is the 0-based index
    of the winner (the reference reports 1-based), ``gap`` the margin over the
    runner-up; metadata carries penalties and the barcode list.  ``mesh``
    shards the sequence batch over devices — the BPPARAM analog
    (R/barcodeAlign.R:4, workers dispatched at :22-24).
    """
    n = len(sequences)
    current_score = np.full(n, -np.inf)
    next_best = np.full(n, -np.inf)
    current_id = np.full(n, -1, dtype=np.int64)

    preps = [prepare_adaptor(str(seq).upper(), qual_type) for seq in barcodes]
    if preps:
        # One read upload shared by every barcode launch (the quality table
        # is per qual_type, not per barcode).
        if mesh is not None:
            from ..parallel.context import pad_to_mesh
            from .align_internal import _pad_batch

            padded, _ = _pad_batch(sequences, pad_to_mesh(n, mesh))
        else:
            padded = sequences
        codes, qidx, lengths = prepare_reads(padded, preps[0].tables)
        if mesh is not None:
            from ..parallel.mesh import shard_reads

            codes, qidx, lengths = shard_reads(mesh, codes, qidx, lengths)

    for b, prep in enumerate(preps):
        scores, _ = dp_align(
            codes,
            qidx,
            lengths,
            prep.modes,
            prep.matched,
            prep.match_tab,
            prep.mismatch_tab,
            float(gap_opening),
            float(gap_extension),
            local=False,
            need_directions=False,
        )
        scores = np.asarray(scores, dtype=np.float64)[:n]

        keep = scores > current_score
        second = ~keep & (scores > next_best)
        current_id[keep] = b
        next_best[keep] = current_score[keep]
        current_score[keep] = scores[keep]
        next_best[second] = scores[second]

    out = Frame(
        barcode=current_id,
        score=current_score,
        gap=current_score - next_best,
    )
    out.metadata = {
        "gapOpening": gap_opening,
        "gapExtension": gap_extension,
        "barcodes": list(barcodes),
    }
    return out


def _mad(x: np.ndarray, center: float) -> float:
    """R's mad() with the default 1.4826 consistency constant."""
    return 1.4826 * float(np.median(np.abs(x - center)))


def get_barcode_thresholds(baligned: Frame, nmads: float = 3) -> dict:
    """median − nmads·MAD thresholds on score and gap (R/getBarcodeThresholds.R:10-14)."""
    score = np.asarray(baligned["score"], dtype=np.float64)
    gap = np.asarray(baligned["gap"], dtype=np.float64)
    med_s = float(np.median(score))
    med_g = float(np.median(gap))
    return {
        "score": med_s - _mad(score, med_s) * nmads,
        "gap": med_g - _mad(gap, med_g) * nmads,
    }

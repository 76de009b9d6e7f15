"""UMI masking, distance calibration, and grouping.

Pipeline parity with the reference:

* ``quality_mask``   — R/qualityMask.R:5-15 (N out bases above ``max_err``)
* ``expected_dist``  — R/expectedDist.R: masked all-pairs Levenshtein,
  condensed vector, for threshold calibration
* ``umi_group``      — R/umiGroup.R + src/umi_group.cpp:35-112: per
  pre-group thresholded neighbour search and greedy clustering.

The trie of the reference is replaced by dense tiled distance blocks on
device (:mod:`..ops.levenshtein`); neighbour lists are emitted in the trie's
DFS order (lexicographic over A<C<G<T<N, prefixes first, insertion order
within duplicates — sorted_trie.cpp:285-296) so the greedy clusterer
(``refimpl.cluster``) sees byte-identical inputs and produces byte-identical
clusters.  Indices in and out are 0-based.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..core.encode import SeqBatch
from ..core.quality import get_encoding
from ..ops.levenshtein import lev2_condensed, lev2_matrix
from ..refimpl.cluster import cluster_umis
from ..refimpl.masking import mask_bad_bases
from ..utils.profiling import profiled

__all__ = ["quality_mask", "expected_dist", "umi_group"]


def _as_batch(seqs) -> SeqBatch:
    if isinstance(seqs, SeqBatch):
        return seqs
    return SeqBatch.from_strings(list(seqs))


def quality_mask(seqs, max_err: float | None = None, qual_type: str = "phred") -> SeqBatch:
    """Mask low-quality bases with N; ``max_err=None`` just drops qualities."""
    batch = _as_batch(seqs)
    if max_err is None or (isinstance(max_err, float) and np.isnan(max_err)):
        return SeqBatch(batch.codes.copy(), batch.lengths.copy(), None, batch.names)
    return mask_bad_bases(batch, get_encoding(qual_type), float(max_err))


@profiled("expected_dist")
def expected_dist(seqs, max_err: float | None = None, qual_type: str = "phred") -> np.ndarray:
    """Condensed all-pairs masked Levenshtein distances (float, N = 0.5)."""
    batch = quality_mask(seqs, max_err, qual_type)
    d2 = lev2_condensed(batch.codes.astype(np.int32), batch.lengths)
    return d2.astype(np.float64) / 2.0


def _dfs_order(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Trie DFS emission order: lexicographic with prefixes first, stable.

    Padding must sort *before* real bases for prefix-first semantics, so the
    sort key remaps pad(5) -> -1.
    """
    key = codes.astype(np.int8).copy()
    width = codes.shape[1]
    pos = np.arange(width)[None, :]
    key[pos >= lengths[:, None]] = -1
    # np.lexsort: last key is primary -> feed columns right-to-left.
    return np.lexsort(tuple(key[:, c] for c in range(width - 1, -1, -1)))


def _neighbor_lists(
    codes: np.ndarray, lengths: np.ndarray, limit: int
) -> list[list[int]]:
    """Per sequence, indices within doubled distance 2*limit, DFS order."""
    n = codes.shape[0]
    mat = lev2_matrix(codes, lengths)
    adj = mat <= 2 * int(limit)
    order = _dfs_order(codes, lengths)
    adj_ord = adj[order]  # rows in DFS order
    return [order[adj_ord[:, q]].tolist() for q in range(n)]


@profiled("umi_group")
def umi_group(
    umi1,
    threshold1: int = 3,
    umi2=None,
    threshold2: int | None = None,
    max_err: float | None = None,
    groups: Sequence | None = None,
    qual_type: str = "phred",
) -> list[np.ndarray]:
    """Group reads by UMI similarity; returns a list of 0-based index arrays."""
    if threshold2 is None:
        threshold2 = threshold1
    b1 = quality_mask(umi1, max_err, qual_type)
    b2 = quality_mask(umi2, max_err, qual_type) if umi2 is not None else None
    if b2 is not None and len(b2) != len(b1):
        raise ValueError("'umi1' and 'umi2' should have the same length")

    n = len(b1)
    if groups is None:
        by_group = [np.arange(n, dtype=np.int64)]
    elif isinstance(groups, (list, tuple)) and groups and isinstance(
        groups[0], (list, tuple, np.ndarray)
    ):
        by_group = [np.asarray(g, dtype=np.int64) for g in groups]
    else:
        # Factor-style vector: split indices by value, R split() order
        # (sorted unique values).
        groups = np.asarray(groups)
        if groups.shape[0] != n:
            raise ValueError("'groups' length must match the number of UMIs")
        by_group = [
            np.flatnonzero(groups == v).astype(np.int64)
            for v in np.unique(groups)
        ]

    output: list[np.ndarray] = []
    for g in by_group:
        curn = g.size
        if curn == 1:
            output.append(g.copy())
            continue

        c1 = b1.codes[g].astype(np.int32)
        l1 = b1.lengths[g]
        nb1 = _neighbor_lists(c1, l1, threshold1)

        if b2 is None:
            storage = nb1
        else:
            sorted1 = [set(x) for x in nb1]
            c2 = b2.codes[g].astype(np.int32)
            l2 = b2.lengths[g]
            nb2 = _neighbor_lists(c2, l2, threshold2)
            # UMI2-query emission order, membership-tested against UMI1
            # (umi_group.cpp:85-100).
            storage = [
                [m2 for m2 in nb2[q] if m2 in sorted1[q]] for q in range(curn)
            ]

        from ..native import greedy_cluster_native

        clusters = greedy_cluster_native(storage)
        if clusters is None:
            clusters = cluster_umis(storage)
        for cl in clusters:
            output.append(g[np.asarray(cl, dtype=np.int64)])
    return output

"""Device kernels for the multiple-sequence-alignment subsystem.

The reference delegates MSA to SeqAn's banded T-Coffee
(src/quick_msa.cpp:25-75): banded pairwise global alignments build a
consistency library, a guide tree orders progressive profile merges.  The
TPU re-design keeps that algorithmic shape but batches the two DP workloads
onto device:

* :func:`banded_pair_align` — tiles of read-vs-read banded global affine
  alignments (the library construction workload).  Band coordinates
  ``j = i + lo + k`` turn the band into a dense ``[rows, W]`` plane; the
  within-row horizontal-gap recurrence unrolls to a ``cummax`` prefix scan
  exactly as in :mod:`.align`, so pairs × band stay fully parallel.
  SeqAn charges ``gap_open`` for the first gap character and ``gap_ext``
  for each subsequent one; we reproduce that convention.  NOTE: unlike
  SeqAn's fixed ``(-bw, +bw)`` band we widen the band by the length
  difference so a global path always exists — strictly more robust for
  ragged long reads.

* :func:`banded_profile_merge` — progressive profile-profile DP with
  library-sum column scores and zero gap cost (T-Coffee maximal weighted
  trace), batched over merges.

Backtrack information is standard Gotoh: 2-bit state choice plus gap-extend
bits, walked on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["banded_pair_align", "banded_profile_merge", "band_halfwidth"]

NEG = -1.0e9  # integer-ish scores stay far from this


def band_halfwidth(la: int, lb: int, bandwidth: int) -> tuple[int, int]:
    """(lo, hi) diagonal offsets guaranteeing corner-to-corner feasibility."""
    diff = lb - la
    return (min(0, diff) - bandwidth, max(0, diff) + bandwidth)


@functools.partial(jax.jit, static_argnames=("rows", "width"))
def _banded_pair_kernel(
    codes_a,  # [P, LA] int32 (pad 5)
    codes_b,  # [P, LB] int32
    lens_a,  # [P]
    lens_b,  # [P]
    lo,  # [P] int32 per-pair band lower diagonal
    kmax,  # [P] int32 per-pair inclusive band plane limit (hi - lo)
    match,
    mismatch,
    gap_open,
    gap_ext,
    rows: int,
    width: int,
):
    """Returns (scores [P], dirs [rows, P, W] int8).

    dirs bits: 0-1 = choice at S (0 diag, 1 horiz/gap-in-A, 2 vert/gap-in-B),
    bit2 = horizontal gap extends, bit3 = vertical gap extends.
    Row i of dirs corresponds to DP row i+1 (sequence-A position i+1).
    """
    P = codes_a.shape[0]
    W = width
    karr = jnp.arange(W, dtype=jnp.int32)[None, :]  # [1, W]

    in_band = karr <= kmax[:, None]  # shape-padding must not widen the band
    j0 = lo[:, None] + karr  # j index at row 0
    # Row 0: S[0][j] = 0 if j == 0 else -(go + (j-1)*ge) for 1 <= j <= lb.
    jj = j0.astype(jnp.float32)
    s0 = jnp.where(
        j0 == 0,
        0.0,
        jnp.where(
            jnp.logical_and(jnp.logical_and(j0 >= 1, j0 <= lens_b[:, None]), in_band),
            -(gap_open + (jj - 1.0) * gap_ext),
            NEG,
        ),
    )
    h0 = jnp.where(s0 > NEG / 2, jnp.where(j0 >= 1, s0, NEG), NEG)
    v0 = jnp.full((P, W), NEG)

    def row(carry, i):
        S, H, V = carry  # previous row, band coords
        # j index for this row: j = i + lo + k.
        j = i + lo[:, None] + karr  # [P, W]
        valid = jnp.logical_and(jnp.logical_and(j >= 0, j <= lens_b[:, None]), in_band)
        alive = i <= lens_a[:, None]

        a_i = jnp.take_along_axis(
            codes_a, jnp.minimum(i - 1, codes_a.shape[1] - 1)[None].repeat(P, 0)[:, None], axis=1
        )  # [P,1]
        # b at j: gather per (P, W).
        jb = jnp.clip(j - 1, 0, codes_b.shape[1] - 1)
        b_j = jnp.take_along_axis(codes_b, jb, axis=1)  # [P, W]
        sub = jnp.where(a_i == b_j, match, mismatch)
        sub = jnp.where(
            jnp.logical_and(j >= 1, j <= lens_b[:, None]), sub, NEG
        )

        # Diagonal: (i-1, j-1) is the same k in the previous row.
        M = S + sub

        # Vertical (gap in B, consume A): (i-1, j) is k+1 in the previous row.
        S_up = jnp.concatenate([S[:, 1:], jnp.full((P, 1), NEG)], axis=1)
        V_up = jnp.concatenate([V[:, 1:], jnp.full((P, 1), NEG)], axis=1)
        Vn = jnp.maximum(S_up - gap_open, V_up - gap_ext)
        v_ext = V_up - gap_ext >= S_up - gap_open  # tie -> extend

        # Horizontal (gap in A, consume B): within-row prefix structure.
        mv = jnp.maximum(M, Vn)
        B = (mv - gap_open) + karr.astype(jnp.float32) * gap_ext
        cum = jax.lax.cummax(B, axis=1)
        Hn = jnp.concatenate([jnp.full((P, 1), NEG), cum[:, :-1]], axis=1) - (
            (karr.astype(jnp.float32) - 1.0) * gap_ext
        )
        Hn = jnp.where(karr == 0, NEG, Hn)
        Hn = jnp.where(valid, Hn, NEG)

        M = jnp.where(valid, M, NEG)
        Vn = jnp.where(valid, Vn, NEG)
        Sn = jnp.maximum(M, jnp.maximum(Hn, Vn))

        # Choice: diag > horiz > vert on ties.
        choice = jnp.where(
            M >= Sn, 0, jnp.where(Hn >= Sn, 1, 2)
        ).astype(jnp.int8)
        # Horizontal extend bit: H came from H (k-1) rather than S (k-1).
        mv_prev = jnp.concatenate([jnp.full((P, 1), NEG), mv[:, :-1]], axis=1)
        h_prev = jnp.concatenate([jnp.full((P, 1), NEG), Hn[:, :-1]], axis=1)
        h_ext = h_prev - gap_ext >= mv_prev - gap_open
        dirs = (
            choice
            + (h_ext.astype(jnp.int8) << 2)
            + (v_ext.astype(jnp.int8) << 3)
        )

        S_out = jnp.where(alive, Sn, S)
        H_out = jnp.where(alive, Hn, H)
        V_out = jnp.where(alive, Vn, V)
        return (S_out, H_out, V_out), dirs

    (S, _, _), dirs = jax.lax.scan(
        row, (s0, h0, v0), jnp.arange(1, rows + 1, dtype=jnp.int32)
    )
    kfin = lens_b - lens_a - lo
    scores = jnp.take_along_axis(S, kfin[:, None], axis=1)[:, 0]
    return scores, dirs


def banded_pair_align(
    codes_a: np.ndarray,
    lens_a: np.ndarray,
    codes_b: np.ndarray,
    lens_b: np.ndarray,
    match: float,
    mismatch: float,
    gap_open: float,
    gap_ext: float,
    bandwidth: int,
):
    """Batch of banded global pairwise alignments.

    Returns (scores [P] float, paths: list of (ai, bi) position arrays for
    the match/mismatch columns of each alignment, 1-based).
    """
    P = codes_a.shape[0]
    lens_a = np.asarray(lens_a, np.int32)
    lens_b = np.asarray(lens_b, np.int32)
    diffs = lens_b.astype(np.int64) - lens_a.astype(np.int64)
    lo = (np.minimum(0, diffs) - bandwidth).astype(np.int32)
    hi = (np.maximum(0, diffs) + bandwidth).astype(np.int32)
    W = int((hi - lo).max()) + 1 if P else 1
    rows = int(lens_a.max()) if P else 0

    # Bucket jit shapes (pairs, scan length, band width, sequence planes) to
    # powers of two so repeated launches across ragged groups reuse compiles.
    def _bkt(x, base):
        b = base
        while b < x:
            b *= 2
        return b

    Pp = _bkt(max(P, 1), 8)
    rows_b = _bkt(max(rows, 1), 64)
    W_b = _bkt(W, 64)
    la_b = _bkt(max(codes_a.shape[1], 1), 64)
    lb_b = _bkt(max(codes_b.shape[1], 1), 64)

    def _pad2(a, n, w, fill):
        out = np.full((n, w), fill, a.dtype)
        out[: a.shape[0], : a.shape[1]] = a
        return out

    codes_a_p = _pad2(np.asarray(codes_a), Pp, la_b, 5)
    codes_b_p = _pad2(np.asarray(codes_b), Pp, lb_b, 5)
    lens_a_p = np.zeros(Pp, np.int32)
    lens_a_p[:P] = lens_a
    lens_b_p = np.zeros(Pp, np.int32)
    lens_b_p[:P] = lens_b
    lo_p = np.full(Pp, -bandwidth, np.int32)
    lo_p[:P] = lo
    hi_p = np.full(Pp, bandwidth, np.int32)
    hi_p[:P] = hi

    scores, dirs = _banded_pair_kernel(
        jnp.asarray(codes_a_p, jnp.int32),
        jnp.asarray(codes_b_p, jnp.int32),
        jnp.asarray(lens_a_p),
        jnp.asarray(lens_b_p),
        jnp.asarray(lo_p),
        jnp.asarray(hi_p - lo_p),
        float(match),
        float(mismatch),
        float(gap_open),
        float(gap_ext),
        rows=rows_b,
        width=W_b,
    )
    scores = np.asarray(scores, np.float64)[:P]
    dirs = np.asarray(dirs)[:, :P, :]

    paths = []
    for p in range(P):
        paths.append(
            _walk_pair(dirs[:, p, :], int(lens_a[p]), int(lens_b[p]), int(lo[p]))
        )
    return scores, paths


def _walk_pair(dirs_rw: np.ndarray, la: int, lb: int, lo: int):
    """Gotoh walk from (la, lb) to (0, 0); returns matched (ai, bi) arrays."""
    ai, bi = [], []
    i, j = la, lb
    state = 0  # 0 = S, 1 = H-run, 2 = V-run
    while i > 0 and j > 0:
        k = j - i - lo
        d = int(dirs_rw[i - 1, k])
        if state == 0:
            state = d & 3
        if state == 0:
            ai.append(i)
            bi.append(j)
            i -= 1
            j -= 1
        elif state == 1:
            # horizontal: consume B.
            ext = (d >> 2) & 1
            j -= 1
            state = 1 if ext else 0
            if not ext:
                state = 0
            continue
        else:
            ext = (d >> 3) & 1
            i -= 1
            state = 2 if ext else 0
            continue
        state = 0
    return np.asarray(ai[::-1], np.int32), np.asarray(bi[::-1], np.int32)


@functools.partial(jax.jit, static_argnames=("rows", "width"))
def _profile_merge_kernel(cost, lens_a, lens_b, lo, rows: int, width: int):
    """Gapless maximal-weighted-trace DP over banded column-score planes.

    cost: [P, rows, W] float — cost[p, i-1, k] is the column score of
    aligning profile-A column i with profile-B column j = i + lo + k.
    Returns (scores [P], dirs [rows, P, W] int8: 0 diag, 1 horiz, 2 vert).
    """
    P = cost.shape[0]
    W = width
    karr = jnp.arange(W, dtype=jnp.int32)[None, :]

    s0 = jnp.where(lo[:, None] + karr >= 0, 0.0, NEG)

    def row(carry, i):
        S = carry
        j = i + lo[:, None] + karr
        valid = jnp.logical_and(j >= 0, j <= lens_b[:, None])
        alive = i <= lens_a[:, None]

        c = jax.lax.dynamic_index_in_dim(cost, i - 1, 1, keepdims=False)  # [P, W]
        M = S + jnp.where(jnp.logical_and(j >= 1, j <= lens_b[:, None]), c, NEG)
        S_up = jnp.concatenate([S[:, 1:], jnp.full((P, 1), NEG)], axis=1)  # vert
        D = jnp.maximum(M, S_up)
        # Horizontal closes the row: running max along k.
        Sn = jax.lax.cummax(D, axis=1)
        Sn = jnp.where(valid, Sn, NEG)
        choice = jnp.where(M >= Sn, 0, jnp.where(S_up >= Sn, 2, 1)).astype(jnp.int8)
        S_out = jnp.where(alive, Sn, S)
        return S_out, choice

    S, dirs = jax.lax.scan(row, s0, jnp.arange(1, rows + 1, dtype=jnp.int32))
    kfin = lens_b - lens_a - lo
    scores = jnp.take_along_axis(S, kfin[:, None], axis=1)[:, 0]
    return scores, dirs


def banded_profile_merge(cost: np.ndarray, la: int, lb: int, lo: int):
    """One merge (P=1 convenience wrapper): returns matched column pairs.

    ``cost[i-1, k]`` scores aligning A column i with B column j=i+lo+k.
    """
    rows, W = cost.shape
    scores, dirs = _profile_merge_kernel(
        jnp.asarray(cost[None], jnp.float32),
        jnp.asarray([la], jnp.int32),
        jnp.asarray([lb], jnp.int32),
        jnp.asarray([lo], jnp.int32),
        rows=rows,
        width=W,
    )
    dirs = np.asarray(dirs)[:, 0, :]
    # Walk: at (i, j) read choice; horiz moves j-1 (k-1), vert i-1 (k+1).
    ai, bi = [], []
    i, j = la, lb
    while i > 0 and j > 0:
        k = j - i - lo
        c = int(dirs[i - 1, k])
        if c == 0:
            ai.append(i)
            bi.append(j)
            i -= 1
            j -= 1
        elif c == 1:
            j -= 1
        else:
            i -= 1
    return float(np.asarray(scores)[0]), (
        np.asarray(ai[::-1], np.int32),
        np.asarray(bi[::-1], np.int32),
    )

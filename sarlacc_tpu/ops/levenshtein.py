"""Batched masked-Levenshtein distances on device.

TPU replacement for both the all-pairs kernel (src/compute_lev_masked.cpp)
and the sorted trie's thresholded search (src/sorted_trie.cpp): instead of a
pruned trie walk, distances for *tiles of pairs* advance together through a
``lax.scan`` column DP, and thresholding happens afterwards.  Dense regular
compute beats pointer-chasing on TPU, and the doubled-integer cost model
(match 0, N-vs-anything 1, mismatch/indel 2 — sorted_trie.cpp:13-21) makes
thresholding exact in int32: ``dist2 <= 2*limit`` reproduces the trie's
neighbour sets bit-for-bit, and ``dist2 / 2`` reproduces the float masked
distance of compute_lev_masked.cpp (N contributes 0.5).

The column recurrence ``col[i] = min(prev[i]+2, col[i-1]+2, prev[i-1]+ms)``
carries a sequential dependence through ``col[i-1]``; as in :mod:`.align` it
unrolls to a shifted prefix-min — ``col[i] = min_k (cand[k] + 2*(i-k))`` with
``cand[i] = min(prev[i]+2, prev[i-1]+ms_i)`` — computed with ``lax.cummin``,
so the pair axis and the position axis stay fully parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lev2_pairs", "lev2_condensed", "lev2_matrix", "lev2_neighbor_pairs"]


@jax.jit
def lev2_pairs(codes_a, lens_a, codes_b, lens_b):
    """Doubled masked Levenshtein for P pairs of padded code rows.

    codes_* : [P, L] int32 (A=0..N=4, pad=5); lens_* : [P] int32.
    Returns [P] int32 doubled distances.
    """
    P, L = codes_a.shape
    idx = jnp.arange(L + 1, dtype=jnp.int32)[None, :]  # [1, L+1]

    prev0 = jnp.broadcast_to(2 * idx, (P, L + 1))
    ans0 = 2 * lens_a.astype(jnp.int32)  # lb == 0 answer

    a_is_n = codes_a == 4  # [P, L]

    def step(carry, jx):
        prev, ans = carry
        b = jax.lax.dynamic_index_in_dim(codes_b, jx, 1, keepdims=True)  # [P,1]
        ms = jnp.where(
            jnp.logical_or(b == 4, a_is_n),
            1,
            jnp.where(codes_a == b, 0, 2),
        ).astype(jnp.int32)  # [P, L]
        cand = jnp.concatenate(
            [
                jnp.full((P, 1), 2 * (jx + 1), jnp.int32),
                jnp.minimum(prev[:, 1:] + 2, prev[:, :-1] + ms),
            ],
            axis=1,
        )
        t = cand - 2 * idx
        col = jax.lax.cummin(t, axis=1) + 2 * idx
        got = jnp.take_along_axis(col, lens_a[:, None].astype(jnp.int32), axis=1)[:, 0]
        ans = jnp.where(jx + 1 == lens_b, got, ans)
        return (col, ans), None

    (_, ans), _ = jax.lax.scan(
        step, (prev0, ans0), jnp.arange(L, dtype=jnp.int32)
    )
    return ans


def _bucket(n: int) -> int:
    """Round P up to a power-of-two bucket (>= 256) to bound recompiles."""
    b = 256
    while b < n:
        b *= 2
    return b


def _tile_d2(codes, lengths, i0, j0, TI: int, TJ: int, L: int):
    """Doubled-distance DP for one [TI, TJ] tile; returns int32 [TI, TJ].

    ``codes`` [N, L] int32 and ``lengths`` [N] stay device-resident across
    tiles — the host ships the n-row table once instead of materializing
    O(n^2) per-pair operand rows (which made umi_group upload-bound).
    """
    i0 = jnp.asarray(i0, jnp.int32)
    j0 = jnp.asarray(j0, jnp.int32)
    z = jnp.int32(0)
    a = jax.lax.dynamic_slice(codes, (i0, z), (TI, L))  # [TI, L]
    la = jax.lax.dynamic_slice(lengths, (i0,), (TI,)).astype(jnp.int32)
    b = jax.lax.dynamic_slice(codes, (j0, z), (TJ, L))  # [TJ, L]
    lb = jax.lax.dynamic_slice(lengths, (j0,), (TJ,)).astype(jnp.int32)

    # Layout: the DP position axis (L+1, tiny — e.g. 11 for UMIs) sits on
    # sublanes and the TJ pair axis on lanes, so every vreg is full.  The
    # transposed layout ([TI, TJ, L+1], L+1 minor) wasted 7/8ths of each
    # lane group for short sequences.
    idx = jnp.arange(L + 1, dtype=jnp.int32)[None, :, None]  # [1, L+1, 1]
    prev0 = jnp.broadcast_to(2 * idx, (TI, L + 1, TJ))
    ans0 = jnp.broadcast_to(2 * la[:, None], (TI, TJ))  # lb == 0 answer
    a_is_n = (a == 4)[:, :, None]  # [TI, L, 1]
    a_b = a[:, :, None]  # [TI, L, 1]
    la_idx = jnp.broadcast_to(la[:, None, None], (TI, 1, TJ))

    def step(carry, jx):
        prev, ans = carry
        bj = jax.lax.dynamic_index_in_dim(b, jx, 1, keepdims=True)  # [TJ, 1]
        bj = bj.T[None, :, :]  # [1, 1, TJ]
        ms = jnp.where(
            jnp.logical_or(bj == 4, a_is_n),
            1,
            jnp.where(a_b == bj, 0, 2),
        ).astype(jnp.int32)  # [TI, L, TJ]
        cand = jnp.concatenate(
            [
                jnp.full((TI, 1, TJ), 2 * (jx + 1), jnp.int32),
                jnp.minimum(prev[:, 1:] + 2, prev[:, :-1] + ms),
            ],
            axis=1,
        )
        t = cand - 2 * idx
        col = jax.lax.cummin(t, axis=1) + 2 * idx
        got = jnp.take_along_axis(col, la_idx, axis=1)[:, 0]
        ans = jnp.where(jx + 1 == lb[None, :], got, ans)
        return (col, ans), None

    (_, ans), _ = jax.lax.scan(
        step, (prev0, ans0), jnp.arange(L, dtype=jnp.int32)
    )
    return ans


@functools.partial(jax.jit, static_argnames=("TI", "TJ", "L", "wide"))
def _lev2_tile_kernel(codes, lengths, i0, j0, TI: int, TJ: int, L: int, wide: bool = False):
    """One dense [TI, TJ] tile of the all-pairs matrix.

    The readback is int16 (halves the transfer) unless ``wide`` — doubled
    distances can reach 2*max(la, lb), so sequences longer than 16383 bases
    must read back int32 to avoid silent wraparound.
    """
    ans = _tile_d2(codes, lengths, i0, j0, TI, TJ, L)
    return ans if wide else ans.astype(jnp.int16)


def _lev2_matrix_tiled(codes: np.ndarray, lengths: np.ndarray, tile: int = 512) -> np.ndarray:
    """Full doubled-distance matrix via device-resident tiles.

    Tiles dispatch before any readback (async), so per-tile cost is device
    compute, not tunnel round trips.
    """
    n = codes.shape[0]
    Lb = 8
    while Lb < codes.shape[1]:
        Lb *= 2
    T = min(tile, _bucket(n))
    n_pad = ((n + T - 1) // T) * T
    cp = np.full((n_pad, Lb), 5, np.int32)
    cp[:n, : codes.shape[1]] = codes
    lp = np.zeros(n_pad, np.int32)
    lp[:n] = lengths
    codes_dev = jnp.asarray(cp)
    lens_dev = jnp.asarray(lp)
    wide = int(lengths.max(initial=0)) > 16383  # int16 would wrap (d2 <= 2L)

    # Bounded in-flight window: tiles dispatch ahead of readbacks (async) but
    # never hold more than ~max_inflight [T, T] results on device at once, so
    # arbitrarily large n cannot OOM the chip.
    max_inflight = max(1, (64 << 20) // (T * T * (4 if wide else 2)))
    tiles = [
        (i0, j0)
        for i0 in range(0, n_pad, T)
        for j0 in range(i0, n_pad, T)
    ]
    mat = np.zeros((n, n), dtype=np.int32)

    def _collect(i0, j0, dev):
        blk = np.asarray(dev, dtype=np.int32)
        ih = min(i0 + T, n) - i0
        jh = min(j0 + T, n) - j0
        if ih <= 0 or jh <= 0:
            return
        mat[i0 : i0 + ih, j0 : j0 + jh] = blk[:ih, :jh]
        if j0 != i0:
            mat[j0 : j0 + jh, i0 : i0 + ih] = blk[:ih, :jh].T

    inflight: list = []
    for i0, j0 in tiles:
        dev = _lev2_tile_kernel(
            codes_dev, lens_dev, i0, j0, TI=T, TJ=T, L=Lb, wide=wide
        )
        inflight.append((i0, j0, dev))
        if len(inflight) >= max_inflight:
            _collect(*inflight.pop(0))
    for item in inflight:
        _collect(*item)
    return mat


def _run_pairs(ca, la, cb, lb) -> np.ndarray:
    P = ca.shape[0]
    if P == 0:
        return np.zeros(0, dtype=np.int32)
    B = _bucket(P)
    if B != P:
        pad = B - P
        ca = np.concatenate([ca, np.full((pad, ca.shape[1]), 5, ca.dtype)])
        cb = np.concatenate([cb, np.full((pad, cb.shape[1]), 5, cb.dtype)])
        la = np.concatenate([la, np.zeros(pad, la.dtype)])
        lb = np.concatenate([lb, np.zeros(pad, lb.dtype)])
    out = np.asarray(
        lev2_pairs(
            jnp.asarray(ca, jnp.int32),
            jnp.asarray(la, jnp.int32),
            jnp.asarray(cb, jnp.int32),
            jnp.asarray(lb, jnp.int32),
        )
    )
    return out[:P]


def lev2_condensed(codes: np.ndarray, lengths: np.ndarray, max_pairs: int = 1 << 22) -> np.ndarray:
    """All-pairs doubled distances, condensed lower-triangle (i<j, i-major).

    Matches compute_lev_masked.cpp's emission order (:44-55); divide by 2.0
    for the float masked distance.
    """
    n = codes.shape[0]
    if 2 <= n <= 8192:
        # Moderate n: tiles beat per-pair operand materialization.
        mat = _lev2_matrix_tiled(codes.astype(np.int32), lengths)
        iu, ju = np.triu_indices(n, k=1)
        return mat[iu, ju].astype(np.int32)
    iu, ju = np.triu_indices(n, k=1)
    out = np.zeros(iu.size, dtype=np.int32)
    for at in range(0, iu.size, max_pairs):
        sl = slice(at, min(at + max_pairs, iu.size))
        out[sl] = _run_pairs(
            codes[iu[sl]], lengths[iu[sl]], codes[ju[sl]], lengths[ju[sl]]
        )
    return out


@functools.partial(jax.jit, static_argnames=("TI", "TJ", "NJT", "L", "KCAP"))
def _lev2_rowblock_sparse(
    codes, lengths, n, i0, jt0, njt, thr,
    TI: int, TJ: int, NJT: int, L: int, KCAP: int,
):
    """Thresholded neighbours of one row block, never materializing the tile
    matrix on the host (the trie replacement at scale —
    src/sorted_trie.cpp:107-187's result, dense-regular compute).

    Scans ``NJT`` column tiles starting at ``jt0`` (only ``njt`` are real);
    per query row, matched column indices (``d2 <= thr``, upper triangle
    ``j >= i`` only, diagonal included) append in ascending-j order to a
    [TI, KCAP] buffer via a lane-wise compaction sort — no device scatter,
    whose scalar fallback on TPU costs ~90 ns/element.

    Returns (nbrj [TI, KCAP] int32, counts [TI] int32).  ``counts`` may
    exceed KCAP: overflow rows lost entries and the caller must retry with a
    bigger KCAP (power-of-two bucketed, so recompiles stay bounded).
    """
    i0 = jnp.asarray(i0, jnp.int32)
    jt0 = jnp.asarray(jt0, jnp.int32)
    n = jnp.asarray(n, jnp.int32)
    njt = jnp.asarray(njt, jnp.int32)
    thr = jnp.asarray(thr, jnp.int32)
    ig = i0 + jnp.arange(TI, dtype=jnp.int32)[:, None]  # [TI, 1]
    DEADJ = jnp.int32(0x3FFFFFFF)

    def step(carry, t):
        buf, cnt = carry  # buf [TI, KCAP] ascending-j (DEADJ pad), cnt [TI]
        jt = jt0 + t * TJ
        d2 = _tile_d2(codes, lengths, i0, jt, TI, TJ, L)
        jg = jt + jnp.arange(TJ, dtype=jnp.int32)[None, :]  # [1, TJ]
        ok = (
            (d2 <= thr)
            & (jg >= ig)
            & (jg < n)
            & (ig < n)
            & (t < njt)
        )
        hits = jnp.where(ok, jg, DEADJ).astype(jnp.int32)  # already ascending
        cat = jnp.concatenate([buf, hits], axis=1)  # [TI, KCAP + TJ]
        # Lane-wise compaction: entries keep relative order (keys are their
        # original lanes, unique), dead entries (DEADJ) sink right because
        # both halves individually have dead entries rightmost... not true of
        # `hits`, so key dead lanes to the far right explicitly.
        lanes = jnp.arange(KCAP + TJ, dtype=jnp.int32)[None, :]
        key = jnp.where(cat == DEADJ, lanes + (KCAP + TJ), lanes)
        key = jnp.broadcast_to(key, cat.shape)
        _, packed = jax.lax.sort((key, cat), dimension=1, num_keys=1)
        return (packed[:, :KCAP], cnt + ok.sum(axis=1).astype(jnp.int32)), None

    buf0 = jnp.full((TI, KCAP), DEADJ, jnp.int32)
    cnt0 = jnp.zeros(TI, jnp.int32)
    (buf, cnt), _ = jax.lax.scan(
        step, (buf0, cnt0), jnp.arange(NJT, dtype=jnp.int32)
    )
    return buf, cnt


def lev2_neighbor_pairs(
    codes: np.ndarray, lengths: np.ndarray, limit: int,
    tile: int = 512, kcap: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Sparse thresholded neighbours: all (i, j), i <= j, with doubled
    distance <= 2*limit — including the diagonal, which is NOT free when a
    sequence contains N (sorted_trie.cpp:13-21).

    The O(n^2) distance matrix never exists anywhere: tiles stream through
    the device row-block kernel, which emits only the surviving column
    indices.  Two exact prunes:

    * rows are processed in length-sorted order so column tiles entirely
      outside ``|la - lb| <= limit`` (doubled indel cost 2 makes the bound
      exact) are never dispatched;
    * only the upper triangle is computed (results mirror on the host).

    Returns (qi, qj) int32 arrays in original index space.
    """
    n_reads = codes.shape[0]
    if n_reads == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    # Exact dedup: distance depends only on string contents, so identical
    # rows share one DP (UMI data is duplicate-heavy by construction — the
    # reference trie exploits this with its identical-consecutive-query
    # short-circuit, sorted_trie.cpp:253-257).  Neighbour pairs expand back
    # to read space afterwards; d2(u, u) is still computed (N-vs-N costs 1,
    # so the diagonal is not free).
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    uniq, uid = np.unique(codes, axis=0, return_inverse=True)
    uid = uid.ravel().astype(np.int64)
    n = uniq.shape[0]
    ucnt = np.bincount(uid, minlength=n).astype(np.int64)
    mem_order = np.argsort(uid, kind="stable").astype(np.int64)  # reads by uid
    mem_start = np.concatenate([[0], np.cumsum(ucnt)[:-1]])
    ulen = np.zeros(n, np.int32)
    ulen[uid] = np.asarray(lengths, np.int32)
    codes, lengths = uniq, ulen

    thr = 2 * int(limit)
    lengths = np.asarray(lengths, np.int32)
    perm = np.argsort(lengths, kind="stable").astype(np.int64)
    s_len = lengths[perm]

    Lb = 8
    while Lb < codes.shape[1]:
        Lb *= 2
    TI = TJ = min(tile, _bucket(n) if n > 256 else 256)
    n_pad = ((n + TI - 1) // TI) * TI
    cp = np.full((n_pad, Lb), 5, np.int32)
    cp[:n, : codes.shape[1]] = codes[perm]
    lp = np.zeros(n_pad, np.int32)
    lp[:n] = s_len
    codes_dev = jnp.asarray(cp)
    lens_dev = jnp.asarray(lp)

    def _bkt(x, base):
        b = base
        while b < x:
            b *= 2
        return b

    # Per row block: column range from the exact length prune, upper
    # triangle only.  Work splits into fixed-size column-tile CHUNKS so ONE
    # compiled program serves every launch (per-block power-of-two scan
    # lengths caused a fresh multi-minute remote compile per distinct
    # bucket, which dominated wall time at 100k UMIs), and chunk launches
    # dispatch asynchronously in a bounded window.
    NJT_CHUNK = 32
    chunks: list[tuple[int, int, int]] = []
    for i0 in range(0, n_pad, TI):
        if i0 >= n:
            continue
        hi_len = int(s_len[min(i0 + TI, n) - 1])
        j_hi = int(np.searchsorted(s_len, hi_len + int(limit), side="right"))
        jt0 = i0  # j >= i
        njt = max(0, -(-(min(max(j_hi, i0 + 1), n) - jt0) // TJ))
        for c0 in range(0, njt, NJT_CHUNK):
            chunks.append((i0, jt0 + c0 * TJ, min(NJT_CHUNK, njt - c0)))

    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    todo = [(i0, jt0, njt, kcap) for (i0, jt0, njt) in chunks]
    # Bounded in-flight window: enough launches to hide dispatch latency
    # without holding hundreds of [TI, KCAP] buffers on device.
    MAX_INFLIGHT = 64

    def _collect(item, retry):
        i0, jt0, njt, kc, (buf_dev, cnt_dev) = item
        cnt = np.asarray(cnt_dev)
        if (cnt > _bkt(kc, 64)).any():
            retry.append((i0, jt0, njt, int(cnt.max())))
            return
        buf = np.asarray(buf_dev)
        lanes = np.arange(buf.shape[1], dtype=np.int32)[None, :]
        mask = lanes < cnt[:, None]
        out_i.append(np.repeat(i0 + np.arange(buf.shape[0], dtype=np.int32), cnt))
        out_j.append(buf[mask])

    while todo:
        retry: list = []
        inflight: list = []
        for i0, jt0, njt, kc in todo:
            dev = _lev2_rowblock_sparse(
                codes_dev, lens_dev, n, i0, jt0, njt, thr,
                TI=TI, TJ=TJ, NJT=NJT_CHUNK, L=Lb, KCAP=_bkt(kc, 64),
            )
            inflight.append((i0, jt0, njt, kc, dev))
            if len(inflight) >= MAX_INFLIGHT:
                _collect(inflight.pop(0), retry)
        for item in inflight:
            _collect(item, retry)
        todo = retry
    if not out_i:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    si = np.concatenate(out_i)
    sj = np.concatenate(out_j)
    # Sorted-unique space -> unique ids -> read space.  Each unique pair
    # (a, b) expands to the cross product of its member read sets; for
    # a == b keep one orientation per unordered read pair.
    ua = perm[si]
    ub = perm[sj]
    ca = ucnt[ua]
    cb = ucnt[ub]
    sz = ca * cb
    starts = np.concatenate([[0], np.cumsum(sz)[:-1]])
    total = int(sz.sum())
    pid = np.repeat(np.arange(ua.size), sz)
    o = np.arange(total, dtype=np.int64) - starts[pid]
    x = mem_order[mem_start[ua][pid] + o // cb[pid]]
    y = mem_order[mem_start[ub][pid] + o % cb[pid]]
    keep = (ua[pid] != ub[pid]) | (x <= y)
    x, y = x[keep], y[keep]
    return (
        np.minimum(x, y).astype(np.int32),
        np.maximum(x, y).astype(np.int32),
    )


def lev2_matrix(codes: np.ndarray, lengths: np.ndarray, max_pairs: int = 1 << 22) -> np.ndarray:
    """Full symmetric doubled-distance matrix [n, n] int32.

    The diagonal is computed, not assumed zero: an ``N`` matches *nothing*,
    itself included (sorted_trie.cpp:13-21), so self-distances of
    N-containing sequences are positive — which is how the reference's
    neighbour sets can legitimately come up empty.
    """
    n = codes.shape[0]
    if n >= 2:
        # The tiled kernel computes the diagonal (i0 == j0 tiles include it),
        # so no special-casing is needed here.
        return _lev2_matrix_tiled(codes.astype(np.int32), lengths)
    mat = np.zeros((n, n), dtype=np.int32)
    if n == 1:
        mat[0, 0] = _run_pairs(codes, lengths, codes, lengths)[0]
    return mat

"""``multi_read_align`` — per-group multiple sequence alignment.

T-Coffee-style progressive MSA with the same structure as the reference's
SeqAn call (src/quick_msa.cpp:25-75, R/multiReadAlign.R:7-48):

1. **Pairwise library** — banded global affine alignments of every pair in
   the group, batched on device (:func:`..ops.msa.banded_pair_align`), each
   decomposed into matched residue pairs weighted by the alignment's percent
   identity (the classic T-Coffee primary library).
2. **Triplet extension** — consistency transform: for every middle sequence
   z, matches x~z and z~y compose into x~y support with weight
   ``min(w_xz, w_zy)``, accumulated onto the direct weights.
3. **Guide tree** — neighbour joining on ``1 - identity`` distances (SeqAn's
   default guide tree for ``globalMsaAlignment``).
4. **Progressive merges** — profile-profile maximal-weighted-trace DP with
   library-sum column scores and zero gap cost, banded, on device
   (:func:`..ops.msa.banded_profile_merge`).

Two deliberate deviations from the reference, both documented:

* the reference's ``max.error`` argument is accepted **and wired**: low
  quality bases are masked to N for alignment and restored afterwards
  (``keep_mask=False``) — the reference documents this behaviour but never
  wired the argument (R/multiReadAlign.R quirk; its unmask kernel
  src/unmask_alignment.cpp is dormant), and its ``groups``-missing branch
  has a fatal typo (``by.groups`` vs ``by.group``) which we simply fix.
* the pairwise band is widened by the length difference of each pair so a
  corner-to-corner path always exists (SeqAn keeps a fixed ±bandwidth).
"""

from __future__ import annotations

import numpy as np

from ..core.encode import SeqBatch
from ..core.frame import Frame
from ..ops.msa import banded_pair_align, banded_profile_merge
from ..refimpl.masking import unmask_alignment
from .umi import quality_mask

__all__ = ["multi_read_align"]


def _split_groups(n: int, groups) -> tuple[list[np.ndarray], list | None]:
    if groups is None:
        return [np.arange(n, dtype=np.int64)], None
    if isinstance(groups, (list, tuple)) and (
        len(groups) == 0 or isinstance(groups[0], (list, tuple, np.ndarray))
    ):
        return [np.asarray(g, dtype=np.int64) for g in groups], None
    groups = np.asarray(groups)
    if groups.shape[0] != n:
        raise ValueError("length of 'reads' and 'groups' should be the same")
    keys = np.unique(groups)
    return [np.flatnonzero(groups == k).astype(np.int64) for k in keys], [
        str(k) for k in keys
    ]


def _pair_library(codes, lengths, idx, match, mismatch, go, ge, bandwidth):
    """All-pairs alignments within one group.

    Returns (lib, ident) where lib[(x, y)] = (pa, pb, w) arrays for x < y and
    ident[x, y] = fractional identity.
    """
    g = idx.size
    xs, ys = np.triu_indices(g, k=1)
    if xs.size == 0:
        return {}, np.ones((g, g))
    scores, paths = banded_pair_align(
        codes[idx[xs]],
        lengths[idx[xs]],
        codes[idx[ys]],
        lengths[idx[ys]],
        match,
        mismatch,
        go,
        ge,
        bandwidth,
    )
    lib: dict[tuple[int, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    ident = np.ones((g, g))
    for p, (x, y) in enumerate(zip(xs, ys)):
        pa, pb = paths[p]
        if pa.size:
            eq = codes[idx[x]][pa - 1] == codes[idx[y]][pb - 1]
            frac = float(eq.sum()) / pa.size
        else:
            frac = 0.0
        w = np.full(pa.size, frac * 100.0, dtype=np.float32)
        lib[(int(x), int(y))] = (pa, pb, w)
        ident[x, y] = ident[y, x] = frac
    return lib, ident


def _get_lib(lib, x, y):
    """(positions-of-x, positions-of-y, weights) regardless of stored order."""
    if x < y:
        return lib.get((x, y), None)
    entry = lib.get((y, x), None)
    if entry is None:
        return None
    pa, pb, w = entry
    return pb, pa, w


def _triplet_extension(lib, g, lengths_local):
    """One round of T-Coffee consistency extension (min-weight composition)."""
    extra: dict[tuple[int, int], list] = {}
    for z in range(g):
        for x in range(g):
            if x == z:
                continue
            ex = _get_lib(lib, x, z)
            if ex is None or ex[0].size == 0:
                continue
            for y in range(x + 1, g):
                if y == z:
                    continue
                ey = _get_lib(lib, z, y)
                if ey is None or ey[0].size == 0:
                    continue
                # join on z positions (both monotone & unique).
                common, i1, i2 = np.intersect1d(
                    ex[1], ey[0], assume_unique=True, return_indices=True
                )
                if common.size == 0:
                    continue
                w = np.minimum(ex[2][i1], ey[2][i2])
                extra.setdefault((x, y), []).append((ex[0][i1], ey[1][i2], w))

    merged: dict[tuple[int, int], tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for x in range(g):
        for y in range(x + 1, g):
            parts = []
            base = lib.get((x, y))
            if base is not None and base[0].size:
                parts.append(base)
            parts.extend(extra.get((x, y), []))
            if not parts:
                continue
            pa = np.concatenate([p[0] for p in parts])
            pb = np.concatenate([p[1] for p in parts])
            w = np.concatenate([p[2] for p in parts])
            key = pa.astype(np.int64) * (int(lengths_local[y]) + 1) + pb
            uniq, inv = np.unique(key, return_inverse=True)
            wsum = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(wsum, inv, w)
            merged[(x, y)] = (
                (uniq // (int(lengths_local[y]) + 1)).astype(np.int32),
                (uniq % (int(lengths_local[y]) + 1)).astype(np.int32),
                wsum.astype(np.float32),
            )
    return merged


def _nj_tree(dist: np.ndarray) -> list[tuple[int, int]]:
    """Neighbour-joining merge order; returns [(node_a, node_b), ...] where
    leaves are 0..g-1 and internal nodes get indices g, g+1, ...
    """
    g = dist.shape[0]
    if g == 1:
        return []
    active = list(range(g))
    d = dist.astype(np.float64).copy()
    nodes = {i: i for i in range(g)}
    merges: list[tuple[int, int]] = []
    nxt = g
    while len(active) > 2:
        n = len(active)
        sub = d[np.ix_(active, active)]
        r = sub.sum(axis=1)
        q = (n - 2) * sub - r[:, None] - r[None, :]
        np.fill_diagonal(q, np.inf)
        a, b = np.unravel_index(np.argmin(q), q.shape)
        if a > b:
            a, b = b, a
        ia, ib = active[a], active[b]
        merges.append((nodes[ia], nodes[ib]))
        # distances to the new node.
        dnew = 0.5 * (d[ia, :] + d[ib, :] - d[ia, ib])
        d = np.pad(d, ((0, 1), (0, 1)))
        d[-1, : d.shape[1] - 1] = dnew
        d[: d.shape[0] - 1, -1] = dnew
        inew = d.shape[0] - 1
        nodes[inew] = nxt
        nxt += 1
        active = [v for v in active if v not in (ia, ib)] + [inew]
    if len(active) == 2:
        merges.append((nodes[active[0]], nodes[active[1]]))
    return merges


class _Profile:
    """members: local sequence indices; col2pos[m][c] = 1-based seq position
    or 0 for gap, for each column c."""

    def __init__(self, members: list[int], col2pos: list[np.ndarray]):
        self.members = members
        self.col2pos = col2pos

    @property
    def ncols(self) -> int:
        return self.col2pos[0].size if self.col2pos else 0

    @classmethod
    def leaf(cls, m: int, length: int) -> "_Profile":
        return cls([m], [np.arange(1, length + 1, dtype=np.int32)])


def _merge_profiles(pa: _Profile, pb: _Profile, lib, bandwidth: int) -> _Profile:
    la, lb = pa.ncols, pb.ncols
    if la == 0:
        return pb
    if lb == 0:
        return pa
    diff = lb - la
    lo = min(0, diff) - bandwidth
    hi = max(0, diff) + bandwidth
    W = hi - lo + 1
    cost = np.zeros((la, W), dtype=np.float32)

    for mi, a in enumerate(pa.members):
        # position -> column lookup for A member.
        p2c_a = np.zeros(int(pa.col2pos[mi].max(initial=0)) + 1, dtype=np.int32)
        nz = pa.col2pos[mi] > 0
        p2c_a[pa.col2pos[mi][nz]] = np.flatnonzero(nz).astype(np.int32) + 1
        for mj, b in enumerate(pb.members):
            entry = _get_lib(lib, a, b)
            if entry is None or entry[0].size == 0:
                continue
            qa, qb, w = entry
            p2c_b = np.zeros(int(pb.col2pos[mj].max(initial=0)) + 1, dtype=np.int32)
            nzb = pb.col2pos[mj] > 0
            p2c_b[pb.col2pos[mj][nzb]] = np.flatnonzero(nzb).astype(np.int32) + 1
            ci = p2c_a[qa]  # 1-based A columns
            cj = p2c_b[qb]
            k = cj - ci - lo
            ok = (k >= 0) & (k < W) & (ci >= 1)
            np.add.at(cost, (ci[ok] - 1, k[ok]), w[ok])

    _, (ai, bi) = banded_profile_merge(cost, la, lb, lo)

    # Build merged columns.
    cols: list[tuple[int, int]] = []  # (a_col or 0, b_col or 0), 1-based
    ia = ib = 1
    for ca, cb in zip(ai, bi):
        while ia < ca:
            cols.append((ia, 0))
            ia += 1
        while ib < cb:
            cols.append((0, ib))
            ib += 1
        cols.append((ca, cb))
        ia += 1
        ib += 1
    while ia <= la:
        cols.append((ia, 0))
        ia += 1
    while ib <= lb:
        cols.append((0, ib))
        ib += 1

    acol = np.asarray([c[0] for c in cols], dtype=np.int32)
    bcol = np.asarray([c[1] for c in cols], dtype=np.int32)
    new_c2p: list[np.ndarray] = []
    for m in range(len(pa.members)):
        src = np.concatenate([[0], pa.col2pos[m]])
        new_c2p.append(src[acol])
    for m in range(len(pb.members)):
        src = np.concatenate([[0], pb.col2pos[m]])
        new_c2p.append(src[bcol])
    return _Profile(pa.members + pb.members, new_c2p)


def _msa_group(codes, lengths, idx, match, mismatch, go, ge, bandwidth):
    g = idx.size
    if g == 0:
        return []
    decode = np.frombuffer(b"ACGTN-", dtype=np.uint8)
    if g == 1:
        n = int(lengths[idx[0]])
        return [decode[codes[idx[0], :n]].tobytes().decode()]

    lib, ident = _pair_library(
        codes, lengths, idx, match, mismatch, go, ge, bandwidth
    )
    lens_local = lengths[idx]
    lib = _triplet_extension(lib, g, lens_local)
    merges = _nj_tree(1.0 - ident)

    profiles: dict[int, _Profile] = {
        m: _Profile.leaf(m, int(lens_local[m])) for m in range(g)
    }
    nxt = g
    for a, b in merges:
        profiles[nxt] = _merge_profiles(profiles[a], profiles[b], lib, bandwidth)
        del profiles[a], profiles[b]
        nxt += 1
    final = profiles[nxt - 1] if merges else profiles[0]

    # Emit gapped strings in the group's original order.
    out = [""] * g
    order = {m: r for r, m in enumerate(final.members)}
    for m in range(g):
        r = order[m]
        c2p = final.col2pos[r]
        seq = codes[idx[m]]
        row = np.full(c2p.size, 5, dtype=np.int8)
        nz = c2p > 0
        row[nz] = seq[c2p[nz] - 1]
        out[m] = decode[row].tobytes().decode()
    return out


def multi_read_align(
    reads: SeqBatch,
    groups=None,
    max_error: float | None = None,
    match: float = 0,
    mismatch: float = -1,
    gap_opening: float = 5,
    gap_extension: float = 1,
    bandwidth: int = 100,
    keep_mask: bool = False,
    qual_type: str = "phred",
) -> Frame:
    """MSA per read group; returns Frame(alignments=List, qualities=List)."""
    n = len(reads)
    by_group, names = _split_groups(n, groups)

    use_mask = max_error is not None and not (
        isinstance(max_error, float) and np.isnan(max_error)
    )
    if use_mask:
        masked = quality_mask(reads, max_error, qual_type)
        codes = masked.codes
    else:
        codes = reads.codes
    lengths = reads.lengths

    alignments: list[list[str]] = []
    for idx in by_group:
        aln = _msa_group(
            codes,
            lengths,
            idx,
            float(match),
            float(mismatch),
            float(gap_opening),
            float(gap_extension),
            int(bandwidth),
        )
        if use_mask and not keep_mask and len(aln):
            originals = [
                reads.codes[i, : int(lengths[i])] for i in idx
            ]
            dec = np.frombuffer(b"ACGTN-", dtype=np.uint8)
            orig_strs = [dec[o].tobytes().decode() for o in originals]
            aln = unmask_alignment(aln, orig_strs)
        alignments.append(aln)

    out = Frame(nrow=len(by_group))
    out["alignments"] = alignments
    if reads.quals is not None:
        qstrs = reads.qual_strings()
        out["qualities"] = [[qstrs[int(i)] for i in idx] for idx in by_group]
    if names is not None:
        out.rownames = names
    return out

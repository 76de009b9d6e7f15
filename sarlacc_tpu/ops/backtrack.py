"""Host-side backtracking over batched run-length direction tensors.

The device DP kernel (:mod:`.align`) emits, per read, the same run-length
direction encoding as the reference (0 diagonal, +k left-run, -k up-run;
reference_align.cpp:162-174), stacked as ``dirs[R, N, L+1]`` for reference
columns 1..R.  This module replays the reference's template backtrack
(reference_align.cpp:231-278) over that tensor to produce either

* **query maps** — per reference position, whether it was matched and the DP
  row reached (reference_align.cpp:280-305), queried through
  :class:`~sarlacc_tpu.refimpl.align.QueryMap` semantics; or
* **gapped alignment strings** (reference_align.cpp:353-389).

Plain NumPy loops per read; a C++ fast path may shadow this later.  Each
read's walk is O(L + R) so even 1e5 reads are cheap relative to the DP.
"""

from __future__ import annotations

import numpy as np

from ..refimpl.align import QueryMap

__all__ = ["backtrack_map", "backtrack_maps", "backtrack_strings"]


def backtrack_map(dirs_nr: np.ndarray, rlen: int) -> QueryMap:
    """One read's ``fill_map`` from its [R, L+1] direction matrix."""
    nrows = dirs_nr.shape[1]
    mapping = [(False, 0)] * (rlen + 1)

    col = rlen
    currow = nrows - 1
    i = rlen
    while i > 0:
        while currow > 0:
            curdir = int(dirs_nr[col - 1, currow])
            if curdir >= 0:
                break
            currow += curdir  # consume the whole up-run

        curdir = int(dirs_nr[col - 1, currow])
        if curdir == 0:
            mapping[i] = (True, currow)
            currow -= 1
            col -= 1
            i -= 1
        else:
            for _ in range(curdir):
                mapping[i] = (False, currow + 1)
                i -= 1
                col -= 1
    return QueryMap(mapping, nrows)


def backtrack_maps(dirs: np.ndarray, lengths: np.ndarray, rlen: int) -> list[QueryMap]:
    """All reads' query maps.

    ``dirs`` is [R, N, L+1] (device layout); each read only uses rows
    0..length, so the direction matrix is sliced per read.
    """
    dirs = np.asarray(dirs)
    out = []
    for n in range(dirs.shape[1]):
        nrows = int(lengths[n]) + 1
        out.append(backtrack_map(dirs[:, n, :nrows], rlen))
    return out


def backtrack_strings(
    dirs_nr: np.ndarray, rlen: int, refseq: str, qseq: str
) -> tuple[str, str]:
    """One read's gapped (reference, query) strings (reference_align.cpp:353-389)."""
    nrows = dirs_nr.shape[1]
    rwork: list[str] = []
    qwork: list[str] = []

    col = rlen
    currow = nrows - 1
    i = rlen
    while i > 0:
        while currow > 0:
            curdir = int(dirs_nr[col - 1, currow])
            if curdir >= 0:
                break
            while curdir < 0:
                rwork.append("-")
                qwork.append(qseq[currow - 1])
                currow -= 1
                curdir += 1

        curdir = int(dirs_nr[col - 1, currow])
        if curdir == 0:
            rwork.append(refseq[i - 1])
            qwork.append(qseq[currow - 1])
            currow -= 1
            col -= 1
            i -= 1
        else:
            for _ in range(curdir):
                rwork.append(refseq[i - 1])
                qwork.append("-")
                i -= 1
                col -= 1
    while currow > 0:
        rwork.append("-")
        qwork.append(qseq[currow - 1])
        currow -= 1
    return "".join(reversed(rwork)), "".join(reversed(qwork))

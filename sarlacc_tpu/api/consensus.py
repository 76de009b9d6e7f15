"""``consensus_read_seq`` — one consensus sequence per MSA group.

Parity with R/consensusReadSeq.R:5-26 + src/create_consensus.cpp: quality
mode when the MSA frame carries qualities, basic mode otherwise; output is a
quality-scaled batch whose Phred strings follow ``errorsToString``
(create_consensus.cpp:18-32).

Groups are bucketed by (members, width) into padded device batches so jit
shapes stay bounded; padded member rows are all-gap and padded columns fail
min-coverage, so neither contributes.
"""

from __future__ import annotations

import numpy as np

from ..core.encode import SeqBatch
from ..core.frame import Frame
from ..core.quality import errors_to_phred_string, get_encoding
from ..ops.consensus import consensus_basic_dev, consensus_quality_dev
from ..utils.profiling import profiled

__all__ = ["consensus_read_seq"]

_CODE = np.full(256, -1, dtype=np.int8)
for _i, _b in enumerate("ACGTN-"):
    _CODE[ord(_b)] = _i
_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _encode_msa(alignments: list[str], allow_unknown: bool):
    """MSA strings -> [G, W] int8 codes; unknown chars -> 6 or an error."""
    g = len(alignments)
    if g == 0:
        raise ValueError("alignment set must be non-empty")
    w = len(alignments[0])
    for a in alignments:
        if len(a) != w:
            raise ValueError("alignment strings should have equal width")
    raw = np.frombuffer("".join(alignments).encode(), dtype=np.uint8).reshape(g, w)
    codes = _CODE[raw]
    bad = codes < 0
    if bad.any():
        if not allow_unknown:
            ch = chr(int(raw[bad][0]))
            raise ValueError(f"unknown character '{ch}' in alignment string")
        codes = np.where(bad, np.int8(6), codes)
    return codes


def _expand_quals(codes: np.ndarray, quals: list[str], encoding) -> np.ndarray:
    """Per-read de-gapped qualities -> per-gapped-column error probabilities.

    Reproduces the walk of create_consensus.cpp:191-238: every non-gap column
    consumes one quality char (N included); length mismatches raise the
    reference's errors.
    """
    g, w = codes.shape
    eps = np.full((g, w), 0.5, dtype=np.float64)
    for i in range(g):
        nongap = codes[i] != 5
        count = int(nongap.sum())
        q = quals[i]
        if count > len(q):
            raise ValueError("quality vector is shorter than the alignment sequence")
        if count < len(q):
            raise ValueError("quality vector is longer than the alignment sequence")
        if count:
            qcodes = np.frombuffer(q.encode(), dtype=np.uint8)
            eps[i, nongap] = encoding.to_error(qcodes)
    return eps


def _bucket_up(x: int) -> int:
    b = 8
    while b < x:
        b *= 2
    return b


@profiled("consensus_read_seq")
def consensus_read_seq(
    alignments: Frame | list[list[str]],
    pseudo_count: float = 1.0,
    min_coverage: float = 0.6,
    qual_type: str = "phred",
    qualities: list[list[str]] | None = None,
) -> SeqBatch:
    """Consensus per group; returns a quality-scaled SeqBatch (Phred+33)."""
    if isinstance(alignments, Frame):
        groups = list(alignments["alignments"])
        quals = list(alignments["qualities"]) if "qualities" in alignments else None
        names = alignments.rownames
    else:
        groups = list(alignments)
        quals = qualities
        names = None
    has_quals = quals is not None
    encoding = get_encoding(qual_type)

    ngroups = len(groups)
    enc = [_encode_msa(g, allow_unknown=has_quals) for g in groups]
    eps = (
        [_expand_quals(c, q, encoding) for c, q in zip(enc, quals)]
        if has_quals
        else [None] * ngroups
    )

    # Bucket by padded shape.
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, c in enumerate(enc):
        key = (_bucket_up(c.shape[0]), _bucket_up(max(c.shape[1], 1)))
        buckets.setdefault(key, []).append(i)

    seqs: list[str] = [""] * ngroups
    phreds: list[str] = [""] * ngroups
    for (gpad, wpad), idxs in buckets.items():
        b = len(idxs)
        codes = np.full((b, gpad, wpad), 5, dtype=np.int8)
        naligns = np.zeros(b, dtype=np.int32)
        epsb = np.full((b, gpad, wpad), 0.5, dtype=np.float64)
        for k, i in enumerate(idxs):
            g, w = enc[i].shape
            codes[k, :g, :w] = enc[i]
            naligns[k] = g
            if has_quals:
                epsb[k, :g, :w] = eps[i]
        if has_quals:
            keep, best, err = consensus_quality_dev(
                codes, epsb, naligns, float(min_coverage)
            )
        else:
            keep, best, err = consensus_basic_dev(
                codes, naligns, float(min_coverage), float(pseudo_count)
            )
        keep = np.asarray(keep)
        best = np.asarray(best)
        err = np.asarray(err, dtype=np.float64)
        for k, i in enumerate(idxs):
            w = enc[i].shape[1]
            cols = np.flatnonzero(keep[k, :w])
            seqs[i] = _BASES[best[k, cols]].tobytes().decode()
            phreds[i] = errors_to_phred_string(err[k, cols])

    out = SeqBatch.from_strings(seqs, phreds, names)
    return out

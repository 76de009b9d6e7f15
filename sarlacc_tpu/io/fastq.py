"""Streaming FASTQ I/O.

TPU-native replacement for the reference's ShortRead usage: chunked streaming
(``FastqStreamer``, R/adaptorAlign.R:26-36) bounds memory for arbitrarily
large files, and reservoir sampling (``FastqSampler``,
R/tuneAlignment.R:21-23) backs the calibration paths.  Gzip transparently
supported by suffix.  Chunks come back as padded :class:`SeqBatch` tensors
ready for device kernels.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator, Sequence

import numpy as np

from ..core.encode import SeqBatch

__all__ = [
    "stream_fastq",
    "read_fastq",
    "sample_fastq",
    "write_fastq",
    "count_fastq",
]


def _open(path: str, mode: str = "rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def _iter_records(path: str) -> Iterator[tuple[str, str, str]]:
    """Yields (name, sequence, quality)."""
    with _open(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                return
            header = header.rstrip("\n")
            if not header:
                continue
            if not header.startswith("@"):
                raise ValueError(f"malformed FASTQ header line: {header!r}")
            seq = fh.readline().rstrip("\n")
            plus = fh.readline()
            if not plus.startswith("+"):
                raise ValueError("malformed FASTQ record: missing '+' line")
            qual = fh.readline().rstrip("\n")
            if len(qual) != len(seq):
                raise ValueError("FASTQ quality and sequence lengths differ")
            yield header[1:].split()[0] if header[1:] else "", seq, qual


def stream_fastq(
    path: str, chunk_size: int = 100_000, pad_to: int | None = None
) -> Iterator[SeqBatch]:
    """Yield SeqBatch chunks of at most ``chunk_size`` reads."""
    names: list[str] = []
    seqs: list[str] = []
    quals: list[str] = []
    for name, seq, qual in _iter_records(path):
        names.append(name)
        seqs.append(seq)
        quals.append(qual)
        if len(seqs) >= chunk_size:
            yield SeqBatch.from_strings(seqs, quals, names, pad_to=pad_to)
            names, seqs, quals = [], [], []
    if seqs:
        yield SeqBatch.from_strings(seqs, quals, names, pad_to=pad_to)


def read_fastq(path: str, pad_to: int | None = None) -> SeqBatch:
    """Read an entire FASTQ into one batch."""
    names, seqs, quals = [], [], []
    for name, seq, qual in _iter_records(path):
        names.append(name)
        seqs.append(seq)
        quals.append(qual)
    return SeqBatch.from_strings(seqs, quals, names, pad_to=pad_to)


def sample_fastq(path: str, n: int, seed: int = 0) -> SeqBatch:
    """Uniform reservoir sample of ``n`` reads (FastqSampler equivalent)."""
    rng = np.random.default_rng(seed)
    reservoir: list[tuple[str, str, str]] = []
    for i, rec in enumerate(_iter_records(path)):
        if i < n:
            reservoir.append(rec)
        else:
            j = int(rng.integers(0, i + 1))
            if j < n:
                reservoir[j] = rec
    names = [r[0] for r in reservoir]
    seqs = [r[1] for r in reservoir]
    quals = [r[2] for r in reservoir]
    return SeqBatch.from_strings(seqs, quals, names)


def count_fastq(path: str) -> int:
    return sum(1 for _ in _iter_records(path))


def write_fastq(
    path: str,
    batch: SeqBatch | None = None,
    *,
    seqs: Sequence[str] | None = None,
    quals: Sequence[str] | None = None,
    names: Sequence[str] | None = None,
    append: bool = False,
) -> None:
    """Write reads to FASTQ (writeXStringSet equivalent)."""
    if batch is not None:
        seqs = batch.seq_strings()
        quals = batch.qual_strings()
        names = batch.names
    if seqs is None:
        raise ValueError("either batch or seqs must be given")
    if quals is None:
        raise ValueError("quality strings are required for FASTQ output")
    if names is None:
        names = [f"read_{i + 1}" for i in range(len(seqs))]
    mode = "at" if append else "wt"
    with _open(path, mode) as fh:
        for nm, sq, ql in zip(names, seqs, quals):
            fh.write(f"@{nm}\n{sq}\n+\n{ql}\n")

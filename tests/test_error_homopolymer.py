"""Error-profiling and homopolymer tests (reference test-error.R /
test-homopolymer.R models): substitution/deletion/insertion suites against
matrix-based oracles, plus validation errors."""

import numpy as np
import pytest

from sarlacc_tpu.api.profiling import (
    error_finder,
    homopolymer_finder,
    homopolymer_matcher,
)
from sarlacc_tpu.refimpl.errors import find_errors
from sarlacc_tpu.refimpl.homopolymer import find_homopolymers, match_homopolymers


# ---- error_finder --------------------------------------------------------

def test_find_errors_substitutions():
    ref = ["ACGT", "ACGT"]
    read = ["ACTT", "GCGT"]
    res = find_errors(ref, read)
    assert res["base"] == list("ACGT")
    assert res["A"].tolist() == [1, 0, 0, 0]
    assert res["G"].tolist() == [1, 0, 1, 0]
    assert res["T"].tolist() == [0, 0, 1, 2]
    assert res["deletion"].tolist() == [0, 0, 0, 0]


def test_find_errors_deletions_insertions():
    ref = ["AC-GT", "ACGT-"]
    read = ["ACAG-", "AC-TA"]
    res = find_errors(ref, read)
    # Deletion at position 4 (T) in read 1; at position 3 (G) in read 2.
    assert res["deletion"].tolist() == [0, 0, 1, 1]
    # Insertion after AC (before ref pos 2, 0-based) in read 1; at end in read 2.
    assert res["insertion_pos"].tolist() == [2, 4]
    assert res["insertion_len"].tolist() == [1, 1]


def test_error_finder_frame_and_transitions():
    ref = ["ACGT"] * 3
    read = ["ACGT", "TCGT", "AAGT"]
    out = error_finder((ref, read))
    assert len(out) == 5  # 4 positions + one-past-end
    trans = out.metadata["transition"]
    # Row A: observed A twice, T once... position 0: A->A, A->T, A->A;
    # position 1: C->C,C->C,C->A.
    assert trans[0].tolist() == [2, 0, 0, 1]  # A row
    assert trans[1].tolist() == [1, 2, 0, 0]  # C row
    assert trans.sum() == 12


def test_find_errors_validation():
    with pytest.raises(ValueError, match="match up"):
        find_errors(["AC"], [])
    with pytest.raises(ValueError, match="equal length"):
        find_errors(["AC"], ["A"])
    with pytest.raises(ValueError, match="same for all"):
        find_errors(["AC", "ACG"], ["AC", "ACG"])
    with pytest.raises(ValueError, match="unknown character"):
        find_errors(["AC"], ["AX"])


# ---- homopolymers --------------------------------------------------------

def rle_oracle(s: str):
    """Independent RLE finder on de-gapped coordinates."""
    degapped = s.replace("-", "")
    runs = []
    at = 0
    while at < len(degapped):
        run = at
        while run < len(degapped) and degapped[run] == degapped[at]:
            run += 1
        if run - at >= 2:
            runs.append((at + 1, run - at, degapped[at]))
        at = run
    return runs


def test_find_homopolymers_oracle(rng):
    for rep in range(20):
        s = "".join(rng.choice(list("ACGT-"), int(rng.integers(5, 40)), p=[0.3, 0.2, 0.2, 0.2, 0.1]))
        idx, pos, size, base = find_homopolymers([s])
        got = list(zip(pos, size, base))
        assert got == rle_oracle(s), s


def test_find_homopolymers_gap_spanning():
    # A run interrupted by gaps still counts as one run (rle_walker skips '-').
    idx, pos, size, base = find_homopolymers(["AA--A"])
    assert list(zip(pos, size, base)) == [(1, 3, "A")]


def test_match_homopolymers_basic():
    # Perfect match: observed length equals reference run length.
    ref = ["AAATCGG"]
    read = ["AAATCGG"]
    idx, pos, rlen = match_homopolymers(ref, read)
    assert pos == [1, 6]
    assert rlen == [3, 2]


def test_match_homopolymers_indels():
    # Read has one fewer A and one extra G.
    ref = ["AAA-TCGG-"]
    read = ["AA--TCGGG"]
    idx, pos, rlen = match_homopolymers(ref, read)
    assert pos == [1, 6]
    assert rlen == [2, 3]


def test_match_homopolymers_wrong_base():
    # Majority-different base in the window: only same-base runs count.
    ref = ["AAAA"]
    read = ["CCCC"]
    idx, pos, rlen = match_homopolymers(ref, read)
    assert pos == [1] and rlen == [0]


def test_match_validation():
    with pytest.raises(ValueError, match="match up"):
        match_homopolymers(["AC"], [])
    with pytest.raises(ValueError, match="equal length"):
        match_homopolymers(["AC"], ["A"])


def test_homopolymer_api(rng):
    seqs = ["AAACCGT", "ACGT"]
    frames = homopolymer_finder(seqs)
    assert frames[0]["start"].tolist() == [1, 4]
    assert frames[0]["width"].tolist() == [3, 2]
    assert len(frames[1]) == 0

    out = homopolymer_matcher((["AAACC", "AAACC"], ["AAACC", "AA-CC"]))
    assert out["start"].tolist() == [1, 4]
    assert out["observed"][0] == [2, 3]
    assert out["base"] == ["A", "C"]

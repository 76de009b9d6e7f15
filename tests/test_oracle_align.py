"""Validate the oracle aligner transcription against an independent Gotoh DP.

Mirrors the strategy of the reference's test-adaptor-align.R: an
independently-written, obviously-correct implementation is the oracle for the
optimised one.  Here the independent implementation is a textbook three-matrix
Gotoh DP sharing only the score tables; the transcription under test is
``sarlacc_tpu.refimpl.align.ReferenceAlign`` (run-length directions, jump
bookkeeping, fitting-mode boundary tricks).
"""

import numpy as np
import pytest

from sarlacc_tpu.core.encode import encode_seq
from sarlacc_tpu.core.scoring import build_score_tables
from sarlacc_tpu.refimpl.align import ReferenceAlign

NEG = float("-inf")


def gotoh(refseq, seq, qual, go, ge, local=True, qual_type="phred"):
    """Textbook affine-gap DP, fitting ('local-global') or global."""
    tables = build_score_tables(qual_type)
    from sarlacc_tpu.core.encode import iupac_reference

    ref = iupac_reference(refseq)
    q = np.frombuffer(qual.encode(), dtype=np.uint8)
    s = encode_seq(seq)
    qidx = tables.qual_index(q)
    m, r = len(s), len(ref.seq)
    open_ = go + ge

    S = np.full((m + 1, r + 1), NEG)
    H = np.full((m + 1, r + 1), NEG)
    V = np.full((m + 1, r + 1), NEG)
    S[0, 0] = 0.0
    for i in range(1, m + 1):
        S[i, 0] = 0.0 if local else -open_ - ge * (i - 1)
    for j in range(1, r + 1):
        H[0, j] = max(S[0, j - 1] - open_, H[0, j - 1] - ge)
        S[0, j] = H[0, j]

    for j in range(1, r + 1):
        last = local and j == r
        vgo = 0.0 if last else open_
        vge = 0.0 if last else ge
        tab_m = tables.match[ref.modes[j - 1] - 1]
        tab_mm = tables.mismatch[ref.modes[j - 1] - 1]
        for i in range(1, m + 1):
            matched = ref.matched[j - 1, int(s[i - 1])]
            cost = (tab_m if matched else tab_mm)[qidx[i - 1]]
            M = S[i - 1, j - 1] + cost
            H[i, j] = max(S[i, j - 1] - open_, H[i, j - 1] - ge)
            V[i, j] = max(S[i - 1, j] - vgo, V[i - 1, j] - vge)
            S[i, j] = max(M, H[i, j], V[i, j])
    return S[m, r]


def random_case(rng, minlen=5, maxlen=60):
    n = int(rng.integers(minlen, maxlen))
    seq = "".join(rng.choice(list("ACGT"), n))
    qual = "".join(chr(int(c)) for c in rng.integers(34, 75, n))
    return seq, qual


CURATED_ADAPTOR = "AAAAGGGGCCCCTTTT"
CURATED_READS = [
    ("AAAAGGGGCCCCTTTT", 1, 16),  # identical
    ("ACGTACGTACGTAAAAGGGGCCCCTTTT", 13, 28),  # insertion at the start
    ("AAAAGGGGCCCCTTTTACGTACGTACGT", 1, 16),  # insertion at the end
    ("GGGGCCCCTTTT", 1, 12),  # deletion at the start
    ("AAAAGGGGCCCC", 1, 12),  # deletion at the end
    ("ACGTACGTACGTAAAAGGGGCCCCTTTTACGTACGTACGT", 13, 28),
    ("ACGTACGTACGTAAAAGGGGCCCC", 13, 24),
    ("GGGGCCCCTTTTACGTACGTACGT", 1, 12),
    ("GGGGCCCC", 1, 8),
    ("AAAAGGGGACGTCCCCTTTT", 1, 20),  # insertion in the middle
    ("AAAAGGCCTTTT", 1, 12),  # deletion in the middle
]


def hi_qual(seq):
    return "I" * len(seq)  # Phred 40


def test_curated_scores_and_positions():
    ra = ReferenceAlign(CURATED_ADAPTOR, 5, 1)
    for seq, start, end in CURATED_READS:
        score = ra.align(seq, hi_qual(seq), local=True)
        ref_score = gotoh(CURATED_ADAPTOR, seq, hi_qual(seq), 5, 1, local=True)
        assert score == pytest.approx(ref_score, abs=1e-9)

        qmap = ra.fill_map()
        s, e = qmap(0, len(CURATED_ADAPTOR))
        assert (s + 1, e) == (start, end), seq


@pytest.mark.parametrize("go,ge", [(5, 1), (4, 2), (1, 1), (8, 3)])
@pytest.mark.parametrize("local", [True, False])
def test_random_score_parity(go, ge, local, rng):
    adaptors = ["ACGATCAGCTAGNNNNNCGACTAGCTAGCTAG", "AAAAGGGGCCCCTTTT", "CACACTGAGCAGCGACTAGA"]
    for rep in range(40):
        adaptor = adaptors[rep % len(adaptors)]
        seq, qual = random_case(rng)
        ra = ReferenceAlign(adaptor, go, ge)
        score = ra.align(seq, qual, local=local)
        ref_score = gotoh(adaptor, seq, qual, go, ge, local=local)
        assert score == pytest.approx(ref_score, abs=1e-9)


def test_affine_gap_cases():
    # Reference test-adaptor-align.R:59-85 — one mismatch cheaper than a gap,
    # multiple mismatches dearer than an equal-length gap.
    qual = "+" * 9  # Phred 10
    for adaptor, read in [("AAACCCAAATTTAAA", "AAAAAAAAA"), ("AAAAAA", "AAACCCAAA")]:
        ra = ReferenceAlign(adaptor, 5, 1)
        score = ra.align(read, qual, local=True)
        assert score == pytest.approx(gotoh(adaptor, read, qual, 5, 1), abs=1e-9)
        # Degapped strings must reconstruct the inputs.
        rstr, qstr = ra.fill_strings(read)
        assert qstr.replace("-", "") == read
        assert rstr.replace("-", "") == adaptor
        assert len(rstr) == len(qstr)


def test_empty_inputs():
    # Empty read: all-left path costs -(len(adaptor) + gapOpening)
    # (test-adaptor-align.R:53-56).
    ra = ReferenceAlign(CURATED_ADAPTOR, 5, 1)
    score = ra.align("", "", local=True)
    assert score == -(len(CURATED_ADAPTOR) + 5)
    qmap = ra.fill_map()
    s, e = qmap(0, len(CURATED_ADAPTOR))
    assert s == e  # flags the empty case; driver reports start=end=0

    # Empty adaptor: score 0 (test-adaptor-align.R:48-51).
    ra0 = ReferenceAlign("", 5, 1)
    assert ra0.align("ACGT", "IIII", local=True) == 0.0


def test_full_adaptor_extraction_covers_read(rng):
    # .align_and_extract with the full adaptor range returns the whole read
    # (test-adaptor-align.R:119-121) for every alignment.
    adaptor = "ACGATCAGCTAGNNNNNCGACTAGCTAGCTAG"
    ra = ReferenceAlign(adaptor, 5, 1)
    for _ in range(25):
        seq, qual = random_case(rng)
        ra.align(seq, qual, local=True)
        qmap = ra.fill_map()
        s, e = qmap(0, len(adaptor), include_gaps=True)
        assert (s, e) == (0, len(seq))


def test_strings_score_roundtrip(rng):
    # Recompute the score from the gapped strings and compare: validates the
    # backtrack path against the DP score for global alignments.
    adaptor = "AAAAGGGGCCCCTTTT"
    tables = build_score_tables("phred")
    go, ge = 5, 1
    ra = ReferenceAlign(adaptor, go, ge)
    for _ in range(25):
        seq, qual = random_case(rng, 8, 30)
        score = ra.align(seq, qual, local=False)
        rstr, qstr = ra.fill_strings(seq)
        assert qstr.replace("-", "") == seq
        assert rstr.replace("-", "") == adaptor

        # Tally the score implied by the alignment strings.
        total, qpos = 0.0, 0
        open_ = go + ge
        prev_r_gap = prev_q_gap = False
        for rc, qc in zip(rstr, qstr):
            if rc == "-":
                total -= ge if prev_r_gap else open_
                prev_r_gap, prev_q_gap = True, False
                qpos += 1
            elif qc == "-":
                total -= ge if prev_q_gap else open_
                prev_r_gap, prev_q_gap = False, True
            else:
                matched = rc == qc
                qi = tables.qual_index(np.array([ord(qual[qpos])]))[0]
                tab = tables.match if matched else tables.mismatch
                total += tab[0, qi]
                prev_r_gap = prev_q_gap = False
                qpos += 1
        assert score == pytest.approx(total, abs=1e-9)

"""Shuffle-by-pregroup: distributed grouping equals the single-device run.

SURVEY.md §5.8(iii): at pod scale each UMI pre-group must be co-located on
one shard before grouping/MSA (reference analog: the driver-side split() at
R/umiGroup.R:13-19).  These tests run on the 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import sarlacc_tpu as st
from sarlacc_tpu.core.encode import SeqBatch
from sarlacc_tpu.parallel.mesh import make_mesh
from sarlacc_tpu.parallel.shuffle import (
    assign_pregroups,
    shuffle_by_pregroup,
    sharded_pregroup_msa,
)


def _umis(n, seed, bases=("ACGTACGT", "TTGGCCAA", "GATCGATC", "CCATGGTA")):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        u = list(bases[i % len(bases)])
        k = int(rng.integers(0, 3))
        for _ in range(k):
            u[int(rng.integers(0, len(u)))] = "ACGT"[int(rng.integers(0, 4))]
        out.append("".join(u))
    return out


def test_assign_pregroups_deterministic_and_complete():
    sizes = [5, 1, 9, 3, 3, 7, 2, 2]
    a = assign_pregroups(sizes, 3)
    b = assign_pregroups(sizes, 3)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < 3
    # The largest group goes to shard 0 (first pick, all loads zero).
    assert a[2] == 0


def test_shuffle_by_pregroup_colocates_rows():
    mesh = make_mesh()
    n_shards = len(mesh.devices.flat)
    rng = np.random.default_rng(0)
    n = 40
    codes = rng.integers(0, 4, (n, 8)).astype(np.int32)
    by_group = [np.arange(0, 13), np.arange(13, 20), np.arange(20, 40)]
    (sc,), local_groups, budget = shuffle_by_pregroup(mesh, by_group, codes)
    assert sc.shape[0] == n_shards * budget
    seen = set()
    for s, groups_here in enumerate(local_groups):
        block = np.asarray(sc[s * budget : (s + 1) * budget])
        for gi, loc in groups_here:
            # Shard s's rows for group gi are exactly the original rows.
            assert np.array_equal(block[loc], codes[by_group[gi]])
            seen.add(gi)
    assert seen == {0, 1, 2}


@pytest.mark.parametrize("dual", [False, True])
def test_sharded_umi_group_matches_single_device(dual):
    mesh = make_mesh()
    n = 96
    umi1 = SeqBatch.from_strings(_umis(n, seed=1))
    umi2 = SeqBatch.from_strings(_umis(n, seed=2)) if dual else None
    pre = [i % 5 for i in range(n)]

    solo = st.umi_group(umi1, threshold1=2, umi2=umi2, threshold2=2, groups=pre)
    multi = st.umi_group(
        umi1, threshold1=2, umi2=umi2, threshold2=2, groups=pre, mesh=mesh
    )
    assert len(solo) == len(multi)
    for a, b in zip(solo, multi):
        assert np.array_equal(a, b)


def test_grouping_to_msa_handoff_matches_single_device():
    mesh = make_mesh()
    n = 48
    rng = np.random.default_rng(3)
    umis = SeqBatch.from_strings(_umis(n, seed=4))
    pre = [i % 3 for i in range(n)]
    fams = [g for g in st.umi_group(umis, threshold1=2, groups=pre) if g.size >= 2]
    assert fams, "fixture should produce multi-read families"

    reads = SeqBatch.from_strings(
        ["".join(rng.choice(list("ACGT"), 30)) for _ in range(n)]
    )
    ref = st.multi_read_align(reads, groups=fams, bandwidth=10)
    out = sharded_pregroup_msa(mesh, reads, fams, bandwidth=10)
    assert list(ref["alignments"]) == list(out["alignments"])
    assert list(ref["qualities"]) == list(out["qualities"]) if "qualities" in ref else True

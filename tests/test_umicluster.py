"""Greedy clustering + umi_group tests (reference test-umicluster.R model).

The in-test oracle reimplements the greedy rule independently (max surviving
neighbours, ties to the HIGHEST index — test-umicluster.R:4-29), fed with
random symmetric link sets; ``umi_group`` is then checked against the
composition of neighbour search + clustering, including pre-group
remapping with shuffling and the dual-UMI intersection order.
"""

import numpy as np
import pytest

from sarlacc_tpu.api.umi import umi_group
from sarlacc_tpu.refimpl.cluster import cluster_umis
from sarlacc_tpu.refimpl.levenshtein import find_neighbors


def random_links(rng, n, density=0.2):
    """Symmetric neighbour lists including self, in sorted order."""
    adj = rng.random((n, n)) < density
    adj = adj | adj.T
    np.fill_diagonal(adj, True)
    return [list(np.flatnonzero(adj[i])) for i in range(n)]


def ref_cluster(storage):
    """Second independent transcription of cluster_umis.cpp for cross-check."""
    n = len(storage)
    remaining = [len(s) for s in storage]
    out, cands = [], []
    for a in range(n):
        if remaining[a] > 1:
            cands.append(a)
        elif remaining[a] == 1:
            assert storage[a][0] == a
            out.append([a])
        else:
            raise ValueError("zero length read group")
    while cands:
        cands = [c for c in cands if remaining[c] > 0]
        if not cands:
            break
        best, bestval = cands[0], remaining[cands[0]]
        for c in cands[1:]:
            if remaining[c] >= bestval:  # ties -> highest index (later c wins)
                best, bestval = c, remaining[c]
        cands.remove(best)
        cl = []
        for nb in storage[best]:
            if remaining[nb] == 0:
                continue
            cl.append(nb)
            remaining[nb] = 0
            for nxt in storage[nb]:
                if remaining[nxt] > 0:
                    remaining[nxt] -= 1
        out.append(cl)
    return out


def test_cluster_random_links(rng):
    for rep in range(20):
        n = int(rng.integers(2, 40))
        links = random_links(rng, n, density=float(rng.uniform(0.05, 0.5)))
        assert cluster_umis(links) == ref_cluster(links)


def test_cluster_tie_breaks_highest_index():
    # Two nodes with equal degree: the higher index must seed first.
    links = [[0, 1], [0, 1], [2, 3], [2, 3]]
    out = cluster_umis(links)
    assert out[0] == [2, 3]  # node 3 ties node 1; highest wins -> cluster at 2/3 uses storage[3]
    # storage[3] = [2, 3] so emitted in that order.


def test_cluster_error_cases():
    with pytest.raises(ValueError, match="zero length"):
        cluster_umis([[]])
    with pytest.raises(ValueError, match="single-read groups"):
        cluster_umis([[1], [1]])


def rand_umis(rng, n, l=8):
    return ["".join(rng.choice(list("ACGT"), l)) for _ in range(n)]


def test_umi_group_matches_composition(rng):
    umis = rand_umis(rng, 40)
    groups = rng.integers(0, 3, 40)
    out = umi_group(umis, 2, groups=groups)
    exp = []
    for v in np.unique(groups):
        g = np.flatnonzero(groups == v)
        if g.size == 1:
            exp.append(g.tolist())
            continue
        nb = find_neighbors([umis[i] for i in g], 2)
        for cl in cluster_umis(nb):
            exp.append(g[np.asarray(cl)].tolist())
    assert [o.tolist() for o in out] == exp


def test_umi_group_pre_group_remap_shuffled(rng):
    # Shuffled explicit pre-groups: indices must map back to global ids
    # (test-umicluster.R:146-156).
    umis = rand_umis(rng, 30)
    perm = rng.permutation(30)
    pre = [perm[:13], perm[13:]]
    out = umi_group(umis, 2, groups=[p.tolist() for p in pre])
    exp = []
    for g in pre:
        nb = find_neighbors([umis[i] for i in g], 2)
        for cl in cluster_umis(nb):
            exp.append(g[np.asarray(cl)].tolist())
    assert [o.tolist() for o in out] == exp
    # Every read appears exactly once.
    flat = sorted(int(i) for o in out for i in o)
    assert flat == list(range(30))


def test_umi_group_solo_and_dual(rng):
    # Solo pre-groups short-circuit (umi_group.cpp:39-42).
    umis = rand_umis(rng, 5)
    out = umi_group(umis, 1, groups=[[0], [1], [2, 3, 4]])
    assert out[0].tolist() == [0] and out[1].tolist() == [1]

    # Dual UMI: intersection in UMI2 emission order.
    u1 = ["AAAA", "AAAT", "CCCC", "AAAA"]
    u2 = ["GGGG", "GGGG", "GGGG", "TTTT"]
    out = umi_group(u1, 1, u2, 0)
    nb1 = [set(x) for x in find_neighbors(u1, 1)]
    nb2 = find_neighbors(u2, 0)
    storage = [[m for m in nb2[q] if m in nb1[q]] for q in range(4)]
    exp = cluster_umis(storage)
    assert [o.tolist() for o in out] == exp

    with pytest.raises(ValueError, match="same length"):
        umi_group(u1, 1, u2[:2], 1)

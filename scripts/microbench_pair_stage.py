"""Time the MSA pair stage's device pieces separately on one bucket.

Usage: python scripts/microbench_pair_stage.py [P] [rows] [W]
Defaults mirror the 10k-group profile's dominant bucket (500 bp reads,
bandwidth 100): P=4096 pairs, rows=512, W=256.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from sarlacc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, reps=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    args = sys.argv[1:]
    P = int(args[0]) if args else 4096
    rows = int(args[1]) if len(args) > 1 else 512
    W = int(args[2]) if len(args) > 2 else 256

    from sarlacc_tpu.ops.msa import (
        _pair_ident_kernel,
        _pair_walk_kernel,
    )
    from sarlacc_tpu.ops.pallas_msa import banded_pair_pallas

    # First D2H per process pays the 30-450 s claim handshake; warm it so
    # the readback row below measures the tunnel, not the claim.
    np.asarray(jnp.zeros(8, jnp.int32) + 1)

    rng = np.random.default_rng(3)
    LA = rows - 10
    LB = LA + 6
    codes_a = rng.integers(0, 4, (P, LA)).astype(np.int8)
    codes_b = np.concatenate(
        [codes_a, rng.integers(0, 4, (P, LB - LA)).astype(np.int8)], axis=1
    )
    mut = rng.random((P, LB)) < 0.1
    codes_b[mut] = rng.integers(0, 4, int(mut.sum()))
    lens_a = np.full(P, LA, np.int32)
    lens_b = np.full(P, LB, np.int32)
    bw = (W - 7) // 2
    lo = np.full(P, -bw, np.int32) + np.minimum(0, lens_b - lens_a)
    kmax = np.full(P, W - 1, np.int32)

    cells = P * rows * W

    def dp():
        s, d = banded_pair_pallas(
            codes_a, codes_b, lens_a, lens_b, lo, kmax,
            0.0, -1.0, 5.0, 1.0, rows=rows, width=W,
        )
        return s, d

    t_dp = timeit(lambda: dp()[0])
    print(f"DP only       : {t_dp*1e3:8.1f} ms  {cells/t_dp/1e9:7.2f} GCUPS")

    s, d = dp()
    d = jax.block_until_ready(d)
    la_j = jnp.asarray(lens_a)
    lb_j = jnp.asarray(lens_b)
    lo_j = jnp.asarray(lo)

    t_walk = timeit(lambda: _pair_walk_kernel(d, la_j, lb_j, lo_j, wp_layout=True))
    print(f"walk only     : {t_walk*1e3:8.1f} ms")

    jm = jax.block_until_ready(
        _pair_walk_kernel(d, la_j, lb_j, lo_j, wp_layout=True)
    )
    ca = jnp.asarray(codes_a, jnp.int32)
    cb = jnp.asarray(codes_b, jnp.int32)
    t_id = timeit(lambda: _pair_ident_kernel(jm, ca, cb))
    print(f"ident only    : {t_id*1e3:8.1f} ms")

    # Readback of jmat (what _compact_jmat pulls in banded_pair_align).
    t0 = time.perf_counter()
    _ = np.asarray(jm)
    t_rb = time.perf_counter() - t0
    print(f"jmat readback : {t_rb*1e3:8.1f} ms ({jm.nbytes/2**20:.1f} MiB)")

    total = t_dp + t_walk + t_id
    print(f"total/bucket  : {total*1e3:8.1f} ms -> {cells/total/1e9:.2f} GCUPS effective")


if __name__ == "__main__":
    main()

"""Microbenchmark the score/direction Pallas kernels on the real TPU.

Sweeps the score kernel's lane-block width (ILP experiment: one 128-lane
tile is a single serial dependency chain; wider blocks interleave 2-4
independent streams), and times the direction-emitting kernel against the
lax.scan formulation it replaced.

Usage: python scripts/microbench_score_kernel.py [n_reads] [tol]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from sarlacc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    tol = int(sys.argv[2]) if len(sys.argv) > 2 else 250

    import jax
    import jax.numpy as jnp

    from sarlacc_tpu.api.align_internal import (
        prepare_adaptor,
        prepare_scores_input,
    )
    from sarlacc_tpu.core.encode import SeqBatch
    from sarlacc_tpu.ops import pallas_align as pa
    from sarlacc_tpu.ops.align import dp_align

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (n, tol)).astype(np.int8)
    lengths = np.full(n, tol, dtype=np.int64)
    quals = (rng.integers(20, 60, (n, tol)).astype(np.uint8) + 33)
    batch = SeqBatch(codes, lengths, quals, None)

    a1 = prepare_adaptor("ACGCTAGCATCAGTCNNNNCACAGCTACGANNNNNNNNNNNNCGTACGCAT")
    prep = prepare_scores_input(a1, batch)
    l1, n_pad = prep.plane_geometry()
    planes = prep.planes()
    jax.block_until_ready(planes)
    R = len(a1)
    cells = n_pad * l1 * R
    print(f"[cfg] n={n} tol={tol} R={R} l1={l1} n_pad={n_pad}", flush=True)

    def timeit(fn, reps=5):
        fn()  # compile + warm
        jax.block_until_ready(fn())
        t0 = time.time()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        return (time.time() - t0) / reps

    base = None
    for lb, unroll in ((128, 1), (128, 2), (128, 4), (128, 8), (256, 4)):
        dt = timeit(
            lambda: pa._launch_planes(
                jnp.asarray(np.asarray(a1.modes, np.int32)),
                jnp.asarray(pa._encode_mask(np.asarray(a1.matched))),
                jnp.asarray([5.0, 1.0], jnp.float32),
                *planes,
                prep.lengths,
                rlen=R, l1=l1, n_pad=n_pad, local=True, interpret=False,
                lb=lb, unroll=unroll,
            )
        )
        if base is None:
            base = dt
        print(
            f"[score lb={lb} u={unroll}] {dt * 1e3:.2f} ms  "
            f"{cells / dt / 1e9:.1f} GCUPS  ({base / dt:.2f}x vs first)",
            flush=True,
        )

    # Direction-emitting kernel vs the scan it replaced (smaller batch: the
    # scan at 100k is minutes).
    nd = min(n, 20_000)
    db = SeqBatch(codes[:nd], lengths[:nd], quals[:nd], None)
    from sarlacc_tpu.ops.align import prepare_reads

    dcodes, dqidx, dlens = prepare_reads(db, a1.tables)
    dcodes = jax.device_put(dcodes)
    dqidx = jax.device_put(dqidx)
    dlens = jax.device_put(dlens)

    def pallas_dirs():
        s, d, _ = pa.fit_dirs_pallas(
            dcodes, dqidx, dlens, a1.modes, a1.matched,
            a1.match_tab, a1.mismatch_tab, 5.0, 1.0, local=True,
        )
        return s, d

    dt_p = timeit(pallas_dirs, reps=3)
    dcells = nd * tol * R
    print(
        f"[dirs pallas n={nd}] {dt_p * 1e3:.2f} ms  {dcells / dt_p / 1e9:.1f} GCUPS",
        flush=True,
    )

    def scan_dirs():
        s, d = dp_align(
            dcodes, dqidx, dlens, a1.modes, a1.matched,
            a1.match_tab, a1.mismatch_tab, 5.0, 1.0,
            local=True, need_directions=True,
        )
        return s, d

    dt_s = timeit(scan_dirs, reps=3)
    print(
        f"[dirs scan   n={nd}] {dt_s * 1e3:.2f} ms  {dcells / dt_s / 1e9:.1f} GCUPS"
        f"  (pallas {dt_s / dt_p:.1f}x faster)",
        flush=True,
    )


if __name__ == "__main__":
    main()

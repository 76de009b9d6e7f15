"""Time the merge-wave components (cost init / entry accumulate / DP+walk)
on synthetic wave-shaped inputs at 10k-group scale, isolating which one
drives the ~170 s merge share of a 10k-group MSA.
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

from sarlacc_tpu.ops.msa import (  # noqa: E402
    MERGE_ENTRY_CHUNK,
    _merge_accum_kernel,
    _merge_cost_init,
    _merge_dp_walk,
)


def t(f, reps=3):
    out = f()
    for x in jax.tree_util.tree_leaves(out):
        _ = np.asarray(jnp.ravel(x)[:1])
    t0 = time.time()
    for _i in range(reps):
        out = f()
    for x in jax.tree_util.tree_leaves(out):
        _ = np.asarray(jnp.ravel(x)[:1])
    return (time.time() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    P, rows, W = 2048, 512, 256
    S = 8192
    PM = 1 << 20
    T = 1 << 25  # 33M-row library
    E_total = 20_000_000

    la = np.full(P, 500, np.int32)
    lb = np.full(P, 500, np.int32)
    lo = np.full(P, -128, np.int32)
    kmax = np.full(P, 255, np.int32)
    la_d, lb_d = jnp.asarray(la), jnp.asarray(lb)
    lo_d, km_d = jnp.asarray(lo), jnp.asarray(kmax)

    dt_init = t(lambda: _merge_cost_init(la_d, km_d, P=P, rows=rows, width=W))
    print(f"[cost_init P={P}] {dt_init*1e3:.1f} ms", flush=True)

    lib_tab = jnp.asarray(
        np.stack(
            [
                rng.integers(1, 500, T),
                rng.integers(1, 500, T),
                rng.integers(1, 60000, T),
            ],
            axis=1,
        ).astype(np.uint16)
    )
    w_inv = np.float32(1e-4)
    bound = np.sort(rng.integers(0, E_total, S)).astype(np.int32)
    bound[0] = 0
    vals = np.zeros((7, S), np.int32)
    vals[0] = rng.integers(0, T - MERGE_ENTRY_CHUNK, S)  # off
    vals[1] = rng.integers(0, P, S)  # m
    vals[2] = rng.integers(0, PM - 600, S)  # aoff
    vals[3] = rng.integers(0, PM - 600, S)  # boff
    vals[4] = rng.integers(0, 2, S)  # sw
    vals[5] = -128  # lo
    vals[6] = 255  # kmax
    delta = np.concatenate([vals[:, :1], np.diff(vals, axis=1)], axis=1)
    bound_d = jnp.asarray(bound)
    delta_d = jnp.asarray(delta.astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, 500, PM).astype(np.int16))
    total_d = jnp.asarray(E_total, jnp.int32)

    cost = _merge_cost_init(la_d, km_d, P=P, rows=rows, width=W)
    cost = jax.block_until_ready(cost)
    EC = MERGE_ENTRY_CHUNK

    def one_chunk():
        c = _merge_cost_init(la_d, km_d, P=P, rows=rows, width=W)
        return _merge_accum_kernel(
            lib_tab, w_inv, c, bound_d, delta_d, p2, p2,
            total_d, jnp.asarray(0, jnp.int32), EC=EC,
        )

    dt_acc = t(one_chunk)
    n_chunks = -(-E_total // EC)
    print(
        f"[accum 1 chunk of {EC>>20}M] {dt_acc*1e3:.1f} ms "
        f"({(dt_acc - dt_init)/EC*1e9:.1f} ns/entry) x {n_chunks} chunks",
        flush=True,
    )

    cost = jax.block_until_ready(
        _merge_cost_init(la_d, km_d, P=P, rows=rows, width=W)
    )

    def dp():
        c = _merge_cost_init(la_d, km_d, P=P, rows=rows, width=W)
        return _merge_dp_walk(c, la_d, lb_d, lo_d, km_d)

    dt_dp = t(dp)
    print(f"[dp+walk P={P}] {(dt_dp - dt_init)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Measure XLA scatter-add and gather rates on the TPU — the two primitives
that dominate the MSA library pipeline (triplet-extension composes maps with
per-element gathers; merge-wave cost accumulation is one scatter-add per
library entry).  These rates decide which restructurings are worth building.
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


def timeit(f, *args, reps=5):
    """Chain reps data-dependently and force a readback: block_until_ready
    on the axon remote platform returns early for some programs, and
    independent reps could overlap — a dependent chain + one np.asarray
    element pull gives an honest end-to-end floor."""
    out = f(*args)
    _ = np.asarray(jax.numpy.ravel(out)[:1])
    t0 = time.time()
    out = None
    for _i in range(reps):
        out = f(*args)
    _ = np.asarray(jax.numpy.ravel(out)[:1])
    return (time.time() - t0) / reps


def main():
    E = 1 << 21  # 2M — one merge-accumulate chunk
    rng = np.random.default_rng(0)

    # 1) scatter-add E floats into a [P*rows*W]-ish target (flat 64M).
    tgt = jnp.zeros(1 << 26, jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1 << 26, E), jnp.int32)
    w = jnp.asarray(rng.random(E), jnp.float32)

    @jax.jit
    def scat(tgt, idx, w):
        return tgt.at[idx].add(w)

    dt = timeit(scat, tgt, idx, w)
    print(f"[scatter-add 1D] {E} upd -> {dt * 1e3:.1f} ms  {dt / E * 1e9:.1f} ns/upd")

    idx_sorted = jnp.sort(idx)
    dt = timeit(scat, tgt, idx_sorted, w)
    print(f"[scatter-add 1D sorted] {E} upd -> {dt * 1e3:.1f} ms  {dt / E * 1e9:.1f} ns/upd")

    # 2) same with 3D target + 3D indices (the actual accum shape).
    tgt3 = jnp.zeros((256, 1024, 256), jnp.float32)
    i0 = jnp.asarray(rng.integers(0, 256, E), jnp.int32)
    i1 = jnp.asarray(rng.integers(0, 1024, E), jnp.int32)
    i2 = jnp.asarray(rng.integers(0, 256, E), jnp.int32)

    @jax.jit
    def scat3(tgt3, i0, i1, i2, w):
        return tgt3.at[i0, i1, i2].add(w)

    dt = timeit(scat3, tgt3, i0, i1, i2, w)
    print(f"[scatter-add 3D] {E} upd -> {dt * 1e3:.1f} ms  {dt / E * 1e9:.1f} ns/upd")

    # 3) element gather [E] from a flat 16M int16 table (triplet composition).
    table = jnp.asarray(rng.integers(0, 1024, 1 << 24), jnp.int16)
    gidx = jnp.asarray(rng.integers(0, 1 << 24, E), jnp.int32)

    @jax.jit
    def gath(table, gidx):
        return table[gidx]

    dt = timeit(gath, table, gidx)
    print(f"[gather 1D i16] {E} elem -> {dt * 1e3:.1f} ms  {dt / E * 1e9:.1f} ns/elem")

    # 4) row gather [E, 3] rows from [16M, 3] uint16 (library row fetch).
    tab2 = jnp.asarray(rng.integers(0, 1024, (1 << 22, 3)), jnp.uint16)
    ridx = jnp.asarray(rng.integers(0, 1 << 22, E), jnp.int32)

    @jax.jit
    def rgath(tab2, ridx):
        return tab2[ridx]

    dt = timeit(rgath, tab2, ridx)
    print(f"[row gather x3 u16] {E} rows -> {dt * 1e3:.1f} ms  {dt / E * 1e9:.1f} ns/row")

    # 5) the triplet composition shape: [CP, SL, STR] flat gather.
    CP, SL, STR = 256, 16, 1024
    arena = jnp.asarray(rng.integers(0, STR, (1 << 13, STR)), jnp.int16)
    flat = arena.reshape(-1)
    xz = jnp.asarray(rng.integers(0, STR, (CP, SL, STR)), jnp.int32)
    zrows = jnp.asarray(rng.integers(0, 1 << 13, (CP, SL)), jnp.int32)

    @jax.jit
    def comp(flat, zrows, xz):
        return flat[zrows[:, :, None] * STR + xz]

    dt = timeit(comp, flat, zrows, xz)
    n = CP * SL * STR
    print(f"[compose gather] {n} elem -> {dt * 1e3:.1f} ms  {dt / n * 1e9:.1f} ns/elem")


if __name__ == "__main__":
    main()

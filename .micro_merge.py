"""Microbench the merge-kernel sub-stages on the axon TPU. Not shipped."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp
import numpy as np
import functools

def timeit(name, fn, *args, reps=3):
    r = fn(*args); jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.1f} ms", file=sys.stderr)

P, ROWS, W = 16, 512, 128
E = 1 << 20  # ~1M scatter entries

rng = np.random.default_rng(0)
m = jnp.asarray(rng.integers(0, P, E), jnp.int32)
ci = jnp.asarray(rng.integers(0, ROWS, E), jnp.int32)
k = jnp.asarray(rng.integers(0, W, E), jnp.int32)
w = jnp.asarray(rng.random(E), jnp.float32)

@jax.jit
def scatter3d(m, ci, k, w):
    cost = jnp.zeros((P, ROWS, W), jnp.float32)
    return cost.at[m, ci, k].add(w, mode="drop")

@jax.jit
def seg_sum(m, ci, k, w):
    idx = (m * ROWS + ci) * W + k
    flat = jax.ops.segment_sum(w, idx, num_segments=P * ROWS * W)
    return flat.reshape(P, ROWS, W)

@jax.jit
def onehot_rows(m, ci, k, w):
    # group into rows of 128 entries, one-hot over k (width lanes), then
    # scatter whole rows — scatter count drops 1x but k-axis via one-hot.
    idx = m * ROWS + ci
    oh = jax.nn.one_hot(k, W, dtype=jnp.float32) * w[:, None]  # [E, W]
    cost = jnp.zeros((P * ROWS, W), jnp.float32)
    return cost.at[idx].add(oh, mode="drop").reshape(P, ROWS, W)

@jax.jit
def sort_seg(m, ci, k, w):
    idx = (m * ROWS + ci) * W + k
    order = jnp.argsort(idx)
    return jax.ops.segment_sum(w[order], idx[order], num_segments=P*ROWS*W, indices_are_sorted=True).reshape(P, ROWS, W)

timeit("scatter3d 1M -> [16,512,128]", scatter3d, m, ci, k, w)
timeit("segment_sum linearized", seg_sum, m, ci, k, w)
timeit("sort + sorted segsum", sort_seg, m, ci, k, w)
timeit("one-hot rows scatter", onehot_rows, m, ci, k, w)

# DP scan cost for the same plane shape (mimic _profile_merge_kernel body cost)
cost = jnp.asarray(rng.random((P, ROWS, W)), jnp.float32)
la = jnp.full(P, ROWS, jnp.int32); lb = jnp.full(P, ROWS, jnp.int32)
lo = jnp.zeros(P, jnp.int32); kmax = jnp.full(P, W-1, jnp.int32)

from sarlacc_tpu.ops.msa import _profile_merge_kernel, _merge_walk_kernel
f = functools.partial(_profile_merge_kernel, rows=ROWS, width=W)
timeit("profile_merge DP [16,512,128]", jax.jit(f), cost, la, lb, lo, kmax)

dirs = jnp.asarray(rng.integers(0, 3, (ROWS, P, W)), jnp.int8)
timeit("merge walk [512,16,128]", _merge_walk_kernel, dirs, la, lb, lo)

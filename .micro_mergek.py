"""Time _merge_from_library_kernel parts at real shapes on TPU. Not shipped."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from sarlacc_tpu.ops import msa as om

def timeit(name, fn, *args, reps=5):
    r = fn(*args)
    r = r[0] if isinstance(r, tuple) else r
    float(jnp.sum(r.astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        r = r[0] if isinstance(r, tuple) else r
        float(jnp.sum(r.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.1f} ms", file=sys.stderr)

P, ROWS, W, E, S, T = 32, 1024, 256, 262144, 256, 5_500_000
rng = np.random.default_rng(0)
lib_pa = jnp.asarray(rng.integers(1, 700, T), jnp.int16)
lib_pb = jnp.asarray(rng.integers(1, 700, T), jnp.int16)
lib_w = jnp.asarray(rng.random(T), jnp.float32)
seg_len_np = np.full(S, E // S, np.int64)
seg_cum_np = np.cumsum(seg_len_np)
seg_start = jnp.asarray(rng.integers(0, T - E, S), jnp.int64)
seg_len = jnp.asarray(seg_len_np)
seg_cum = jnp.asarray(seg_cum_np)
seg_merge = jnp.asarray(rng.integers(0, P, S), jnp.int32)
seg_aoff = jnp.zeros(S, jnp.int64)
seg_boff = jnp.zeros(S, jnp.int64)
seg_swap = jnp.zeros(S, jnp.int32)
MAPLEN = 1 << 16
p2ca = jnp.asarray(rng.integers(1, ROWS, MAPLEN), jnp.int32)
p2cb = jnp.asarray(rng.integers(1, ROWS, MAPLEN), jnp.int32)
la = jnp.full(P, ROWS - 7, jnp.int32)
lb = jnp.full(P, ROWS - 7, jnp.int32)
lo = jnp.full(P, -(W // 2), jnp.int32)
kmax = jnp.full(P, W - 1, jnp.int32)

full = functools.partial(om._merge_from_library_kernel, P=P, rows=ROWS, width=W, E=E, S=S)
args = (lib_pa, lib_pb, lib_w, seg_start, seg_len, seg_cum, seg_merge,
        seg_aoff, seg_boff, seg_swap, p2ca, p2cb, la, lb, lo, kmax)
timeit("full merge kernel", lambda: full(*args).astype(jnp.float32))

# scatter/cost-plane-only variant
@functools.partial(jax.jit, static_argnames=())
def cost_only(lib_pa, lib_pb, lib_w, seg_start, seg_len, seg_cum, seg_merge,
              seg_aoff, seg_boff, seg_swap, p2ca, p2cb, la, lb, lo, kmax):
    e = jnp.arange(E, dtype=jnp.int32)
    seg_id = jnp.clip(jnp.searchsorted(seg_cum, e, side="right"), 0, S - 1).astype(jnp.int32)
    base = seg_cum[seg_id] - seg_len[seg_id]
    within = e - base
    t = jnp.clip(seg_start[seg_id] + within, 0, lib_pa.shape[0] - 1)
    total = seg_cum[S - 1]
    valid_e = e < total
    sw = seg_swap[seg_id] == 1
    pa_raw = lib_pa[t].astype(jnp.int32)
    pb_raw = lib_pb[t].astype(jnp.int32)
    pa_e = jnp.where(sw, pb_raw, pa_raw)
    pb_e = jnp.where(sw, pa_raw, pb_raw)
    w_e = lib_w[t]
    ci = p2ca[jnp.clip(seg_aoff[seg_id] + pa_e, 0, p2ca.shape[0] - 1)]
    cj = p2cb[jnp.clip(seg_boff[seg_id] + pb_e, 0, p2cb.shape[0] - 1)]
    m = seg_merge[seg_id]
    k = cj - ci - lo[m]
    ok = valid_e & (ci >= 1) & (cj >= 1) & (k >= 0) & (k <= kmax[m]) & (k < W) & (ci <= ROWS)
    cost = jnp.full((P, ROWS, W), om.NEG, jnp.float32)
    karr = jnp.arange(W, dtype=jnp.int32)
    in_band = karr[None, None, :] <= kmax[:, None, None]
    live_rows = jnp.arange(1, ROWS + 1, dtype=jnp.int32)[None, :, None] <= la[:, None, None]
    cost = jnp.where(in_band & live_rows, 0.0, cost)
    cost = cost.at[jnp.where(ok, m, P), jnp.clip(ci - 1, 0, ROWS - 1), jnp.clip(k, 0, W - 1)].add(jnp.where(ok, w_e, 0.0), mode="drop")
    return cost

timeit("cost scatter only", lambda: jnp.sum(cost_only(*args)))

cost = cost_only(*args)
dp = jax.jit(functools.partial(om._profile_merge_kernel, rows=ROWS, width=W))
timeit("blocked DP only", lambda: dp(cost, la, lb, lo, kmax)[1].astype(jnp.float32))
_, dirs = dp(cost, la, lb, lo, kmax)
timeit("merge walk only", lambda: om._merge_walk_kernel(dirs, la, lb, lo))

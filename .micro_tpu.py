"""Microbench loop/gather primitives on the axon TPU. Not shipped."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax, jax.numpy as jnp
import numpy as np

def timeit(name, fn, *args, reps=3):
    r = fn(*args); jax.block_until_ready(r)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: min {min(ts)*1e3:.1f} ms  (reps {['%.1f'%(t*1e3) for t in ts]})", file=sys.stderr)

P, RW = 128, 1024 * 256
flat = jnp.zeros((P, RW), jnp.int8)
idx0 = jnp.arange(P, dtype=jnp.int32) * 1000

@jax.jit
def fori_trivial(x):
    def body(t, c):
        return c + 1
    return jax.lax.fori_loop(0, 1000, body, x)

@jax.jit
def while_trivial(x):
    def cond(c): return c[1] < 1000
    def body(c): return (c[0] + 1, c[1] + 1)
    return jax.lax.while_loop(cond, body, (x, jnp.int32(0)))[0]

@jax.jit
def scan_trivial(x):
    def body(c, t): return c + 1, ()
    return jax.lax.scan(body, x, jnp.arange(1000))[0]

@jax.jit
def fori_gather(idx):
    def body(t, c):
        i, acc = c
        d = jnp.take_along_axis(flat, i[:, None], axis=1)[:, 0].astype(jnp.int32)
        return (i + 1, acc + d)
    return jax.lax.fori_loop(0, 1000, body, (idx, jnp.zeros(P, jnp.int32)))[1]

@jax.jit
def fori_gather_scatter(idx):
    out = jnp.zeros((P, 1026), jnp.int32)
    parr = jnp.arange(P)
    def body(t, c):
        i, acc, out = c
        d = jnp.take_along_axis(flat, i[:, None], axis=1)[:, 0].astype(jnp.int32)
        out = out.at[parr, jnp.minimum(t, 1025)].set(d)
        return (i + 1, acc + d, out)
    return jax.lax.fori_loop(0, 1000, body, (idx, jnp.zeros(P, jnp.int32), out))[1]

x0 = jnp.float32(0)
timeit("fori trivial x1000", fori_trivial, x0)
timeit("while trivial x1000", while_trivial, x0)
timeit("scan trivial x1000", scan_trivial, x0)
timeit("fori gather[128,256k] x1000", fori_gather, idx0)
timeit("fori gather+scatter x1000", fori_gather_scatter, idx0)

# representative merge DP scan (rows=1024, W=256, P=16)
cost = jnp.zeros((16, 1024, 256), jnp.float32)
@jax.jit
def merge_dp(cost):
    def row(S, i):
        c = jax.lax.dynamic_index_in_dim(cost, i - 1, 1, keepdims=False)
        M = S + c
        S_up = jnp.concatenate([S[:, 1:], jnp.full((16, 1), -1e9)], axis=1)
        D = jnp.maximum(M, S_up)
        Sn = jax.lax.cummax(D, axis=1)
        return Sn, jnp.where(M >= Sn, 0, 1).astype(jnp.int8)
    S, dirs = jax.lax.scan(row, jnp.zeros((16, 256)), jnp.arange(1, 1025, dtype=jnp.int32))
    return S, dirs
timeit("merge DP scan 1024x[16,256]", merge_dp, cost)

# host->device and device->host transfer of 1 MB
h = np.zeros((256, 1024), np.float32)
def h2d(a):
    return jax.device_put(a)
timeit("h2d 1MB", h2d, h)
d = jnp.zeros((256, 1024), jnp.float32)
def d2h(a):
    return np.asarray(a)
timeit("d2h 1MB", d2h, d)
print("devices:", jax.devices(), file=sys.stderr)

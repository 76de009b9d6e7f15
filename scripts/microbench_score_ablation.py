"""Attribute the score kernel's cycles by ablation, on hardware.

Runs the production score kernel and three ablated variants (same launch
shape, same loop structure) and reports device time per variant:

  full        — the shipped column body
  no-prefix   — vertical-gap prefix-max replaced by one max (wrong results,
                same memory traffic): isolates the 8-stage log-shift cost
  no-dyncost  — cost planes replaced by a constant (wrong results, same
                arithmetic): isolates the dynamically-indexed VMEM reads
  neither     — both ablations

The deltas are the honest hardware shares of the two suspects; whatever
remains is the serial column skeleton (recurrences, stores, loop).

Usage: python scripts/microbench_score_ablation.py [N] [L] [R]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

from sarlacc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NEG = -3.0e38
LANES = 128


def _kernel_ablate(modes_ref, mask_ref, scal_ref, costm_ref, costmm_ref,
                   codes_ref, out_ref, s_ref, h_ref, *, rlen, l1,
                   no_prefix, no_dyncost, unroll=4):
    go = scal_ref[0] + scal_ref[1]
    ge = scal_ref[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (l1, LANES), 0)
    rows_f = rows.astype(jnp.float32)
    masks = {}
    sh = 1
    while sh < l1:
        masks[sh] = rows < sh
        sh *= 2
    row0 = masks[1]
    rge = rows_f * ge
    rge1 = (rows_f - 1.0) * ge

    def shift1(x, sh):
        rolled = pltpu.roll(x, sh, axis=0)
        return jnp.where(masks[sh], NEG, rolled)

    ramp = -go - rge1
    s_ref[:] = jnp.where(row0, 0.0, ramp)
    h_ref[:] = jnp.full((l1, LANES), NEG, jnp.float32)
    codes = codes_ref[:]

    def column_body(j):
        S = s_ref[:]
        H = h_ref[:]
        mode = modes_ref[j]
        if no_dyncost:
            cost = jnp.where(codes == 1, -0.1, -1.0) + S * 0.0
        else:
            cm = costm_ref[mode - 1]
            cmm = costmm_ref[mode - 1]
            sel = jax.lax.shift_right_logical(
                jnp.broadcast_to(mask_ref[j], codes.shape), codes
            ) & 1
            cost = jnp.where(sel == 1, cm, cmm)
        Hn = jnp.maximum(S - go, H - ge)
        M = shift1(S, 1) + cost
        mv = jnp.maximum(M, Hn)
        cum = (mv - go) + rge
        if no_prefix == "half":
            # Idealized two-rows-per-sublane packing: its BEST case is one
            # fewer log-shift stage plus a free cross-half combine, i.e.
            # exactly the 7-stage scan below (wrong results, right cost) —
            # an empirical upper bound for VERDICT r4 #5's packing idea.
            sh = 1
            while sh < l1 // 2:
                cum = jnp.maximum(cum, shift1(cum, sh))
                sh *= 2
        elif not no_prefix:
            sh = 1
            while sh < l1:
                cum = jnp.maximum(cum, shift1(cum, sh))
                sh *= 2
        V = shift1(cum, 1) - rge1
        Sn = jnp.maximum(mv, V)
        s_ref[:] = Sn
        h_ref[:] = Hn

    def columns(p, _):
        for u in range(unroll):
            column_body(unroll * p + u)
        return 0

    jax.lax.fori_loop(0, rlen // unroll, columns, 0)
    for j in range((rlen // unroll) * unroll, rlen):
        column_body(j)
    out_ref[:] = s_ref[:]


@functools.partial(
    jax.jit, static_argnames=("rlen", "l1", "n_pad", "no_prefix", "no_dyncost")
)
def _launch(modes, mask, scalars, costm, costmm, codes_k,
            rlen, l1, n_pad, no_prefix, no_dyncost):
    grid = (n_pad // LANES,)
    kern = functools.partial(
        _kernel_ablate, rlen=rlen, l1=l1,
        no_prefix=no_prefix, no_dyncost=no_dyncost,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l1, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l1, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l1, LANES), jnp.float32),
            pltpu.VMEM((l1, LANES), jnp.float32),
        ],
    )(modes, mask, scalars, costm, costmm, codes_k)


def main():
    args = sys.argv[1:]
    N = int(args[0]) if args else 100_000
    L = int(args[1]) if len(args) > 1 else 250
    R = int(args[2]) if len(args) > 2 else 51

    rng = np.random.default_rng(0)
    l1 = ((L + 1 + 7) // 8) * 8
    n_pad = ((N + 511) // 512) * 512
    modes = jnp.asarray(rng.integers(1, 5, R), jnp.int32)
    mask = jnp.asarray(rng.integers(1, 31, R), jnp.int32)
    scal = jnp.asarray([4.0, 1.0], jnp.float32)
    costm = jnp.asarray(rng.normal(size=(4, l1, n_pad)) * 0.1 - 0.05, jnp.float32)
    costmm = jnp.asarray(rng.normal(size=(4, l1, n_pad)) * 0.1 - 1.0, jnp.float32)
    codes = jnp.asarray(rng.integers(0, 4, (l1, n_pad)), jnp.int32)

    cells = float(N) * L * R
    np.asarray(jnp.zeros(8) + 1)  # warm the D2H claim

    for label, (npfx, ndc) in {
        "full": (False, False),
        "half-prefix": ("half", False),
        "no-prefix": (True, False),
        "no-dyncost": (False, True),
        "neither": (True, True),
    }.items():
        fn = lambda: _launch(modes, mask, scal, costm, costmm, codes,
                             rlen=R, l1=l1, n_pad=n_pad,
                             no_prefix=npfx, no_dyncost=ndc)
        fn().block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = fn()
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:>11}: {dt*1e3:8.2f} ms  {cells/dt/1e9:7.1f} GCUPS")


if __name__ == "__main__":
    main()

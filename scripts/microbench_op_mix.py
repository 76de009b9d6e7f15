"""Measure per-class VPU throughput for the score kernel's instruction mix.

The bench roofline divides the VPU's nominal 4-ALU issue rate by the
kernel's static op census, assuming EVERY op (cross-sublane rolls, vector
selects, dynamically-indexed VMEM reads) retires at 1 elementwise-slot.
This microbench measures each class's real throughput with FOLD-PROOF
chains — every step depends on the previous result and alternates operand
planes, so Mosaic cannot collapse idempotent patterns (the failure mode
that made the r3 attempt unreliable).

Output: ops/s per class on the kernel's own (256, 128) f32 tiles, plus the
re-derived mix ceiling for the shipped 45-slot column body.

Usage: python scripts/microbench_op_mix.py
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

L1, LANES = 256, 128
ITERS = 2048
DEPTH = 16  # dependent steps per iteration (chain)


def _launch(body, nops_per_step, extra_scratch=()):
    """body(x, b1, b2, rows, step) -> x, applied DEPTH times per iter."""

    def kern(a_ref, b1_ref, b2_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (L1, LANES), 0)
        b1 = b1_ref[:]
        b2 = b2_ref[:]

        def it(i, x):
            # Fold the loop counter in so iterations cannot collapse.
            x = x + jnp.float32(1e-7)
            for s in range(DEPTH):
                x = body(x, b1, b2, rows, s)
            return x

        out_ref[:] = jax.lax.fori_loop(0, ITERS, it, a_ref[:])

    @jax.jit
    def run(a, b1, b2):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((L1, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b1, b2)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(L1, LANES)) * 1e-3, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(L1, LANES)) * 1e-3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(L1, LANES)) * 1e-3, jnp.float32)
    run(a, b1, b2).block_until_ready()  # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = run(a, b1, b2)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    total_ops = ITERS * DEPTH * nops_per_step * L1 * LANES + ITERS * L1 * LANES
    return total_ops / dt


def main():
    results = {}

    # Pure elementwise: add+max alternating operands (2 ops/step).
    results["elementwise"] = _launch(
        lambda x, b1, b2, rows, s: jnp.maximum(x + (b1 if s % 2 else b2), b2),
        2,
    ) / 2e12  # report per-op rate in Tops/s below

    # Roll + max: one cross-sublane rotate + one max per step.
    def roll_body(x, b1, b2, rows, s):
        return jnp.maximum(pltpu.roll(x, 1 + (s % 3), axis=0), b1 if s % 2 else b2)

    results["roll+max"] = _launch(roll_body, 2) / 2e12

    # Select chain: mask-select + add per step (the shift-fill pattern).
    def sel_body(x, b1, b2, rows, s):
        m = rows < (8 << (s % 4))
        return jnp.where(m, b1 if s % 2 else b2, x) + jnp.float32(1e-7)

    results["select+add"] = _launch(sel_body, 2) / 2e12

    # The kernel's actual 3-op shift stage: roll, masked fill, max.
    def stage_body(x, b1, b2, rows, s):
        sh = 1 << (s % 8)
        rolled = pltpu.roll(x, sh, axis=0)
        filled = jnp.where(rows < sh, jnp.float32(-3e38), rolled)
        return jnp.maximum(filled, b1 if s % 2 else b2)

    results["shift-stage(3op)"] = _launch(stage_body, 3) / 2e12

    for k, v in results.items():
        print(f"{k:>18}: {v * 1e12:.3e} ops/s")

    # Re-derive the mix ceiling for the shipped column body census:
    #   10 roll-bearing slots live inside 8 shift stages (24 slots total,
    #   measured as whole 3-op stages), 21 elementwise slots (arith, max,
    #   select, probe), 2 dyn-indexed loads + 2 stores (counted elementwise
    #   — DMA-free VMEM ops), per cell.
    ew = results["elementwise"] * 1e12
    st3 = results["shift-stage(3op)"] * 1e12
    # seconds per cell = stage slots at stage rate + rest at elementwise rate
    sec_cell = 24 / st3 + 21 / ew
    mix_ceiling_gcups = 1.0 / sec_cell / 1e9
    naive = None
    try:
        kind = getattr(jax.devices()[0], "device_kind", "").lower()
        peak = 1 * 4 * (8 * 128) * (1.74e9 if ("lite" in kind or "v5e" in kind) else 1.75e9)
        naive = peak / 45.0 / 1e9
    except Exception:
        pass
    print(f"\nmeasured elementwise rate : {ew:.3e} ops/s")
    print(f"measured 3-op stage rate  : {st3:.3e} ops/s")
    print(f"mix ceiling               : {mix_ceiling_gcups:.1f} GCUPS")
    if naive:
        print(f"naive 45-slot roofline    : {naive:.1f} GCUPS")


if __name__ == "__main__":
    main()

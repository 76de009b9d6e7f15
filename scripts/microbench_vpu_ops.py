"""Measure per-op VPU issue rates for the score kernel's instruction mix.

The bench roofline divides the VPU's nominal 4-ALU issue rate by the
kernel's STATIC op count, implicitly assuming every op (including
cross-sublane rolls and selects) retires at 1 op/ALU-slot.  This
microbenchmark measures each op class's real throughput on the same
(256, 128) f32 tiles the kernel uses, so the remainder between measured
GCUPS and the naive roofline can be attributed instruction class by
instruction class (VERDICT r2 #1: "a written breakdown of the remainder").

Each kernel loops ITERS times over a body of K independent op chains
(4 chains x depth 8 = 32 ops/iter) so pipeline latency is hidden and the
measurement is throughput, not latency.
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
ITERS = 512
CHAINS = 4
DEPTH = 8


def _bench_kernel(op_body):
    def kern(a_ref, b_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (L1, LANES), 0)
        mask = rows < 8
        chains = [a_ref[:] + float(c) for c in range(CHAINS)]
        b = b_ref[:]

        def it(i, chains):
            new = []
            for x in chains:
                for _ in range(DEPTH):
                    x = op_body(x, b, mask)
                new.append(x)
            return new

        chains = jax.lax.fori_loop(0, ITERS, it, chains)
        acc = chains[0]
        for x in chains[1:]:
            acc = acc + x
        out_ref[:] = acc

    return kern


def bench(name, op_body, reps=5):
    a = jnp.ones((L1, LANES), jnp.float32)
    b = jnp.full((L1, LANES), 0.5, jnp.float32)
    call = pl.pallas_call(
        _bench_kernel(op_body),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L1, LANES), jnp.float32),
    )
    f = jax.jit(lambda a, b: call(a, b))
    jax.block_until_ready(f(a, b))
    t0 = time.time()
    outs = [f(a, b) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / reps
    n_ops = ITERS * CHAINS * DEPTH * L1 * LANES
    rate = n_ops / dt  # elementwise ops (32x32 vreg lanes) per second
    print(f"[{name:>10}] {dt * 1e3:7.3f} ms  {rate / 1e12:6.3f} T elem-ops/s")
    return rate


def main():
    print(f"[cfg] tile ({L1},{LANES}) f32, {CHAINS} chains x {DEPTH} deep x {ITERS} iters")
    r_add = bench("add", lambda x, b, m: x + b)
    r_max = bench("max", lambda x, b, m: jnp.maximum(x, b))
    r_sel = bench("select", lambda x, b, m: jnp.where(m, b, x))
    r_roll1 = bench("roll1", lambda x, b, m: pltpu.roll(x, 1, axis=0) + b)
    r_roll32 = bench("roll32", lambda x, b, m: pltpu.roll(x, 32, axis=0) + b)
    # roll+add pairs count as 2 static ops; isolate the roll rate:
    # 1/rate_roll = 1/rate_pair*2 - 1/rate_add ... report raw pair rates.
    print("\n[mix model] score kernel per-column static ops:")
    counts = {"add/sub/mul": 8, "max": 11, "select": 11, "cmp/shift": 3,
              "roll": 10, "store": 2}
    print(f"  {counts}")
    # Effective slot cost of a roll relative to an add:
    def pair_cost(pair_rate, add_rate):
        return max(2.0 / pair_rate - 1.0 / add_rate, 1e-18)

    c_roll1 = pair_cost(r_roll1, r_add) * r_add
    c_roll32 = pair_cost(r_roll32, r_add) * r_add
    print(f"  roll(1) costs {c_roll1:.2f} add-slots; roll(32) costs {c_roll32:.2f}")
    slots = (
        counts["add/sub/mul"] + counts["cmp/shift"] + counts["store"]
        + counts["max"] * r_add / r_max
        + counts["select"] * r_add / r_sel
        + counts["roll"] * (c_roll1 + c_roll32) / 2
    )
    print(f"  measured-issue-slot count/cell: {slots:.1f} (static 45)")
    print(f"  peak add rate {r_add / 1e12:.3f} T/s -> mix ceiling "
          f"{r_add / slots / 1e9:.1f} GCUPS")


if __name__ == "__main__":
    main()

"""Device-time breakdown of the demux score path on the real TPU.

Answers VERDICT r2 weak #1: where do the ~1.5 s for 3.05e9 DP cells go?
Splits wall time into (a) pure Pallas kernel execution, (b) the XLA
cost-plane gather prelude, (c) dispatch+sync overhead, (d) score readback,
and (e) the barcode scan path.  Run ON TPU (plain `python`, axon hijack on).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from sarlacc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    dk = getattr(jax.devices()[0], "device_kind", "?")
    print("device_kind:", dk, flush=True)

    from sarlacc_tpu.api.align_internal import (
        align_scores_only, prepare_adaptor, prepare_scores_input,
    )
    from sarlacc_tpu.core.encode import SeqBatch
    import sarlacc_tpu.ops.pallas_align as pa

    N, L = 100_000, 250
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (N, L)).astype(np.int8)
    lengths = np.full(N, L, dtype=np.int64)
    quals = rng.integers(20, 60, (N, L)).astype(np.uint8) + 33
    front = SeqBatch(codes, lengths, quals, None)

    a1 = prepare_adaptor("ACGCTAGCATCAGTCNNNNCACAGCTACGANNNNNNNNCGTACGCAT")
    a2 = prepare_adaptor("TGCATCGATCGCAT")

    t0 = time.time()
    prep = prepare_scores_input(a1, front)
    (dcodes, dqidx, dlen), n = prep
    jax.block_until_ready(dcodes)
    print(f"upload: {time.time()-t0:.3f}s", flush=True)

    # --- full path (compile + 5 timed reps, sync but no readback) ---
    R1 = len(a1)
    for name, ad in (("a1(R=47)", a1), ("a2(R=14)", a2)):
        R = len(ad)
        args = dict(
            codes=dcodes, qidx=dqidx, lengths=dlen, modes=ad.modes,
            matched=ad.matched, match_tab=ad.match_tab,
            mismatch_tab=ad.mismatch_tab, gap_opening=5.0,
            gap_extension=1.0, local=True,
        )
        t0 = time.time()
        out = pa.fit_scores_pallas(**args)
        jax.block_until_ready(out)
        print(f"{name} first call (compile): {time.time()-t0:.3f}s", flush=True)
        reps = 5
        t0 = time.time()
        for _ in range(reps):
            out = pa.fit_scores_pallas(**args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        cells = N * L * R
        print(f"{name} steady: {dt*1e3:.1f} ms -> {cells/dt/1e9:.1f} GCUPS wall", flush=True)
        t0 = time.time()
        host = np.asarray(out)
        print(f"{name} readback [N]f32: {(time.time()-t0)*1e3:.1f} ms", flush=True)

    # --- isolate the prelude (pad/transpose + cost gathers) ---
    l1 = ((L + 1 + 7) // 8) * 8
    n_pad = ((N + pa.LANES - 1) // pa.LANES) * pa.LANES

    @jax.jit
    def prelude(qidx, codes_in, match_tab, mismatch_tab):
        NN, LL = codes_in.shape
        qidx_k = jnp.zeros((l1, n_pad), jnp.int32)
        qidx_k = qidx_k.at[1 : LL + 1, :NN].set(qidx.astype(jnp.int32).T)
        codes_k = jnp.full((l1, n_pad), 5, jnp.int32)
        codes_k = codes_k.at[0].set(0)
        codes_k = codes_k.at[1 : LL + 1, :NN].set(codes_in.astype(jnp.int32).T)
        costm = jnp.take(match_tab, qidx_k, axis=1)
        costmm = jnp.take(mismatch_tab, qidx_k, axis=1)
        return costm, costmm, codes_k

    mt = jnp.asarray(a1.match_tab, jnp.float32)
    mmt = jnp.asarray(a1.mismatch_tab, jnp.float32)
    q8 = jnp.asarray(np.asarray(dqidx), jnp.int8)
    c8 = jnp.asarray(np.asarray(dcodes), jnp.int8)
    out = prelude(q8, c8, mt, mmt)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = prelude(q8, c8, mt, mmt)
    jax.block_until_ready(out)
    print(f"prelude (pad+transpose+gather): {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

    costm, costmm, codes_k = out

    # --- pure kernel with pre-staged planes ---
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for name, ad in (("a1", a1), ("a2", a2)):
        R = len(ad)
        kern = functools.partial(pa._kernel, rlen=R, l1=l1, local=True)
        modes = jnp.asarray(np.asarray(ad.modes, np.int32))
        menc = jnp.asarray(pa._encode_matched(np.asarray(ad.matched)))
        scal = jnp.asarray([6.0, 1.0], jnp.float32)

        @jax.jit
        def pure(modes, menc, scal, costm, costmm, codes_k):
            return pl.pallas_call(
                kern,
                grid=(n_pad // pa.LANES,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((4, l1, pa.LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, l1, pa.LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
                    pl.BlockSpec((l1, pa.LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((l1, pa.LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((l1, n_pad), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((l1, pa.LANES), jnp.float32),
                    pltpu.VMEM((l1, pa.LANES), jnp.float32),
                ],
            )(modes, menc, scal, costm, costmm, codes_k)

        o = pure(modes, menc, scal, costm, costmm, codes_k)
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(5):
            o = pure(modes, menc, scal, costm, costmm, codes_k)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / 5
        cells = N * L * R
        print(f"pure kernel {name}(R={R}): {dt*1e3:.1f} ms -> {cells/dt/1e9:.1f} GCUPS device", flush=True)

    # --- barcode scan path ---
    import sarlacc_tpu as st

    bc_rng = np.random.default_rng(7)
    barcodes = ["".join(bc_rng.choice(list("ACGT"), 12)) for _ in range(12)]
    obs_codes = bc_rng.integers(0, 4, (N, 12)).astype(np.int8)
    obs = SeqBatch(obs_codes, np.full(N, 12, np.int64),
                   bc_rng.integers(53, 93, (N, 12)).astype(np.uint8), None)
    t0 = time.time()
    st.barcode_align(obs, barcodes)
    print(f"barcode_align 12bc first (compile+run): {time.time()-t0:.3f}s", flush=True)
    t0 = time.time()
    st.barcode_align(obs, barcodes)
    print(f"barcode_align 12bc steady: {time.time()-t0:.3f}s", flush=True)

    # --- 4-call demux sequence as bench does (wall) ---
    pb = prepare_scores_input(a1, front)
    t0 = time.time()
    s1 = align_scores_only(a1, None, 5.0, 1.0, prepared=prep)
    s2 = align_scores_only(a2, None, 5.0, 1.0, prepared=pb)
    s3 = align_scores_only(a1, None, 5.0, 1.0, prepared=pb)
    s4 = align_scores_only(a2, None, 5.0, 1.0, prepared=prep)
    print(f"4-call demux sequence (with np.asarray each): {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()

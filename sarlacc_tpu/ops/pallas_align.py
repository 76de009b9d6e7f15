"""Pallas TPU kernel for the score-only fitting/global affine-gap DP.

The XLA ``lax.scan`` version (:mod:`.align`) dispatches ~R small VPU ops per
column and round-trips state; this kernel keeps the whole DP state in VMEM
and runs the entire column loop inside one launch:

* layout: reads on the **lane** axis (128 per tile), read positions on the
  sublane axis — every recurrence is elementwise over a ``(L+1, 128)`` tile;
* the vertical-gap prefix-max (see :mod:`.align` for the derivation) becomes
  a log-shift cummax along sublanes (8 shifted maxes for L+1 <= 256);
* per-column scalars (degeneracy mode, IUPAC matched row) come from SMEM;
  per-read-position match/mismatch costs are precomputed outside (one XLA
  gather) and held in VMEM for the whole launch.

Gap penalties arrive in SMEM so the tuning grid (35 penalty combinations,
R/tuneAlignment.R:54-72) reuses one compiled kernel.  Used by
``align_scores_only`` on TPU; the scan path remains the fallback and the
direction-emitting path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fit_scores_pallas", "pallas_available"]

NEG = -3.0e38
LANES = 128


def pallas_available() -> bool:
    return jax.devices()[0].platform == "tpu"


def _shift_down(x, sh, fill):
    """Rows move down by ``sh``; the top ``sh`` rows become ``fill``."""
    rolled = pltpu.roll(x, sh, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < sh, fill, rolled)


def _kernel(modes_ref, matched_ref, scal_ref, costm_ref, costmm_ref, codes_ref, out_ref, s_ref, h_ref, *, rlen, l1, local):
    go = scal_ref[0] + scal_ref[1]  # gap_open stored as open+extend
    ge = scal_ref[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (l1, LANES), 0)
    rows_f = rows.astype(jnp.float32)

    # Column 0 (reference_align.cpp:65-74).
    if local:
        s_ref[:] = jnp.zeros((l1, LANES), jnp.float32)
    else:
        ramp = -go - ge * (rows_f - 1.0)
        s_ref[:] = jnp.where(rows == 0, 0.0, ramp)
    h_ref[:] = jnp.full((l1, LANES), NEG, jnp.float32)

    codes = codes_ref[:]  # (l1, LANES) int32; row i holds read base i-1

    def column(j, _):
        S = s_ref[:]
        H = h_ref[:]
        mode = modes_ref[j]

        cm = costm_ref[mode - 1]  # (l1, LANES)
        cmm = costmm_ref[mode - 1]
        sel = jnp.zeros((l1, LANES), jnp.bool_)
        for b in range(5):
            sel = jnp.logical_or(
                sel, jnp.logical_and(codes == b, matched_ref[j, b] > 0)
            )
        cost = jnp.where(sel, cm, cmm)

        if local:
            is_last = j == rlen - 1
            vgo = jnp.where(is_last, 0.0, go)
            vge = jnp.where(is_last, 0.0, ge)
        else:
            vgo, vge = go, ge

        Hn = jnp.maximum(S - go, H - ge)
        M = _shift_down(S, 1, NEG) + cost
        M = jnp.where(rows == 0, NEG, M)

        mv = jnp.maximum(M, Hn)
        B = (mv - vgo) + rows_f * vge
        cum = B
        sh = 1
        while sh < l1:
            cum = jnp.maximum(cum, _shift_down(cum, sh, NEG))
            sh *= 2
        V = _shift_down(cum, 1, NEG) - (rows_f - 1.0) * vge
        V = jnp.where(rows == 0, NEG, V)

        Sn = jnp.maximum(mv, V)
        Sn = jnp.where(rows == 0, Hn, Sn)
        s_ref[:] = Sn
        h_ref[:] = Hn
        return 0

    jax.lax.fori_loop(0, rlen, column, 0)
    out_ref[:] = s_ref[:]


def _encode_matched(matched: np.ndarray) -> np.ndarray:
    """matched [R,5] bool -> int32 0/1 table (minor dim padded for SMEM)."""
    r = matched.shape[0]
    enc = np.zeros((max(r, 1), 8), dtype=np.int32)
    enc[:r, :5] = matched.astype(np.int32)
    return enc


@functools.partial(
    jax.jit, static_argnames=("rlen", "l1", "n_pad", "local", "interpret")
)
def _launch(modes, matched_enc, scalars, match_tab, mismatch_tab, qidx, codes_in, rlen, l1, n_pad, local, interpret):
    # Plane construction (pad + transpose) and cost-table gathers all happen
    # ON DEVICE: the [N, L] int8 codes/qidx arrays from prepare_reads are the
    # only host->device transfer (the remote tunnel is slow, and they are
    # usually already device-resident).
    N, L = codes_in.shape
    qidx_k = jnp.zeros((l1, n_pad), jnp.int32)
    qidx_k = qidx_k.at[1 : L + 1, :N].set(qidx.astype(jnp.int32).T)
    codes_k = jnp.full((l1, n_pad), 5, jnp.int32)
    codes_k = codes_k.at[0].set(0)
    codes_k = codes_k.at[1 : L + 1, :N].set(codes_in.astype(jnp.int32).T)

    costm = jnp.take(match_tab, qidx_k, axis=1)  # [4, l1, n]
    costmm = jnp.take(mismatch_tab, qidx_k, axis=1)
    codes = codes_k
    n_lanes = n_pad
    grid = (n_lanes // LANES,)
    kern = functools.partial(_kernel, rlen=rlen, l1=l1, local=local)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # modes [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # matched [R, 8]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2]
            pl.BlockSpec((4, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l1, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l1, n_lanes), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l1, LANES), jnp.float32),
            pltpu.VMEM((l1, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(modes, matched_enc, scalars, costm, costmm, codes)


def fit_scores_pallas(
    codes,  # [N, L] int32
    qidx,  # [N, L] int32
    lengths,  # [N] int32
    modes,  # [R] int32
    matched,  # [R, 5] bool
    match_tab,  # [4, Q]
    mismatch_tab,
    gap_opening: float,
    gap_extension: float,
    local: bool = True,
    interpret: bool | None = None,
):
    """Batch scores via the Pallas kernel; returns [N] float32.

    ``codes``/``qidx`` may be device arrays — they are NOT pulled to the
    host (every host round-trip crosses the slow tunnel twice).
    """
    if interpret is None:
        interpret = not pallas_available()
    N, L = codes.shape
    R = int(np.asarray(modes).shape[0])
    l1 = L + 1
    # Sublane alignment: pad L+1 to a multiple of 8.
    l1 = ((l1 + 7) // 8) * 8
    n_pad = ((N + LANES - 1) // LANES) * LANES

    scalars = jnp.asarray([float(gap_opening), float(gap_extension)], jnp.float32)
    out = _launch(
        jnp.asarray(np.asarray(modes, np.int32)),
        jnp.asarray(_encode_matched(np.asarray(matched))),
        scalars,
        jnp.asarray(match_tab, jnp.float32),
        jnp.asarray(mismatch_tab, jnp.float32),
        jnp.asarray(qidx, jnp.int8),
        jnp.asarray(codes, jnp.int8),
        rlen=R,
        l1=l1,
        n_pad=n_pad,
        local=local,
        interpret=bool(interpret),
    )
    if R == 0:
        l = np.asarray(lengths)
        if local:
            return jnp.zeros(N, jnp.float32)
        return jnp.asarray(
            np.where(l == 0, 0.0, -(gap_opening + gap_extension) - gap_extension * (l - 1)),
            jnp.float32,
        )
    scores = jnp.take_along_axis(
        out[:, :N], jnp.asarray(lengths, jnp.int32)[None, :], axis=0
    )[0]
    return scores

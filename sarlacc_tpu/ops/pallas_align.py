"""Pallas TPU kernel for the score-only fitting/global affine-gap DP.

The XLA ``lax.scan`` version (:mod:`.align`) dispatches ~R small VPU ops per
column and round-trips state; this kernel keeps the whole DP state in VMEM
and runs the entire column loop inside one launch:

* layout: reads on the **lane** axis (128 per tile), read positions on the
  sublane axis — every recurrence is elementwise over a ``(L+1, 128)`` tile;
* the vertical-gap prefix-max (see :mod:`.align` for the derivation) becomes
  a log-shift cummax along sublanes (8 shifted maxes for L+1 <= 256);
* per-column scalars (degeneracy mode, IUPAC matched-bases bitmask) come
  from SMEM; per-read-position match/mismatch cost planes are precomputed
  once per uploaded batch (:func:`build_cost_planes`) and shared by every
  launch that reuses the batch — all adaptors, all barcodes, and the whole
  tuning grid (the tables depend only on the quality encoding,
  reference_align.cpp:21-52, not on the reference sequence).

Gap penalties arrive in SMEM so the tuning grid (35 penalty combinations,
R/tuneAlignment.R:54-72) reuses one compiled kernel.  Used by
``align_scores_only`` and ``barcode_align`` on TPU; the scan path remains
the fallback and the direction-emitting path.

Measured v5e breakdown (scripts/profile_demux_tpu.py, 100k x 250 reads,
R=47): pure kernel 22 ms (53 GCUPS); plane build 140 ms but amortized
across >= 4 launches per batch; [N] f32 readback ~137 ms through the
remote tunnel, so callers should batch readbacks (stack scores, one pull).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fit_scores_pallas",
    "build_cost_planes",
    "fit_scores_from_planes",
    "fit_scores_segments",
    "fit_dirs_pallas",
    "dirs_pallas_ok",
    "pallas_available",
    "plane_dims",
]

NEG = -3.0e38
LANES = 128


def pallas_available() -> bool:
    return jax.devices()[0].platform == "tpu"


def plane_dims(N: int, L: int) -> tuple[int, int]:
    """(l1, n_pad): sublane-aligned DP height and lane-padded batch width.

    ``n_pad`` is a multiple of 512 so one plane build serves every kernel
    lane-block width (128/256/512 — see ``SCORE_LANE_BLOCK``)."""
    l1 = ((L + 1 + 7) // 8) * 8
    n_pad = ((N + 511) // 512) * 512
    return l1, n_pad


#: Lanes per score-kernel grid step.  MEASURED (scripts/
#: microbench_score_kernel.py, v5e, 100k x 250 x R=51): 128 -> 74.9 GCUPS,
#: 256 -> 59.3, 512 -> 56.3.  One (256, 128) f32 tile is already 32
#: independent vregs per op — plenty of ILP — while wider blocks double or
#: quadruple the VMEM working set and starve the grid pipeline's double
#: buffers.  Overridable for microbenchmarks via SARLACC_SCORE_LB.
SCORE_LANE_BLOCK = 128


def _score_lb() -> int:
    import os

    return int(os.environ.get("SARLACC_SCORE_LB", SCORE_LANE_BLOCK))


#: Columns per score-kernel loop iteration (loop-overhead amortization).
SCORE_UNROLL = 4


def _score_unroll() -> int:
    import os

    return int(os.environ.get("SARLACC_SCORE_UNROLL", SCORE_UNROLL))


def _shift_down(x, sh, fill):
    """Rows move down by ``sh``; the top ``sh`` rows become ``fill``."""
    rolled = pltpu.roll(x, sh, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < sh, fill, rolled)


def _kernel(modes_ref, mask_ref, scal_ref, costm_ref, costmm_ref, codes_ref, out_ref, s_ref, h_ref, *, rlen, l1, local, lanes=LANES, unroll=4):
    go = scal_ref[0] + scal_ref[1]  # gap_open stored as open+extend
    ge = scal_ref[1]

    rows = jax.lax.broadcasted_iota(jnp.int32, (l1, lanes), 0)
    rows_f = rows.astype(jnp.float32)
    # Loop-invariant hoists: the shift fill masks (one per log-shift stage),
    # the gap ramps, and the row-0 mask — the column loop body then runs
    # ~42 vector ops per cell (the roofline denominator in bench.py).
    masks = {}
    sh = 1
    while sh < l1:
        masks[sh] = rows < sh
        sh *= 2
    row0 = masks[1]
    rge = rows_f * ge  # vertical-gap open ramp
    rge1 = (rows_f - 1.0) * ge  # and its closing ramp

    def shift1(x, sh):
        rolled = pltpu.roll(x, sh, axis=0)
        return jnp.where(masks[sh], NEG, rolled)

    # Column 0 (reference_align.cpp:65-74).
    if local:
        s_ref[:] = jnp.zeros((l1, lanes), jnp.float32)
    else:
        ramp = -go - rge1
        s_ref[:] = jnp.where(row0, 0.0, ramp)
    h_ref[:] = jnp.full((l1, lanes), NEG, jnp.float32)

    codes = codes_ref[:]  # (l1, lanes) int32; row i holds read base i-1

    def column_body(j, zero_vgap):
        """One reference column; ``zero_vgap`` (static) = fitting-mode last
        column where trailing query gaps are free (reference_align.cpp:120-121)."""
        S = s_ref[:]
        H = h_ref[:]
        mode = modes_ref[j]

        cm = costm_ref[mode - 1]  # (l1, LANES)
        cmm = costmm_ref[mode - 1]
        # IUPAC match test as one bitmask probe: bit b of mask_ref[j] says
        # whether observed base b matches this reference column
        # (reference_align.cpp:184-212 semantics baked in upstream).
        sel = jax.lax.shift_right_logical(
            jnp.broadcast_to(mask_ref[j], codes.shape), codes
        ) & 1
        cost = jnp.where(sel == 1, cm, cmm)

        Hn = jnp.maximum(S - go, H - ge)
        M = shift1(S, 1) + cost  # row 0 already NEG via the shift fill

        mv = jnp.maximum(M, Hn)
        if zero_vgap:
            cum = mv
        else:
            # Keep the scan path's exact association ((mv - go) + rge, not
            # mv + (rge - go)): one extra op per cell buys last-ulp score
            # identity with dp_align and _dir_kernel at exact ties.
            cum = (mv - go) + rge
        sh = 1
        while sh < l1:
            cum = jnp.maximum(cum, shift1(cum, sh))
            sh *= 2
        V = shift1(cum, 1)  # row 0 NEG via the fill
        if not zero_vgap:
            V = V - rge1

        # Row 0 needs no special case: M and V are exactly NEG there (the
        # shift fills), so max(mv, V) is already Hn.
        Sn = jnp.maximum(mv, V)
        s_ref[:] = Sn
        h_ref[:] = Hn

    # Fitting mode peels the last column (free vertical gaps,
    # reference_align.cpp:120-121) so the loop keeps constant penalties;
    # the remaining columns run ``unroll`` per iteration to amortize loop
    # overhead (measured v5e, R=51: 1x 74.9 GCUPS, 2x 81.8).
    full = rlen - 1 if (local and rlen >= 1) else rlen

    def columns(p, _):
        for u in range(unroll):
            column_body(unroll * p + u, False)
        return 0

    jax.lax.fori_loop(0, full // unroll, columns, 0)
    for j in range((full // unroll) * unroll, full):
        column_body(j, False)
    if local and rlen >= 1:
        column_body(rlen - 1, True)
    out_ref[:] = s_ref[:]


def _dir_kernel(
    modes_ref, mask_ref, scal_ref, costm_ref, costmm_ref, codes_ref,
    out_ref, dirs_ref, s_ref, h_ref, wl_ref, ljp_ref, *, rlen, l1, local,
):
    """Direction-emitting variant of :func:`_kernel` (VERDICT r2 #4).

    Emits the reference's run-length direction encoding (0 diagonal, +k
    left-run, -k up-run — reference_align.cpp:126-174) per column into
    ``dirs_ref [rlen, l1, LANES]`` int16, bit-identical to the ``lax.scan``
    path in :mod:`.align` (same tie rules: the horizontal/vertical *jump*
    wins only if strictly greater, reproduced as ``cand >= jump``).  The
    up-run lengths are reconstructed post-hoc from the prefix-max exactly as
    in :mod:`.align`'s derivation: ``cond_v[i] = (S[i-1] - open_or_ext) >=
    (V[i-1] - ext)`` marks rows where the vertical gap does NOT extend a
    jump, and a row-axis prefix-max of those row indices gives each row's
    jump point.
    """
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

    def shift1(x, sh, fill=NEG):
        rolled = pltpu.roll(x, sh, axis=0)
        return jnp.where(masks[sh], fill, rolled)

    if local:
        s_ref[:] = jnp.zeros((l1, LANES), jnp.float32)
    else:
        ramp = -go - rge1
        s_ref[:] = jnp.where(row0, 0.0, ramp)
    h_ref[:] = jnp.full((l1, LANES), NEG, jnp.float32)
    wl_ref[:] = jnp.zeros((l1, LANES), jnp.int32)
    ljp_ref[:] = jnp.zeros((l1, LANES), jnp.int32)

    codes = codes_ref[:]

    def column_body(j, zero_vgap):
        S = s_ref[:]
        H = h_ref[:]
        was_left = wl_ref[:]
        ljp = ljp_ref[:]
        mode = modes_ref[j]
        vgo = 0.0 if zero_vgap else go
        vge = 0.0 if zero_vgap else ge

        cm = costm_ref[mode - 1]
        cmm = costmm_ref[mode - 1]
        sel = jax.lax.shift_right_logical(
            jnp.broadcast_to(mask_ref[j], codes.shape), codes
        ) & 1
        cost = jnp.where(sel == 1, cm, cmm)

        M = shift1(S, 1) + cost

        # Horizontal gap with jump bookkeeping (reference_align.cpp:126-140):
        # the open candidate charges only the extension when the source
        # cell's own direction was a left step.
        cand1_h = S - jnp.where(was_left == 1, ge, go)
        jump_h = H - ge
        cond_h = cand1_h >= jump_h
        Hn = jnp.where(cond_h, cand1_h, jump_h)

        mv = jnp.maximum(M, Hn)
        if zero_vgap:
            cum = mv
        else:
            cum = (mv - go) + rge
        sh = 1
        while sh < l1:
            cum = jnp.maximum(cum, shift1(cum, sh))
            sh *= 2
        V = shift1(cum, 1)
        if not zero_vgap:
            V = V - rge1

        Sn0 = jnp.maximum(mv, V)
        Sn = jnp.where(row0, Hn, Sn0)

        # Choice + tie-breaks (reference_align.cpp:162-174).
        is_diag = (M > Hn) & (M > V)
        is_left = (~is_diag) & (Hn > V)

        # Left-run lengths: pos = j (0-based reference position).
        pos = j
        left_step = jnp.where(cond_h, 1, 1 + pos - ljp)
        ljp_ref[:] = jnp.where(cond_h, pos, ljp)

        # Up-run lengths, reconstructed post-hoc (see .align).
        is_up = ~(is_diag | is_left)
        is_up_prev = shift1(is_up.astype(jnp.int32), 1, 0) == 1
        cand1_v = shift1(Sn, 1) - jnp.where(is_up_prev, vge, vgo)
        jump_v = shift1(V, 1) - vge
        cond_v = cand1_v >= jump_v
        pnt = jnp.where(cond_v, rows, 0)
        sh = 1
        while sh < l1:
            pnt = jnp.maximum(pnt, shift1(pnt, sh, 0))
            sh *= 2
        pnt_prev = shift1(pnt, 1, 0)
        up_step = jnp.where(cond_v, 1, 1 + rows - pnt_prev)

        dir_enc = jnp.where(
            is_diag, 0, jnp.where(is_left, left_step, -up_step)
        )
        # Row 0 is always a single left step (reference_align.cpp:122-123).
        dir_enc = jnp.where(row0, 1, dir_enc).astype(jnp.int16)
        dirs_ref[pl.ds(j, 1)] = dir_enc[None]

        s_ref[:] = Sn
        h_ref[:] = Hn
        wl_ref[:] = jnp.where(row0, 1, is_left.astype(jnp.int32))

    if local and rlen >= 1:
        def column(j, _):
            column_body(j, False)
            return 0

        jax.lax.fori_loop(0, rlen - 1, column, 0)
        column_body(rlen - 1, True)
    else:
        def column(j, _):
            column_body(j, False)
            return 0

        jax.lax.fori_loop(0, rlen, column, 0)
    out_ref[:] = s_ref[:]


def dirs_pallas_ok(rlen: int, L: int, vmem_budget: int = 12 << 20) -> bool:
    """Whether the direction kernel's per-tile VMEM footprint fits.

    Pallas double-buffers every in/out block (dirs out [R, l1, 128] int16,
    cost-plane/codes in blocks, scores out); only scratch is single: count
    the doubles so shapes near the limit fall back to dp_align instead of
    failing Mosaic compilation at ~2x the naive estimate.
    """
    l1 = _dir_l1(L)
    per_tile = 2 * (
        rlen * l1 * LANES * 2  # dirs out block
        + l1 * LANES * 4  # scores out block
        + 2 * 4 * l1 * LANES * 4  # cost-plane in blocks
        + l1 * LANES * 4  # codes in block
    ) + 4 * l1 * LANES * 4  # S/H/wl/ljp scratch (single-buffered)
    return per_tile <= vmem_budget


def _dir_l1(L: int) -> int:
    """Sublane-aligned DP height for the int16 dirs block ((16, 128) native
    int16 tiling -> keep l1 a multiple of 32 for clean packing)."""
    return ((L + 1 + 31) // 32) * 32


@functools.partial(
    jax.jit, static_argnames=("rlen", "l1", "n_pad", "local", "interpret")
)
def _launch_dirs(modes, mask, scalars, costm, costmm, codes_k, lengths,
                 rlen: int, l1: int, n_pad: int, local: bool, interpret: bool):
    grid = (n_pad // LANES,)
    kern = functools.partial(_dir_kernel, rlen=rlen, l1=l1, local=local)
    scores, dirs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # modes [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2]
            pl.BlockSpec((4, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((l1, LANES), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rlen, l1, LANES), lambda t: (0, 0, t), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((l1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((rlen, l1, n_pad), jnp.int16),
        ),
        scratch_shapes=[
            pltpu.VMEM((l1, LANES), jnp.float32),
            pltpu.VMEM((l1, LANES), jnp.float32),
            pltpu.VMEM((l1, LANES), jnp.int32),
            pltpu.VMEM((l1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(modes, mask, scalars, costm, costmm, codes_k)
    n = lengths.shape[0]
    final = jnp.take_along_axis(
        scores[:, :n], lengths.astype(jnp.int32)[None, :], axis=0
    )[0]
    return final, dirs


def fit_dirs_pallas(
    codes,  # [N, L] int8/int32 (device ok)
    qidx,  # [N, L] int8/int32
    lengths,  # [N] int32
    modes,  # [R] int32 host
    matched,  # [R, 5] bool host
    match_tab,
    mismatch_tab,
    gap_opening: float,
    gap_extension: float,
    local: bool = True,
    interpret: bool | None = None,
):
    """Scores + run-length direction planes via the Pallas kernel.

    Returns (scores [N] f32 device, dirs [R, l1, n_pad] int16 device, l1).
    The dirs layout is the kernel-native plane layout (read positions on
    sublanes, reads on lanes); the device walks in :mod:`.backtrack` accept
    it via ``plane_layout=True``.
    """
    if interpret is None:
        interpret = not pallas_available()
    N, L = codes.shape
    l1 = _dir_l1(L)
    _, n_pad = plane_dims(N, L)
    planes = build_cost_planes(
        jnp.asarray(codes, jnp.int8),
        jnp.asarray(qidx, jnp.int8),
        jnp.asarray(match_tab, jnp.float32),
        jnp.asarray(mismatch_tab, jnp.float32),
        l1=l1,
        n_pad=n_pad,
    )
    costm, costmm, codes_k = planes
    R = int(np.asarray(modes).shape[0])
    scalars = jnp.asarray([float(gap_opening), float(gap_extension)], jnp.float32)
    scores, dirs = _launch_dirs(
        jnp.asarray(np.asarray(modes, np.int32)),
        jnp.asarray(_encode_mask(np.asarray(matched))),
        scalars,
        costm,
        costmm,
        codes_k,
        jnp.asarray(lengths, jnp.int32),
        rlen=R,
        l1=l1,
        n_pad=n_pad,
        local=local,
        interpret=bool(interpret),
    )
    return scores, dirs, l1


def _encode_mask(matched: np.ndarray) -> np.ndarray:
    """matched [R, 5] bool -> [R] int32 bitmask (bit b = base b matches)."""
    r = matched.shape[0]
    out = np.zeros(max(r, 1), dtype=np.int32)
    if r:
        out[:r] = (matched.astype(np.int32) << np.arange(5)[None, :]).sum(axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("l1", "n_pad"))
def build_cost_planes(codes_in, qidx, match_tab, mismatch_tab, l1: int, n_pad: int):
    """[4, l1, n_pad] match/mismatch cost planes + kernel-layout codes.

    Runs once per uploaded batch: the planes depend only on the reads and
    the quality encoding, so every adaptor/barcode/penalty launch against
    this batch reuses them (v5e: ~140 ms to build vs ~22 ms per kernel).
    """
    N, L = codes_in.shape
    qidx_k = jnp.zeros((l1, n_pad), jnp.int32)
    qidx_k = qidx_k.at[1 : L + 1, :N].set(qidx.astype(jnp.int32).T)
    codes_k = jnp.full((l1, n_pad), 5, jnp.int32)
    codes_k = codes_k.at[0].set(0)
    codes_k = codes_k.at[1 : L + 1, :N].set(codes_in.astype(jnp.int32).T)
    costm = jnp.take(match_tab.astype(jnp.float32), qidx_k, axis=1)
    costmm = jnp.take(mismatch_tab.astype(jnp.float32), qidx_k, axis=1)
    return costm, costmm, codes_k


@functools.partial(
    jax.jit,
    static_argnames=("rlen", "l1", "n_pad", "local", "interpret", "lb", "unroll"),
)
def _launch_planes(modes, mask, scalars, costm, costmm, codes_k, lengths,
                   rlen: int, l1: int, n_pad: int, local: bool, interpret: bool,
                   lb: int = 0, unroll: int = 0):
    lb = lb or _score_lb()
    unroll = unroll or _score_unroll()
    while n_pad % lb:
        lb //= 2
    grid = (n_pad // lb,)
    kern = functools.partial(
        _kernel, rlen=rlen, l1=l1, local=local, lanes=lb, unroll=unroll
    )
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # modes [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask [R]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2]
            pl.BlockSpec((4, l1, lb), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, l1, lb), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, lb), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((l1, lb), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l1, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l1, lb), jnp.float32),
            pltpu.VMEM((l1, lb), jnp.float32),
        ],
        interpret=interpret,
    )(modes, mask, scalars, costm, costmm, codes_k)
    # Row `lengths[i]` of column rlen holds read i's score; gather on device
    # so only [n_pad] floats ever travel.
    n = lengths.shape[0]
    return jnp.take_along_axis(
        out[:, :n], lengths.astype(jnp.int32)[None, :], axis=0
    )[0]


def fit_scores_from_planes(
    planes,  # (costm, costmm, codes_k) from build_cost_planes
    lengths,  # [N] int32 (device ok)
    modes,  # [R] int32 host
    matched,  # [R, 5] bool host
    gap_opening: float,
    gap_extension: float,
    l1: int,
    n_pad: int,
    local: bool = True,
    interpret: bool | None = None,
):
    """Scores [n_lengths] (device array) from prebuilt cost planes."""
    if interpret is None:
        interpret = not pallas_available()
    costm, costmm, codes_k = planes
    R = int(np.asarray(modes).shape[0])
    scalars = jnp.asarray([float(gap_opening), float(gap_extension)], jnp.float32)
    if R == 0:
        l = np.asarray(lengths)
        if local:
            return jnp.zeros(l.shape[0], jnp.float32)
        return jnp.asarray(
            np.where(l == 0, 0.0, -(gap_opening + gap_extension) - gap_extension * (l - 1)),
            jnp.float32,
        )
    return _launch_planes(
        jnp.asarray(np.asarray(modes, np.int32)),
        jnp.asarray(_encode_mask(np.asarray(matched))),
        scalars,
        costm,
        costmm,
        codes_k,
        lengths,
        rlen=R,
        l1=l1,
        n_pad=n_pad,
        local=local,
        interpret=bool(interpret),
        lb=_score_lb(),
    )


def _segments_kernel(
    modes_ref, mask_ref, scal_ref, costm_ref, costmm_ref, codes_ref,
    lens_ref, out_ref, s_ref, h_ref, *, segs, l1, lanes=LANES, unroll=4,
):
    """Multi-segment variant of :func:`_kernel`: one launch scores the SAME
    read batch against MANY reference segments (adaptors, barcodes, or one
    adaptor under many penalty pairs), re-initializing the DP state between
    segments and extracting each segment's final scores on device.

    ``segs`` is a static tuple of ``(start, rlen, local)``: segment s spans
    columns ``start .. start+rlen`` of the concatenated ``modes``/``mask``
    arrays and reads its (open, extend) from ``scal_ref[2s:2s+2]``.  Output
    row s holds ``S[lengths[i], i]`` after the segment's last column — the
    same gather :func:`_launch_planes` does on the host side of the launch.

    Why: each launch through the remote-TPU tunnel costs ~1-7 ms dispatch
    plus a readback round trip, so demux (2 adaptors x 2 orientations + B
    barcodes, R/barcodeAlign.R:27-38) and the tuning grid (35 penalty
    pairs, R/tuneAlignment.R:54-72) were launch-bound at ~64x their kernel
    time (VERDICT r4 #6); batching segments into one launch amortizes it.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (l1, lanes), 0)
    rows_f = rows.astype(jnp.float32)
    masks = {}
    sh = 1
    while sh < l1:
        masks[sh] = rows < sh
        sh *= 2
    row0 = masks[1]
    lens_plane = jnp.broadcast_to(lens_ref[0][None, :], (l1, lanes))
    at_len = rows == lens_plane

    def shift1(x, sh):
        rolled = pltpu.roll(x, sh, axis=0)
        return jnp.where(masks[sh], NEG, rolled)

    codes = codes_ref[:]

    for s, (start, rlen, local) in enumerate(segs):
        go = scal_ref[2 * s] + scal_ref[2 * s + 1]  # open stored as open+ext
        ge = scal_ref[2 * s + 1]
        rge = rows_f * ge
        rge1 = (rows_f - 1.0) * ge

        # Column 0 (reference_align.cpp:65-74).
        if local:
            s_ref[:] = jnp.zeros((l1, lanes), jnp.float32)
        else:
            s_ref[:] = jnp.where(row0, 0.0, -go - rge1)
        h_ref[:] = jnp.full((l1, lanes), NEG, jnp.float32)

        def column_body(j, zero_vgap):
            S = s_ref[:]
            H = h_ref[:]
            mode = modes_ref[j]
            cm = costm_ref[mode - 1]
            cmm = costmm_ref[mode - 1]
            sel = jax.lax.shift_right_logical(
                jnp.broadcast_to(mask_ref[j], codes.shape), codes
            ) & 1
            cost = jnp.where(sel == 1, cm, cmm)

            Hn = jnp.maximum(S - go, H - ge)
            M = shift1(S, 1) + cost
            mv = jnp.maximum(M, Hn)
            if zero_vgap:
                cum = mv
            else:
                cum = (mv - go) + rge  # scan-order association (see _kernel)
            sh = 1
            while sh < l1:
                cum = jnp.maximum(cum, shift1(cum, sh))
                sh *= 2
            V = shift1(cum, 1)
            if not zero_vgap:
                V = V - rge1
            s_ref[:] = jnp.maximum(mv, V)
            h_ref[:] = Hn

        full = rlen - 1 if (local and rlen >= 1) else rlen

        def columns(p, _):
            for u in range(unroll):
                column_body(start + unroll * p + u, False)
            return 0

        jax.lax.fori_loop(0, full // unroll, columns, 0)
        for j in range((full // unroll) * unroll, full):
            column_body(start + j, False)
        if local and rlen >= 1:
            column_body(start + rlen - 1, True)
        out_ref[pl.ds(s, 1)] = jnp.max(
            jnp.where(at_len, s_ref[:], NEG), axis=0
        )[None]


@functools.partial(
    jax.jit, static_argnames=("segs", "l1", "n_pad", "interpret", "lb", "unroll")
)
def _launch_segments(modes, mask, scalars, costm, costmm, codes_k, lens_k,
                     segs, l1: int, n_pad: int, interpret: bool,
                     lb: int = 0, unroll: int = 0):
    lb = lb or _score_lb()
    unroll = unroll or _score_unroll()
    while n_pad % lb:
        lb //= 2
    nseg = len(segs)
    grid = (n_pad // lb,)
    kern = functools.partial(
        _segments_kernel, segs=segs, l1=l1, lanes=lb, unroll=unroll
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # modes [Rtot]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask [Rtot]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2*nseg]
            pl.BlockSpec((4, l1, lb), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, l1, lb), lambda t: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((l1, lb), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lb), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nseg, lb), lambda t: (0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nseg, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l1, lb), jnp.float32),
            pltpu.VMEM((l1, lb), jnp.float32),
        ],
        interpret=interpret,
    )(modes, mask, scalars, costm, costmm, codes_k, lens_k)


def fit_scores_segments(
    planes,  # (costm, costmm, codes_k) from build_cost_planes
    lengths,  # [N] int32 (device ok)
    segments,  # list of (modes [R], matched [R, 5], open, extend, local)
    l1: int,
    n_pad: int,
    interpret: bool | None = None,
):
    """Scores [nseg, n_lengths] (device) — one launch for all segments.

    Each segment is an independent (reference, penalties, mode) scoring of
    the same prepared batch; results are bit-identical to per-segment
    :func:`fit_scores_from_planes` launches.
    """
    if interpret is None:
        interpret = not pallas_available()
    costm, costmm, codes_k = planes
    modes_parts, mask_parts, scal = [], [], []
    segs = []
    at = 0
    for (modes, matched, go, ge, local) in segments:
        m = np.asarray(modes, np.int32)
        modes_parts.append(m)
        mask_parts.append(_encode_mask(np.asarray(matched)[: m.shape[0]]))
        scal.extend([float(go), float(ge)])
        segs.append((at, int(m.shape[0]), bool(local)))
        at += int(m.shape[0])
    n = int(np.asarray(lengths).shape[0])
    lens_k = jnp.zeros((1, n_pad), jnp.int32)
    lens_k = lens_k.at[0, :n].set(jnp.asarray(lengths, jnp.int32))
    out = _launch_segments(
        jnp.asarray(np.concatenate(modes_parts) if modes_parts else np.zeros(1, np.int32)),
        jnp.asarray(np.concatenate(mask_parts) if mask_parts else np.zeros(1, np.int32)),
        jnp.asarray(np.asarray(scal, np.float32)),
        costm,
        costmm,
        codes_k,
        lens_k,
        segs=tuple(segs),
        l1=l1,
        n_pad=n_pad,
        interpret=bool(interpret),
        lb=_score_lb(),
    )
    return out[:, :n]


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
    host (every host round-trip crosses the slow tunnel twice).  Callers
    issuing several launches against one batch should instead build planes
    once (:func:`build_cost_planes`) and use :func:`fit_scores_from_planes`.
    """
    N, L = codes.shape
    l1, n_pad = plane_dims(N, L)
    planes = build_cost_planes(
        jnp.asarray(codes, jnp.int8),
        jnp.asarray(qidx, jnp.int8),
        jnp.asarray(match_tab, jnp.float32),
        jnp.asarray(mismatch_tab, jnp.float32),
        l1=l1,
        n_pad=n_pad,
    )
    return fit_scores_from_planes(
        planes, jnp.asarray(lengths, jnp.int32), modes, matched,
        gap_opening, gap_extension, l1=l1, n_pad=n_pad, local=local,
        interpret=interpret,
    )

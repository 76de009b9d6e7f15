"""Pallas TPU kernel for banded pairwise global alignment (MSA library).

Same banded DP as :func:`..ops.msa._banded_pair_kernel` but VMEM-resident:
pairs ride the lane axis (128 per tile), band offsets the sublane axis, and
the row loop runs across grid steps with state in scratch (scratch persists
across the row dimension of the grid; direction planes stream straight to
HBM one row at a time, never touching the tunnel).

The key layout trick: sequence B is pre-shifted on the host so that row i
needs the window ``b_shift[i-1 : i-1+W]`` for *every* pair — one dynamic
sublane slice, no per-lane gathers:

    b_shift[t, p] = codes_b[p, t + lo_p]   (pad code 5 outside)

Scores and per-cell Gotoh direction bits match the XLA kernel bit-for-bit
(same recurrences, same tie rules), so the same on-device walk consumes the
output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["banded_pair_pallas", "msa_pallas_available", "pallas_pair_fits"]

NEG = -1.0e9
LANES = 128


def msa_pallas_available() -> bool:
    return jax.devices()[0].platform == "tpu"


def _shift_up(x, fill):
    """Row k takes row k+1's value; the last row becomes fill."""
    rolled = pltpu.roll(x, x.shape[0] - 1, axis=0)  # circular shift by -1
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows == x.shape[0] - 1, fill, rolled)


def _shift_down(x, sh, fill):
    rolled = pltpu.roll(x, sh, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < sh, fill, rolled)


#: Target bytes for everything the kernel keeps resident in VMEM.  The
#: hardware scoped-vmem limit is 16 MB/core; 12 MB leaves headroom for
#: Mosaic's own temporaries (r3's fixed ROW_CHUNK=64 hit 17.5 MB at the
#: W=1024 bucket and crashed the driver bench — BENCH_r03 rc=1).
VMEM_BUDGET = 12 << 20
VMEM_LIMIT = 16 << 20


def _vmem_bytes(rows: int, width: int, ch: int) -> int:
    """Static VMEM footprint of one ``_launch`` at the given row chunk.

    Pallas double-buffers every in/out block (revolving buffers for the
    HBM<->VMEM pipeline); scratch is single-buffered.  (1, LANES) blocks
    pad to one (8, 128) int32 tile each.
    """
    dbl = 2 * (
        ch * width * LANES          # dirs out block, int8
        + 8 * LANES * 4             # score out (1, LANES) f32, tile-padded
        + 4 * 8 * LANES * 4         # four (1, LANES) i32 in blocks, padded
        + ch * LANES * 4            # a-plane chunk block, i32
        + (rows + width) * LANES * 4  # pre-shifted B window, i32
    )
    scratch = 3 * width * LANES * 4  # S/H/V planes, f32
    return dbl + scratch


def _row_chunk_for(rows: int, width: int) -> int | None:
    """Largest power-of-two rows-per-grid-step that fits VMEM_BUDGET.

    One row per step made the kernel grid-overhead-bound (~23 us/step ->
    1.4 GCUPS measured); big chunks of inner fori_loop amortize it.  The
    chunk must scale *down* with band width — the (CH, W, 128) int8 dirs
    out block double-buffers to 2*CH*W*128 bytes.  Returns None when even
    the minimum chunk cannot fit (caller falls back to the XLA kernel).
    """
    ch = min(rows, 256)
    while ch >= 8 and _vmem_bytes(rows, width, ch) > VMEM_BUDGET:
        ch //= 2
    return ch if ch >= 8 else None


def pallas_pair_fits(rows: int, width: int) -> bool:
    """True when the (rows, width) bucket compiles within the VMEM limit."""
    return _row_chunk_for(rows, width) is not None


def _kernel(
    scal_ref,  # SMEM [4]: match, mismatch, gap_open, gap_ext
    lens_a_ref,  # VMEM (1, LANES) int32
    lens_b_ref,
    lo_ref,
    kmax_ref,
    a_ref,  # VMEM (rows, LANES) int8-as-int32 codes of A (row i-1 -> pos i)
    bwin_ref,  # VMEM (rows + W, LANES) int32 pre-shifted B codes
    dirs_ref,  # out block (CH, W, LANES) int8 for this row chunk
    score_ref,  # out block (1, LANES) f32 — final row's S at kfin
    s_ref,
    h_ref,
    v_ref,
    *,
    rows: int,
    width: int,
    row_chunk: int,
):
    W = width
    c = pl.program_id(1)  # row chunk
    base = c * row_chunk
    mt = scal_ref[0]
    mm = scal_ref[1]
    go = scal_ref[2]
    ge = scal_ref[3]

    karr = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    karr_f = karr.astype(jnp.float32)
    lens_b = lens_b_ref[0][None, :]  # (1, LANES)
    lens_a = lens_a_ref[0][None, :]
    lo = lo_ref[0][None, :]
    in_band = karr <= kmax_ref[0][None, :]

    @pl.when(c == 0)
    def _():
        j0 = lo + karr
        jj = j0.astype(jnp.float32)
        s0 = jnp.where(
            j0 == 0,
            0.0,
            jnp.where(
                jnp.logical_and(jnp.logical_and(j0 >= 1, j0 <= lens_b), in_band),
                -(go + (jj - 1.0) * ge),
                NEG,
            ),
        )
        s_ref[:] = s0
        h_ref[:] = jnp.where(s0 > NEG / 2, jnp.where(j0 >= 1, s0, NEG), NEG)
        v_ref[:] = jnp.full((W, LANES), NEG, jnp.float32)

    def row_body(u, _):
        i = base + u + 1  # DP row, 1-based
        S = s_ref[:]
        H = h_ref[:]
        V = v_ref[:]

        j = i + lo + karr
        valid = jnp.logical_and(jnp.logical_and(j >= 0, j <= lens_b), in_band)
        alive = i <= lens_a

        a_i = a_ref[pl.ds(u, 1)]  # (1, LANES) — a-plane block is per-chunk
        bw = bwin_ref[pl.ds(base + u, W), :]  # (W, LANES)
        sub = jnp.where(a_i == bw, mt, mm)
        sub = jnp.where(jnp.logical_and(j >= 1, j <= lens_b), sub, NEG)

        M = S + sub
        S_up = _shift_up(S, NEG)
        V_up = _shift_up(V, NEG)
        Vn = jnp.maximum(S_up - go, V_up - ge)
        v_ext = V_up - ge >= S_up - go

        mv = jnp.maximum(M, Vn)
        B = (mv - go) + karr_f * ge
        cum = B
        sh = 1
        while sh < W:
            cum = jnp.maximum(cum, _shift_down(cum, sh, NEG))
            sh *= 2
        Hn = _shift_down(cum, 1, NEG) - (karr_f - 1.0) * ge
        Hn = jnp.where(karr == 0, NEG, Hn)
        Hn = jnp.where(valid, Hn, NEG)

        M = jnp.where(valid, M, NEG)
        Vn = jnp.where(valid, Vn, NEG)
        Sn = jnp.maximum(M, jnp.maximum(Hn, Vn))

        # Mosaic vector arithmetic wants i32; cast to int8 at the store.
        choice = jnp.where(M >= Sn, 0, jnp.where(Hn >= Sn, 1, 2)).astype(
            jnp.int32
        )
        mv_prev = _shift_down(mv, 1, NEG)
        h_prev = _shift_down(Hn, 1, NEG)
        h_ext = h_prev - ge >= mv_prev - go
        dirs = (
            choice
            + (h_ext.astype(jnp.int32) << 2)
            + (v_ext.astype(jnp.int32) << 3)
        )
        dirs_ref[pl.ds(u, 1)] = dirs.astype(jnp.int8)[None]

        s_ref[:] = jnp.where(alive, Sn, S)
        h_ref[:] = jnp.where(alive, Hn, H)
        v_ref[:] = jnp.where(alive, Vn, V)
        return 0

    jax.lax.fori_loop(0, row_chunk, row_body, 0)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        kfin = lens_b_ref[0] - lens_a_ref[0] - lo_ref[0]  # (LANES,)
        sel = karr == kfin[None, :]
        score_ref[0] = jnp.max(jnp.where(sel, s_ref[:], NEG), axis=0)


@functools.partial(jax.jit, static_argnames=("rows", "width", "interpret"))
def _launch(scal, lens_a, lens_b, lo, kmax, codes_a, codes_b, rows, width, interpret):
    # Plane construction on device: the int8 code matrices are the only
    # host->device transfer.
    Pp = codes_a.shape[0]
    a_plane = jnp.full((rows, Pp), 5, jnp.int32)
    la = codes_a.shape[1]
    take = min(rows, la)
    a_plane = a_plane.at[:take, :].set(codes_a.astype(jnp.int32).T[:take])

    # b_shift[t, p] = codes_b[p, t + lo_p] (6 = never-matching pad outside).
    t_idx = jnp.arange(rows + width, dtype=jnp.int32)
    src = t_idx[:, None] + lo[0][None, :].astype(jnp.int32)
    okm = jnp.logical_and(src >= 0, src < codes_b.shape[1])
    gathered = jnp.take_along_axis(
        codes_b.astype(jnp.int32).T,
        jnp.clip(src, 0, codes_b.shape[1] - 1),
        axis=0,
    )
    b_shift = jnp.where(okm, gathered, 6).astype(jnp.int32)

    n = a_plane.shape[1]
    ch = _row_chunk_for(rows, width)
    if ch is None:  # pragma: no cover — callers gate on pallas_pair_fits
        raise ValueError(
            f"banded pair bucket (rows={rows}, W={width}) exceeds VMEM "
            f"budget at the minimum row chunk"
        )
    grid = (n // LANES, rows // ch)
    kern = functools.partial(_kernel, rows=rows, width=width, row_chunk=ch)
    dirs, scores = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LANES), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda t, c: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, LANES), lambda t, c: (c, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows + width, LANES), lambda t, c: (0, t), memory_space=pltpu.VMEM
            ),
        ],  # noqa: E501 — a_plane/b_shift built on device above
        out_specs=(
            pl.BlockSpec(
                (ch, width, LANES),
                lambda t, c: (c, 0, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, LANES), lambda t, c: (0, t), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, width, n), jnp.int8),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((width, LANES), jnp.float32),
            pltpu.VMEM((width, LANES), jnp.float32),
            pltpu.VMEM((width, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(scal, lens_a, lens_b, lo, kmax, a_plane, b_shift)
    return dirs, scores[0]


def banded_pair_pallas(
    codes_a_p: np.ndarray,  # [Pp, LA] int (pad 5), Pp multiple of 128
    codes_b_p: np.ndarray,
    lens_a_p: np.ndarray,
    lens_b_p: np.ndarray,
    lo_p: np.ndarray,
    kmax_p: np.ndarray,
    match: float,
    mismatch: float,
    gap_open: float,
    gap_ext: float,
    rows: int,
    width: int,
    interpret: bool | None = None,
):
    """Returns (scores [Pp] f32, dirs [rows, W, Pp] int8, both device).

    The dirs planes stay in the kernel's native [rows, W, P] layout — the
    walk consumes it directly (``_pair_walk_kernel(wp_layout=True)``);
    transposing to [rows, P, W] costs a full relayout of a ~GiB tensor.
    """
    if interpret is None:
        interpret = not msa_pallas_available()

    scal = jnp.asarray(
        [float(match), float(mismatch), float(gap_open), float(gap_ext)], jnp.float32
    )
    dirs, scores = _launch(
        scal,
        jnp.asarray(lens_a_p[None, :], jnp.int32),
        jnp.asarray(lens_b_p[None, :], jnp.int32),
        jnp.asarray(lo_p[None, :], jnp.int32),
        jnp.asarray(kmax_p[None, :], jnp.int32),
        jnp.asarray(codes_a_p, jnp.int8),
        jnp.asarray(codes_b_p, jnp.int8),
        rows=rows,
        width=width,
        interpret=bool(interpret),
    )
    return scores, dirs

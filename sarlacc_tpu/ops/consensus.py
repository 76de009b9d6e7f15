"""Batched consensus calling on device.

TPU re-design of ``src/create_consensus.cpp``: instead of one MSA at a time
through scalar loops, *batches of padded MSAs* are tallied together — the
per-column/per-base reductions over group members are dense one-hot sums the
VPU eats, and everything downstream (argmax, the incremental-logsumexp error)
is elementwise over the ``(group, column)`` plane.

Both modes reproduce the reference's arithmetic exactly (file:line cites into
/root/reference):

* **basic** (create_consensus.cpp:61-135): A/C/G/T counts with a separate
  incidence count ('-' absent, 'N' present-but-uncounted); consensus = first
  max count; err = log1p(-(max + pseudo/4) / (total + pseudo)).
* **quality** (create_consensus.cpp:178-272): per-base log-prob sums with
  right = log1p(-eps), wrong = log(eps/3), eps clamped to
  [1e-8, 0.99999999]; consensus = first argmax; error computed by sorting
  the four sums ascending and accumulating R-style ``log1pexp`` increments
  in the same order as the C++ (:250-268).

Column filtering (incidences >= naligns * min_cov) happens on device; the
ragged assembly of consensus strings happens on the host.

Inputs are padded: ``codes[B, G, W]`` int8 (A=0..T=3, N=4, '-'/pad=5) with
``naligns[B]`` true group sizes — padded member rows are all-gap so they
contribute nothing — and for quality mode ``eps[B, G, W]`` error
probabilities aligned to *gapped* columns (host expands the per-read
de-gapped qualities; positions at N or '-' are ignored).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["consensus_basic_dev", "consensus_quality_dev", "log1pexp_dev"]


def log1pexp_dev(x):
    """R's log1pexp piecewise evaluation (create_consensus.cpp:8-12 via Rmath)."""
    return jnp.where(
        x <= -37.0,
        jnp.exp(x),
        jnp.where(
            x <= 18.0,
            jnp.log1p(jnp.exp(jnp.minimum(x, 18.0))),
            jnp.where(x <= 33.3, x + jnp.exp(-jnp.maximum(x, 18.0)), x),
        ),
    )


@jax.jit
def consensus_basic_dev(codes, naligns, min_cov, pseudo_count):
    """codes [B,G,W] int8 -> (keep [B,W] bool, best [B,W] int8, err [B,W] f).

    ``err`` is the natural-log error probability for kept columns.
    """
    dtype = jnp.result_type(pseudo_count, jnp.float32)
    onehot = (codes[..., None] == jnp.arange(4, dtype=codes.dtype)).astype(dtype)
    counts = onehot.sum(axis=1)  # [B, W, 4]
    incidences = (codes != 5).sum(axis=1)  # [B, W] ('-' and padding excluded)

    keep = incidences.astype(dtype) >= naligns[:, None].astype(dtype) * min_cov
    best = jnp.argmax(counts, axis=-1).astype(jnp.int8)  # first max
    maxed = jnp.max(counts, axis=-1)
    total = counts.sum(axis=-1)
    pseudo_num = pseudo_count / 4.0
    err = jnp.log1p(-(maxed + pseudo_num) / (total + pseudo_count))
    return keep, best, err


MAX_ERROR = 0.99999999
MIN_ERROR = 0.00000001


@jax.jit
def consensus_quality_dev(codes, eps, naligns, min_cov):
    """codes [B,G,W] int8, eps [B,G,W] float -> (keep, best, err) as above."""
    dtype = eps.dtype
    is_base = codes < 4  # A/C/G/T add right to their own base
    # Unknown characters (host encodes them as 6) score `wrong` against every
    # base — the quality mode never rejects them (create_consensus.cpp:229-232).
    scoring = jnp.logical_or(is_base, codes == 6)
    present = codes != 5  # N also counts toward incidence

    e = jnp.clip(eps, MIN_ERROR, MAX_ERROR)
    right = jnp.log1p(-e)
    wrong = jnp.log(e / 3.0)

    wrong_sum = jnp.sum(jnp.where(scoring, wrong, 0.0), axis=1)  # [B, W]
    onehot = (codes[..., None] == jnp.arange(4, dtype=codes.dtype)).astype(dtype)
    delta = jnp.sum(onehot * jnp.where(is_base, right - wrong, 0.0)[..., None], axis=1)
    scores = wrong_sum[..., None] + delta  # [B, W, 4]

    incidences = present.sum(axis=1)
    keep = incidences.astype(dtype) >= naligns[:, None].astype(dtype) * min_cov
    best = jnp.argmax(scores, axis=-1).astype(jnp.int8)  # first max

    # Incremental logsumexp in ascending order (create_consensus.cpp:250-268).
    v = jnp.sort(scores, axis=-1)  # ascending
    d = v[..., 0]
    d = d + log1pexp_dev(v[..., 1] - d)
    err_num = d + log1pexp_dev(v[..., 2] - d)  # after k == 2
    d_all = err_num + log1pexp_dev(v[..., 3] - err_num)
    err = err_num - d_all
    return keep, best, err

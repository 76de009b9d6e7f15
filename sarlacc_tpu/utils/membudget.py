"""Device-derived memory budgets for the MSA pipeline.

The round-3 constants (2 GiB library table, 1 GiB segment window, 3 GiB
pair-DP in-flight window) were tuned to a 16 GB v5e chip; a different chip
or a concurrent allocation would shift the OOM boundary silently.  Budgets
now derive from ``jax.devices()[0].memory_stats()`` at first use, with the
original constants as the fallback when the backend exposes no stats (CPU
tests, interpret mode).

Probed once per process: the pipeline's own allocations must not shrink
later budgets mid-run (the windows are sized against the chip, not against
instantaneous free bytes).
"""

from __future__ import annotations

__all__ = ["device_memory_budget", "budget_report"]

_FREE_BYTES: int | None = None
_PROBED = False
_GIVEN: dict[str, int] = {}

#: Fixed HBM reserve subtracted from the chip's capacity: headroom for XLA
#: scratch, the runtime's own buffers, and fragmentation.  A constant (not
#: instantaneous ``bytes_in_use``) keeps every budget a pure function of the
#: chip, so launch shapes / compile-cache keys don't depend on which pipeline
#: stage probes first (ADVICE r4).
_RESERVE_BYTES = 2 << 30


def _probe() -> int | None:
    global _FREE_BYTES, _PROBED
    if _PROBED:
        return _FREE_BYTES
    _PROBED = True
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            _FREE_BYTES = max(int(limit) - _RESERVE_BYTES, 0)
    except Exception:
        _FREE_BYTES = None
    return _FREE_BYTES


def device_memory_budget(name: str, fraction: float, fallback: int) -> int:
    """``fraction`` of the device's free HBM at first probe, else ``fallback``.

    Floors at 64 MiB so a nearly-full chip degrades to small windows rather
    than zero-size ones.  Each derived budget is recorded for
    :func:`budget_report` (profiling output).
    """
    free = _probe()
    if free is None:
        out = fallback
    else:
        out = max(int(free * fraction), 64 << 20)
    _GIVEN[name] = out
    return out


def budget_report() -> str:
    free = _probe()
    src = f"{free / 2**30:.2f} GiB free (memory_stats)" if free else "fallback constants"
    parts = ", ".join(f"{k}={v / 2**30:.2f} GiB" for k, v in sorted(_GIVEN.items()))
    return f"memory budgets [{src}]: {parts or 'none requested yet'}"

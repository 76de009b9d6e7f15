"""Retry wrapper for transient remote-compile failures.

The axon remote-TPU tunnel's compile helper intermittently fails with
``INTERNAL: .../remote_compile: HTTP 500`` or ``response body closed
before all bytes were read`` (observed twice at the r5 vignette-scale
runs, each killing an hour-long pipeline at one unlucky jit call).  Jit
compilation is synchronous at call time and the wrapped calls are pure,
so retrying the same call is safe; only errors that name the remote
compile channel are retried — anything else re-raises immediately.
"""

from __future__ import annotations

import time

__all__ = ["retry_transient"]

_MARKERS = ("remote_compile", "response body closed", "DEADLINE_EXCEEDED")


def retry_transient(fn, *args, _attempts: int = 4, **kwargs):
    for k in range(_attempts):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered below
            msg = str(e)
            if k == _attempts - 1 or not any(m in msg for m in _MARKERS):
                raise
            import sys

            print(
                f"[retry] transient compile failure (attempt {k + 1}): "
                f"{msg[:120]}",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(10.0 * (k + 1))

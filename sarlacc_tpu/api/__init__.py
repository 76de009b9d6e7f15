"""Pipeline API — the operations a sarlacc user expects, TPU-native.

Populated incrementally; see individual modules.
"""

__all__: list[str] = []

"""Shared run clock + stderr progress log for bench.py and benchlib.

_T0 is the RUN start (bench.main resets it per run — library-safe for
in-process smoke tests); every [t+ ...s] line across modules shares it.
"""

import sys
import time

_T0 = time.perf_counter()


def set_t0(t=None):
    global _T0
    _T0 = time.perf_counter() if t is None else t


def elapsed() -> float:
    return time.perf_counter() - _T0


def log(msg: str) -> None:
    print(f"[t+{elapsed():8.1f}s] {msg}", file=sys.stderr, flush=True)

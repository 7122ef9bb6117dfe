"""Content-addressed raw-.npy disk cache for derived bank tensors.

One cache entry = ``{base}_{field}.npy`` per tensor plus a ``{base}.ok``
manifest (written LAST) naming the fields that exist — multi-tensor
entries stay atomic without zip framing. Raw .npy + mmap is deliberate:
``np.savez``'s zipfile layer reads multi-GB entries at ~5 MB/s on a
1-core host (CRC + small-chunk copies; a 2 GB .npz measured ~8 minutes
to load and watchdog-killed two benchmark runs), while
``np.load(mmap_mode='r')`` hands the consumer pages straight from the
file cache.

Shared by ``engine/fmajor.py`` and ``engine/cascade.py`` packed-bank
caches (``engine/bank.py`` keeps its own single-tensor variant for
file-name compatibility with existing spectra caches).
"""
from __future__ import annotations

import hashlib
import os

import numpy as np


def content_key(kind: str, geometry: tuple, *arrays) -> str:
    """sha256 over ``repr((kind,) + geometry)`` + the raw array bytes,
    truncated to 24 hex chars. The flattened-tuple repr keeps keys (and
    therefore on-disk entries) identical to the previous per-site hash
    code."""
    h = hashlib.sha256()
    h.update(repr((kind,) + tuple(geometry)).encode())
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:24]


def load(cache_dir, base: str, fields) -> dict | None:
    """mmap-load an entry's tensors; ``None`` on miss.

    Returns ``{field: array-or-None}`` for every requested field (a field
    the manifest omits was ``None`` at store time). Entries written
    before the manifest existed are accepted when EVERY requested field's
    file is present."""
    root = os.path.join(os.fspath(cache_dir), base)
    names = None
    if os.path.exists(root + ".ok"):
        with open(root + ".ok") as fh:
            names = [ln.strip() for ln in fh if ln.strip()]
    elif all(os.path.exists(f"{root}_{f}.npy") for f in fields):
        names = list(fields)
    if names is None:
        return None
    out = {f: None for f in fields}
    for f in names:
        p = f"{root}_{f}.npy"
        if not os.path.exists(p):          # torn entry: treat as a miss
            return None
        out[f] = np.load(p, mmap_mode="r")
    return out


def store(cache_dir, base: str, arrays: dict) -> None:
    """Write an entry: each tensor via tmp-file + ``os.replace``, then the
    ``.ok`` manifest last (a crash mid-store leaves a miss, never a torn
    hit). ``None``-valued fields are recorded absent."""
    os.makedirs(cache_dir, exist_ok=True)
    root = os.path.join(os.fspath(cache_dir), base)
    # pid-unique tmp names: two processes missing the same key (bench +
    # app sharing a cache dir) must not interleave writes into one tmp
    # file — os.replace then publishes whichever finished last, whole
    pid = os.getpid()
    present = []
    for f, a in arrays.items():
        if a is None:
            continue
        tmp = f"{root}_{f}.tmp{pid}.npy"   # np.save appends .npy otherwise
        np.save(tmp, a)
        os.replace(tmp, f"{root}_{f}.npy")
        present.append(f)
    tmp = f"{root}.ok.tmp{pid}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(present) + "\n")
    os.replace(tmp, root + ".ok")

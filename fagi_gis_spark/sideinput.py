"""Worker-cached numpy side inputs — the fast replacement for Python
broadcasts in Arrow-UDF kernels.

Accessing a ``sparkContext.broadcast`` value from ``mapInPandas`` /
``applyInPandas`` re-ships and re-unpickles the value far more often
than once per worker (measured +15 s wall at sf1.0 for a 29 MB matrix
with an access-only kernel).  Instead: the driver dumps the arrays once
(atomic rename, content+session addressed so stale data can never be
served and no computation is ever skipped across sessions), and every
REUSED python worker loads the file a single time into a module-level
cache (guide §4.5 — heavyweight init once per worker; the module is
importable, so worker reuse preserves the global).

Local-mode file visibility; on a cluster the same pattern reads the
already-stored table (signatures / reference matrix) from shared
storage.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

#: worker-side cache, keyed by file path; bounded to a handful of
#: entries so a long-lived worker cannot accumulate matrices
_CACHE: dict = {}
_CACHE_MAX = 4


def write_arrays(tag: str, **arrays: np.ndarray) -> str:
    """Write named arrays once under /tmp, addressed by session + content.
    Returns the path for :func:`read_arrays`."""
    from pyspark.sql import SparkSession

    app = SparkSession.getActiveSession().sparkContext.applicationId
    h = hashlib.md5()
    h.update(app.encode())
    h.update(tag.encode())
    for name in sorted(arrays):
        h.update(name.encode())
        h.update(np.ascontiguousarray(arrays[name]).tobytes())
    path = f"/tmp/spark_graft_side_{h.hexdigest()[:16]}.npz"
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    return path


def read_arrays(path: str) -> dict:
    """Worker-side load, once per worker process."""
    hit = _CACHE.get(path)
    if hit is not None:
        return hit
    with np.load(path) as z:
        out = {k: z[k] for k in z.files}
    if len(_CACHE) >= _CACHE_MAX:
        _CACHE.clear()
    _CACHE[path] = out
    return out

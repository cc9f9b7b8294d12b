"""Warehouse hygiene for per-session sink/state directories.

Transient sink and streaming-state dirs are suffixed with the Spark
applicationId so concurrent runs (bench alongside a correctness sweep)
never share a write/read-back path.  The cost of that isolation is that
nothing overwrites in place anymore — without a prune, spark-warehouse/
grows without bound across runs.

``prune_stale_siblings`` is the shared best-effort cleaner: before a
session writes ``{prefix}{appId}``, it removes sibling dirs with the same
prefix but a DIFFERENT appId that have been idle for ``max_age_s``.  The
age gate keeps the prune from racing a live concurrent session, whose dir
is a seconds-old transient intermediate (written then read back within a
single key invocation).
"""

from __future__ import annotations

import os
import shutil
import time


def prune_stale_siblings(
    base: str, prefix: str, keep: str, max_age_s: float = 6 * 3600.0
) -> None:
    """Best-effort removal of ``base/{prefix}*`` dirs other than ``keep``
    that have been idle longer than ``max_age_s`` seconds.  Never raises.

    The default age is deliberately LONG (hours, not minutes): a live
    concurrent session may return a lazily-evaluated plan over its sink
    (e.g. a catalog table whose DataFrame the caller reads much later),
    and a short idle window would let this prune delete it mid-read —
    a confusing FileNotFound instead of a stale-dir cleanup.  Six hours
    outlives any single session here while still bounding growth across
    rounds."""
    try:
        now = time.time()
        for d in os.listdir(base):
            if not d.startswith(prefix) or d == keep:
                continue
            p = os.path.join(base, d)
            try:
                if now - os.path.getmtime(p) > max_age_s:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass

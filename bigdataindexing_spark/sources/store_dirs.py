"""Session-scoped materialized-store directories.

Every session-materialized store (dedup signature stores, postings base,
HLL sketches, rollups, clustered / Z-ordered layouts) allocates through
:func:`session_store_dir`: a ``mkdtemp`` whose removal is registered
with ``atexit``, so process exit reclaims every lineitem-sized copy the
session materialized instead of orphaning them in /tmp (round-3 ADVICE).
Distinct sessions deliberately keep distinct directories — a
deterministic shared path would race between concurrent sessions (the
round driver and a probe REPL, or two notebook kernels). Per-session
dedupe is the in-memory ``(applicationId, sf_dir)`` cache each call
site already keeps. On a cluster these would be object-store prefixes
owned by a catalog with TTL policy; atexit is the local-mode analogue.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_CREATED: list[str] = []


def _cleanup() -> None:
    for d in _CREATED:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def session_store_dir(kind: str) -> str:
    """A fresh store directory, removed automatically at process exit."""
    path = tempfile.mkdtemp(prefix=f"bdi_store_{kind}_")
    _CREATED.append(path)
    return path

"""Per-process scratch directories, swept at interpreter exit.

Streaming/versioned-table queries stage source chunks, checkpoints,
and state ledgers on local disk. ``tempfile.mkdtemp`` alone leaks
those across repeated full-catalog sweeps (gigabytes at sf0.1).
``scratch_dir`` parents everything under one per-process root that an
``atexit`` hook removes, so a sweep leaves /tmp as it found it while
any DataFrame returned from a query can still lazily read its state
files for the remainder of the process.

Callers that finish with a directory mid-process (e.g. a stream
source after ``awaitTermination``) should additionally ``rmtree`` it
eagerly; the atexit sweep is the backstop, not the primary cleanup.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_root() -> str:
    """The per-process scratch root (created on first use)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="fx_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str = "") -> str:
    """A fresh directory under the swept scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())

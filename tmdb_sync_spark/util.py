"""Small shared utilities."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp + removal at interpreter exit.

    Used for intra-query materializations (streaming sink/checkpoint
    dirs, signature temp tables): repeated query invocations in a
    long-lived session must not accumulate /tmp state.
    """
    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH]
        )
    _SCRATCH.append(d)
    return d

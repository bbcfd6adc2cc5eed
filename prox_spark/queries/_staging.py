"""Per-process staging scaffold shared by queries that build a work
table / artifact once per (process, sf_dir): a tempdir is created on
first use, registered for interpreter-exit cleanup, and the build
callback's return value is cached. Deliberately NEVER a persistent
path-keyed fixture — a persistent one would serve stale bytes if the
testdata were regenerated, and a half-finished first staging would
wedge every later run; the tempdir dies with the process instead."""

from __future__ import annotations

import atexit
import shutil
import tempfile


def staged(cache: dict, key, prefix: str, build):
    """``cache[key] = build(scratch_dir)`` on first call, cached after.

    ``build`` receives a fresh private tempdir path and returns the
    value to cache (a staged table path, or a (path, metadata) tuple).
    A build that raises leaves the cache unset, so the next call
    retries with a fresh tempdir rather than serving half-staged
    state."""
    if key not in cache:
        scratch = tempfile.mkdtemp(prefix=prefix)
        atexit.register(shutil.rmtree, scratch, ignore_errors=True)
        cache[key] = build(scratch)
    return cache[key]

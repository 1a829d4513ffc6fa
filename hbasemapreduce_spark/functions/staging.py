"""Scratch-space staging with identity + version keys.

Any operator that materializes a derived copy of a source file (the
partitioned-layout staging, the streaming drop-zone) keys the staged
directory on BOTH:

- the source's identity — a hash of its absolute path, so two sources
  that happen to share a basename can never clobber or serve each
  other's copies;
- the source's version — a hash of mtime+size, so a regenerated source
  is re-staged and a stale copy is never silently served.

Superseded versions of the same source are pruned by the CALLER, after
the new version is fully staged, and only past an age grace window —
``fingerprinted_dir`` itself only names the directory.  (Earlier
revisions pruned eagerly inside the naming helper; a concurrent reader
still draining the old staged dir could then have its input deleted
mid-read the moment another session merely *computed* the new path.)
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time

# A superseded version dir must be at least this old (by its own mtime)
# before pruning touches it: long enough for any in-flight reader that
# opened it to finish the micro-batch / job that is draining it.
PRUNE_GRACE_SEC = 600.0


def source_ident(src_file: str) -> str:
    """Stable 8-hex identity of a source path (not its contents)."""
    return hashlib.md5(os.path.abspath(src_file).encode()).hexdigest()[:8]


def _version_fp(src_file: str) -> str:
    st = os.stat(src_file)
    return hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:10]


def fingerprinted_dir(scratch: str, tag: str, src_file: str) -> str:
    """Staging dir for (tag, source identity, source version).  Pure
    naming — no filesystem side effects.  The caller decides what
    "already staged" means (e.g. a _SUCCESS marker or the staged file
    itself) and calls :func:`prune_superseded` once staging completes."""
    prefix = f"{tag}_{source_ident(src_file)}_"
    return os.path.join(scratch, f"{prefix}{_version_fp(src_file)}")


def prune_superseded(
    scratch: str, tag: str, src_file: str, *, grace_sec: float = PRUNE_GRACE_SEC
) -> list[str]:
    """Remove superseded version dirs of (tag, source identity), keeping
    the current version.  Call AFTER the current version is fully staged.

    Only dirs older than ``grace_sec`` (by their own mtime) are removed,
    so a reader that opened the old version moments before the new one
    landed can still finish.  Deletion errors are surfaced per-dir (a
    half-deleted dir is retried on the next prune — version-keyed names
    mean it can never be mistaken for a live staging dir) rather than
    swallowed wholesale.  Returns the list of dirs actually removed."""
    if not os.path.isdir(scratch):
        return []
    prefix = f"{tag}_{source_ident(src_file)}_"
    keep = f"{prefix}{_version_fp(src_file)}"
    removed: list[str] = []
    now = time.time()
    for d in os.listdir(scratch):
        if not d.startswith(prefix) or d == keep:
            continue
        path = os.path.join(scratch, d)
        try:
            if now - os.path.getmtime(path) < grace_sec:
                continue
            shutil.rmtree(path)
            removed.append(path)
        except OSError:
            # Partial deletion or a concurrent prune: leave it for the
            # next prune pass instead of hiding it behind ignore_errors.
            continue
    return removed

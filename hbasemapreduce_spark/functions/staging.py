"""Scratch-space staging with identity + version keys.

Any operator that materializes a derived copy of a source file (the
partitioned-layout staging, the streaming drop-zone) keys the staged
directory on BOTH:

- the source's identity — a hash of its absolute path, so two sources
  that happen to share a basename can never clobber or serve each
  other's copies;
- the source's version — a hash of mtime+size, so a regenerated source
  is re-staged and a stale copy is never silently served.

Superseded versions of the same source are deleted, keeping scratch
space bounded without touching directories other sources' pending
readers may hold open.
"""

from __future__ import annotations

import hashlib
import os
import shutil


def source_ident(src_file: str) -> str:
    """Stable 8-hex identity of a source path (not its contents)."""
    return hashlib.md5(os.path.abspath(src_file).encode()).hexdigest()[:8]


def fingerprinted_dir(scratch: str, tag: str, src_file: str) -> str:
    """Staging dir for (tag, source identity, source version); removes
    superseded versions of the same (tag, identity).  The caller decides
    what "already staged" means (e.g. a _SUCCESS marker or the staged
    file itself) — this only names the directory and prunes old ones."""
    st = os.stat(src_file)
    fp = hashlib.md5(f"{st.st_mtime_ns}:{st.st_size}".encode()).hexdigest()[:10]
    prefix = f"{tag}_{source_ident(src_file)}_"
    out = os.path.join(scratch, f"{prefix}{fp}")
    if not os.path.exists(out) and os.path.isdir(scratch):
        for d in os.listdir(scratch):
            if d.startswith(prefix) and d != f"{prefix}{fp}":
                shutil.rmtree(os.path.join(scratch, d), ignore_errors=True)
    return out

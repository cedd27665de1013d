"""Shared table-maintenance helpers for the native Delta/Iceberg writers."""

from __future__ import annotations

import shutil
import time
from pathlib import Path


def reclaim_stale_staging(table_dir: Path, stale_hours: float = 24.0) -> list[str]:
    """Remove ABANDONED ``_staging_*`` dirs (a writer crashed before its
    finally-cleanup): uuid-suffixed staging names are never reused, so
    without reclamation they leak forever. A dir is abandoned only when
    its NEWEST entry is older than ``stale_hours`` — an in-flight writer
    is actively creating files, so its staging dir stays young. Returns
    the reclaimed dir names."""
    cutoff = time.time() - stale_hours * 3600
    reclaimed: list[str] = []
    for d in sorted(Path(table_dir).glob("_staging_*")):
        if not d.is_dir():
            continue
        newest = max(
            (f.stat().st_mtime for f in d.rglob("*") if f.is_file()),
            default=d.stat().st_mtime,
        )
        if newest < cutoff:
            shutil.rmtree(d, ignore_errors=True)
            reclaimed.append(d.name)
    return reclaimed

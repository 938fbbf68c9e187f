"""Atomic parquet-table swap protocol shared by the foreachBatch sinks
(streaming/events.py upsert, streaming/kpi.py incremental KPI): write
the new table copy to a uuid tmp dir, move the committed copy aside to
``<target>_prev``, move the tmp in, drop ``_prev``. A crash between the
two moves leaves ``_prev`` as the only copy and ``restore_prev``
recovers it on the next invocation, so no committed batch is ever lost;
a crash before the swap leaves only an aged tmp dir, which
``reap_stale_tmp_dirs`` collects (age-gated so a concurrent writer's
fresh tmp is never touched). This is the honest non-ACID floor; on a
transactional table format the same batch bodies become MERGE
statements and this module disappears.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame


def reap_stale_tmp_dirs(
    target: str, ttl_sec: int = 600, marker: str = "_tmp_"
) -> None:
    """Remove aged ``<target><marker>*`` siblings (never the committed
    copy); errors never propagate into the batch they ride on. The age
    gate is what makes this safe under CONCURRENT writers: a sibling
    younger than ``ttl_sec`` may be another invocation's in-flight
    copy — deleting it would fail that writer mid-swap — while one
    older than any plausible write is a crash leftover."""
    parent, base = os.path.dirname(target) or ".", os.path.basename(target)
    try:
        entries = os.listdir(parent)
    except OSError:
        return
    cutoff = time.time() - ttl_sec
    for d in entries:
        if not d.startswith(f"{base}{marker}"):
            continue
        path = os.path.join(parent, d)
        try:
            if os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def restore_prev(target: str) -> None:
    """Crash recovery: a death between the two swap moves leaves the
    committed table at ``_prev`` and no target — restore it."""
    prev = f"{target}_prev"
    if not os.path.exists(target) and os.path.exists(prev):
        shutil.move(prev, target)


def atomic_swap_write(
    df: DataFrame,
    target: str,
    finish_tmp: Callable[[str], None] | None = None,
) -> None:
    """Materialize ``df`` into a tmp dir, then two-rename swap it in.
    ``finish_tmp`` runs after the parquet write but before the swap —
    for sidecar files (underscore-prefixed, ignored by readers) that
    must land atomically with the data."""
    prev = f"{target}_prev"
    tmp = f"{target}_tmp_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)  # materialize BEFORE swap
    if finish_tmp is not None:
        finish_tmp(tmp)
    if os.path.exists(prev):
        shutil.rmtree(prev)
    if os.path.exists(target):
        shutil.move(target, prev)
    shutil.move(tmp, target)
    if os.path.exists(prev):
        shutil.rmtree(prev)

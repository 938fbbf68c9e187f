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


def _touched_since(path: str, cutoff: float) -> bool:
    """True if anything under ``path`` has an mtime >= cutoff. The
    top-level dir's mtime alone is NOT enough: during a long Spark
    parquet write the task activity happens inside ``_temporary``
    subtrees, so the tmp dir itself can look minutes old while a write
    is very much alive. Walk with early exit — for a genuinely dead
    dir the walk is the price of one directory scan; for a live one it
    exits at the first fresh entry."""
    walk_errors: list[OSError] = []
    try:
        if os.path.getmtime(path) >= cutoff:
            return True
        for root, dirs, files in os.walk(path, onerror=walk_errors.append):
            for name in dirs + files:
                try:
                    if os.path.getmtime(os.path.join(root, name)) >= cutoff:
                        return True
                except OSError:
                    # an entry that vanished mid-walk IS activity (a
                    # writer renaming task files); treat as live
                    return True
    except OSError:
        return True  # unreadable: assume live, never reap blind
    if walk_errors:
        # os.walk swallows unreadable SUBDIRS by default (onerror
        # hook) — fresh activity could hide inside one, so an
        # untraversable tree is never declared dead
        return True
    return False


def reap_stale_tmp_dirs(
    target: str, ttl_sec: int = 600, marker: str = "_tmp_"
) -> None:
    """Remove aged ``<target><marker>*`` siblings (never the committed
    copy); errors never propagate into the batch they ride on. The age
    gate is what makes this safe under CONCURRENT writers: a sibling
    with NO filesystem activity anywhere in its tree for ``ttl_sec``
    (see _touched_since — in-flight Spark writes keep their
    ``_temporary`` subtree hot, so a live write of any duration stays
    fresh) is a crash leftover; anything fresher may be another
    invocation's in-flight copy and deleting it would fail that writer
    mid-swap."""
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
        if not _touched_since(path, cutoff):
            shutil.rmtree(path, ignore_errors=True)


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


# Exactly-once sidecar protocol for ADDITIVE foreachBatch sinks
# (hoisted from kpi.py when sketch.py became its second user — one
# implementation of the replay-safety mechanism, not two drifting
# copies): additive merges are not idempotent, so the last applied
# batch_id commits atomically with the data (sidecar written into the
# tmp dir before the swap; parquet readers ignore ``_``-files) and a
# replayed id is a no-op. One target binds to one checkpoint lineage —
# a fresh checkpoint restarts ids at 0 and needs a fresh target.
BATCH_SIDECAR = "_last_batch.json"


def last_applied_batch(target: str) -> int:
    """The committed batch id, or -1 for a missing/unreadable sidecar."""
    import json

    try:
        with open(os.path.join(target, BATCH_SIDECAR)) as f:
            return int(json.load(f)["batch_id"])
    except (OSError, ValueError, KeyError, TypeError):
        return -1


def already_applied(target: str, batch_id: int) -> bool:
    """True when ``batch_id`` was already folded into ``target`` — the
    crash-replay guard every additive sink checks before merging."""
    return os.path.exists(target) and batch_id <= last_applied_batch(target)


def batch_sidecar_writer(batch_id: int) -> Callable[[str], None]:
    """finish_tmp hook for atomic_swap_write: commit ``batch_id``
    atomically with the swapped data."""
    import json

    def write(tmp: str) -> None:
        with open(os.path.join(tmp, BATCH_SIDECAR), "w") as f:
            json.dump({"batch_id": batch_id}, f)

    return write

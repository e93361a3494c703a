"""Versioned parquet tables: atomic commit, time travel, file skipping.

SURVEY.md §1.1 maps the reference's sinks to "Iceberg/parquet"; this
container carries no Iceberg jars, so this module provides the table-
format semantics the pipeline actually relies on, on plain parquet:

  - **atomic commit**: data lands in an immutable uuid-named staging
    directory, then a manifest is written, then the ``VERSION`` pointer
    is swapped with ``os.replace``. The pointer swap is the SOLE commit
    point: manifests newer than the pointer are orphans from a crashed
    writer and are ignored by every read path (and garbage-collected by
    the next writer). Readers either see the old version or the new one,
    never a half-written table, and a crashed commit never blocks the
    table (round-3 ADVICE, medium: uuid staging dirs can't collide on
    retry, and the next version derives from the pointer, not from
    leftover directories);
  - **snapshot isolation**: data dirs are append-only and never
    rewritten; a reader resolved at version N keeps reading N's files
    even while N+1 commits;
  - **time travel**: read any retained version by number, or the latest
    as of a wall-clock timestamp;
  - **append without rewrite**: an append manifest lists the parent's
    files plus the new ones — no data copy (the Iceberg manifest-list
    idea, one level deep);
  - **file skipping**: ``write_snapshot(stats_cols=[...])`` records
    per-file column min/max (read from the parquet footers via pyarrow —
    metadata only, no second scan) in the manifest; ``read_snapshot(
    predicates=...)`` prunes files whose stats prove no row can match
    BEFORE Spark ever sees them, then applies the residual filter so
    results are exact. This is the Iceberg manifest-stats capability —
    at 100 TB the difference between pruning and a full scan on every
    time-travel read (reference predicate pushdown:
    src/config/database.ts:50-63);
  - **schema evolution**: an append snapshot may add columns; the
    manifest records the merged schema and reads pass it explicitly
    (``spark.read.schema(...)``, missing columns → NULL — no
    mergeSchema footer-scan of every file), so old versions read their
    original schema and new versions see the union;
  - **snapshot expiration**: ``expire_versions(root, keep_last=N)``
    drops old manifests and deletes data dirs no retained manifest
    references (Iceberg ``expire_snapshots`` analog) — bounded storage
    under frequent commits;
  - **merge-on-read deletes**: ``delete_where_mor`` commits a tiny
    positional delete file (``file, pos`` — the Iceberg v2 position-
    delete form) instead of rewriting data files; every read path
    anti-joins the positions back out. At 100 TB this is the difference
    between a kilobyte write and rewriting a terabyte partition to
    drop a handful of rows. ``compact_snapshot`` absorbs deletes back
    into clean files; surfaces whose semantics a delete would silently
    break (append-lineage incremental reads, metadata-only min/max)
    refuse loudly instead.

Single-writer discipline is enforced with a best-effort ``_commit.lock``
(O_CREAT|O_EXCL); concurrent readers need no locks. At real scale the
pointer swap maps to an Iceberg/Hive catalog swap — the calling code
(`plans/checkpoint.py` stage sinks) would not change shape.
"""

from __future__ import annotations

import datetime
import json
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

VERSION_PTR = "VERSION"
MANIFEST_DIR = "_versions"
STAGED_DIR = "_staged"
LOCK = "_commit.lock"
DATA_PREFIX = "data_"

# Meta keys every plain writer (overwrite, append, staged publish)
# carries forward from the parent: marks that must ride the NEWEST
# manifest to survive expire_versions. Layout transforms are NOT here —
# an overwrite replaces the file layout, so inheriting a transform spec
# onto files that lack the layout column would make point lookups
# silently miss rows (row ops, which preserve layout, inherit the wider
# _DURABLE_ROW_OP_META instead).
_DURABLE_WRITER_META = ("batch_id_hwm", "mv_src_version")

# merge-on-read position deletes: internal column names a delete-aware
# scan temporarily attaches (reserved — tables must not contain them,
# checked at delete time and on every delete-applying scan)
MOR_FILE_COL = "_mor_file"
MOR_POS_COL = "_mor_pos"

_PRUNE_OPS = ("==", "<", "<=", ">", ">=", "between", "isnull", "notnull")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"{version:05d}.json")


def current_version(root: str) -> int | None:
    try:
        with open(os.path.join(root, VERSION_PTR)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _manifest_versions(root: str) -> list[int]:
    mdir = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(name[:-5]) for name in os.listdir(mdir) if name.endswith(".json")
    )


def _committed_versions(root: str) -> list[int]:
    """Versions whose commit completed — manifest exists AND version is at
    or below the pointer. A manifest above the pointer is a crashed
    writer's orphan and is never visible."""
    ptr = current_version(root)
    if ptr is None:
        return []
    return [v for v in _manifest_versions(root) if v <= ptr]


def _json_safe(v):
    """Parquet-footer stat → JSON-storable value with an ordering that
    matches the original type's (ISO strings for dates/timestamps).

    tz-aware timestamps (pyarrow returns Spark's UTC-adjusted stats as
    tz-aware datetimes) are normalized to naive UTC BEFORE serializing:
    a trailing '+00:00' would make the stored stat compare GREATER than
    any naive ISO predicate value with the same instant, so a boundary
    equality ('<=' / '==' upper bound) would wrongly prune the file and
    silently drop matching rows (round-4 ADVICE, medium)."""
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int, float, str, bool)):
        return v
    return None  # binary / decimal / unknown: no stats recorded


def _collect_file_stats(data_dir: str, stats_cols: list[str]) -> dict:
    """Per-file min/max + null count for ``stats_cols`` from the parquet
    footers (pyarrow metadata read — no data scan). Files or columns
    without usable statistics simply get no entry (→ never pruned).
    An all-NULL column chunk carries no min/max but a valid null count,
    so its entry is ``{"nulls": n}`` alone — which is what lets value
    predicates prune the file entirely and ``isnull``/``notnull``
    predicates and metadata-only ``count(col)`` stay answerable."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(data_dir, name)
        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        col_stats: dict[str, dict] = {}
        for col in stats_cols:
            if col not in idx:
                continue
            mn = mx = None
            ok = True
            nulls = 0
            nulls_ok = True
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                if st is None:
                    ok = nulls_ok = False
                    break
                if st.null_count is None:
                    nulls_ok = False
                else:
                    nulls += st.null_count
                if not st.has_min_max:
                    ok = False
                    continue
                lo, hi = _json_safe(st.min), _json_safe(st.max)
                if lo is None or hi is None:
                    ok = False
                    continue
                mn = lo if mn is None or lo < mn else mn
                mx = hi if mx is None or hi > mx else mx
            entry: dict = {}
            if ok and mn is not None:
                entry["min"], entry["max"] = mn, mx
            if nulls_ok:
                entry["nulls"] = nulls
            if entry:
                col_stats[col] = entry
        if col_stats:
            out[name] = col_stats
    return out


def _merge_schemas(parent: StructType, new: StructType) -> StructType:
    """Union-by-name schema merge for append snapshots: parent columns
    keep their position/type, new columns append. A same-name column must
    keep its type — evolution adds columns, it doesn't mutate them."""
    by_name = {f.name: f for f in parent.fields}
    for f in new.fields:
        old = by_name.get(f.name)
        if old is not None and old.dataType != f.dataType:
            raise ValueError(
                f"schema evolution cannot change column {f.name!r} from "
                f"{old.dataType.simpleString()} to {f.dataType.simpleString()}"
            )
    merged = list(parent.fields)
    # added columns are recorded NULLABLE regardless of the appended
    # frame's flag: pre-evolution files read them as NULL, and a
    # non-nullable recorded field makes the vectorized reader refuse
    # those files outright ("Required column is missing in data file")
    merged += [
        StructField(f.name, f.dataType, nullable=True, metadata=f.metadata)
        for f in new.fields if f.name not in by_name
    ]
    return StructType(merged)


def _pid_alive(pid: int) -> bool:
    """Liveness probe shared by lock stealing and pin GC. Unknown or
    unprobeable pids count as alive — be conservative, don't destroy."""
    if pid <= 0:
        return True
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _acquire_lock(root: str) -> int:
    """Single-writer lock with staleness recovery: the lock file records
    the holder's pid; if that process is gone (SIGKILL/OOM mid-commit —
    the `finally` unlink never ran), the lock is stolen and commit
    proceeds (the dead writer's half-commit is invisible by the pointer
    rule and GC'd). A live holder still raises.

    Stealing is serialized behind a dedicated steal mutex: with
    ``_acquire_lock_wait`` polling every 50 ms, several waiters
    routinely observe the same dead holder, and an unguarded
    read-pid-then-unlink would let waiter B unlink waiter A's FRESH
    lock (read before A re-created it) — two writers would then both
    hold the commit lock and the second pointer swap would silently
    clobber the first's append (round-5 review finding). Under the
    mutex the CURRENT holder pid is re-read before unlinking, so only
    a still-dead holder is ever stolen; losers of the mutex see plain
    contention. The mutex itself is held for microseconds (no Spark
    work inside), so its own staleness path is the same dead-pid
    unlink — acceptable at that window size."""
    lock_path = os.path.join(root, LOCK)
    steal_path = lock_path + ".steal"
    for attempt in (0, 1):
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            return fd
        except FileExistsError:
            try:
                with open(lock_path) as f:
                    holder = int(f.read().strip() or "-1")
            except (OSError, ValueError):
                holder = -1
            alive = _pid_alive(holder)
            if alive or attempt == 1:
                raise RuntimeError(
                    f"another writer (pid {holder}) holds {lock_path}; "
                    "versioned tables are single-writer"
                ) from None
            # holder is dead: steal under the steal mutex, then retry
            try:
                sfd = os.open(
                    steal_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                # another stealer is mid-steal: if IT died too, clear
                # its microsecond-window mutex; either way report
                # contention — the wait loop (or the caller) retries
                try:
                    with open(steal_path) as f:
                        spid = int(f.read().strip() or "-1")
                except (OSError, ValueError):
                    spid = -1
                if not _pid_alive(spid):
                    try:
                        os.unlink(steal_path)
                    except FileNotFoundError:
                        pass
                raise RuntimeError(
                    f"another writer is stealing {lock_path}; retry"
                ) from None
            try:
                os.write(sfd, str(os.getpid()).encode())
                # re-read the CURRENT holder under the mutex: only a
                # still-dead holder may be unlinked (a fresh lock from
                # a faster stealer must survive)
                try:
                    with open(lock_path) as f:
                        holder_now = int(f.read().strip() or "-1")
                except FileNotFoundError:
                    holder_now = None  # already stolen+released
                except (OSError, ValueError):
                    holder_now = -1  # unreadable: conservative, no steal
                if holder_now is not None and not _pid_alive(holder_now):
                    try:
                        os.unlink(lock_path)
                    except FileNotFoundError:
                        pass
            finally:
                os.close(sfd)
                try:
                    os.unlink(steal_path)
                except FileNotFoundError:
                    pass
    raise AssertionError("unreachable")


def _acquire_lock_wait(root: str, timeout: float) -> int:
    """Poll :func:`_acquire_lock` until it succeeds or ``timeout``
    elapses. With lock-free data writes (write_snapshot_concurrent) the
    critical section shrinks to the manifest merge, so waiting briefly
    is the right contention behavior — writers queue for milliseconds,
    not for each other's Spark jobs."""
    deadline = time.monotonic() + timeout
    while True:
        try:
            return _acquire_lock(root)
        except RuntimeError:
            if time.monotonic() >= deadline:
                raise RuntimeError(
                    f"timed out after {timeout}s waiting for the commit "
                    f"lock at {root}"
                ) from None
            time.sleep(0.05)


def _staged_live_dirs(root: str) -> set[str]:
    """Data dirs referenced by write-audit-publish staging entries: live
    for BOTH garbage collectors (orphan GC and expire_versions) even
    though no committed manifest lists them yet — a staged-but-unaudited
    commit must survive unrelated writers landing in between."""
    sdir = os.path.join(root, STAGED_DIR)
    live: set[str] = set()
    if not os.path.isdir(sdir):
        return live
    for name in os.listdir(sdir):
        if not name.endswith(".json"):
            continue  # .tmp of an in-flight atomic write: not live yet
        try:
            with open(os.path.join(sdir, name)) as f:
                entry = json.load(f)
        except FileNotFoundError:
            continue  # aborted/published between listdir and open
        # any other read error PROPAGATES: entries are written atomically
        # (tmp + os.replace), so an unreadable one is a transient fault
        # (EMFILE, NFS hiccup) — treating it as absent would let the GC
        # destroy exactly the mid-audit data this function protects
        for fpath in entry.get("new_files", []):
            live.add(fpath.split("/", 1)[0])
        pin = entry.get("pin_dir")
        if pin:
            # optimistic-append pin: the dir is mid-write, no manifest or
            # WAP file list references it yet
            live.add(pin)
    return live


def _manifest_live_dirs(meta_root: str, live: set) -> None:
    """Add every data/delete dir the meta root's manifests reference."""
    for v in _manifest_versions(meta_root):
        m = _read_manifest(meta_root, v)
        for f in m["files"]:
            live.add(f.split("/", 1)[0])
        for dels in _delete_map(m).values():
            for d in dels:
                live.add(d.split("/", 1)[0])


def _gc_orphans(root: str) -> None:
    """Crash recovery, run under the commit lock: drop manifests above the
    pointer (commit never completed — per ref: main AND every branch
    keep their own pointer) and data dirs no surviving manifest of ANY
    ref references (parquet written, manifest never landed). Staged WAP
    entries' dirs are live (see _staged_live_dirs)."""
    # _branch_meta_root/_branch_names are defined later in this module —
    # resolved at call time, like every module-level name
    # snapshot the data-dir candidates BEFORE any pin is read: a
    # lock-free writer pins FIRST and creates its dir SECOND, so any
    # dir in this early listing either has its pin already on disk
    # (read below → live) or is genuinely orphaned. Listing after the
    # pin read would race a writer that pins+writes mid-GC — its
    # in-flight dir would be judged against a stale live set and
    # destroyed (round-5 review finding).
    gc_candidates = [
        n for n in os.listdir(root) if n.startswith(DATA_PREFIX)]
    meta_roots = [root] + [_branch_meta_root(root, n) for n in _branch_names(root)]
    for mr in meta_roots:
        ptr = current_version(mr) or 0
        for v in _manifest_versions(mr):
            if v > ptr:
                os.unlink(_manifest_path(mr, v))
    # drop optimistic-append pins whose writer died mid-write (same
    # single-host liveness rule as lock stealing): the append never
    # committed, so its half-written dir is garbage below
    sdir = os.path.join(root, STAGED_DIR)
    if os.path.isdir(sdir):
        for name in os.listdir(sdir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(sdir, name)) as f:
                    entry = json.load(f)
            except (OSError, ValueError):
                continue
            if entry.get("pin_dir") and not _pid_alive(entry.get("pid", -1)):
                try:
                    os.unlink(os.path.join(sdir, name))
                except FileNotFoundError:
                    pass
    live_dirs = _staged_live_dirs(root)
    for mr in meta_roots:
        _manifest_live_dirs(mr, live_dirs)
    for name in gc_candidates:
        if name not in live_dirs:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def _merge_append_manifest(pm, schema, new_files, file_stats, file_rows):
    """Parent-merge for an append commit — THE single definition of what
    an append inherits: schema union by name, parent files first, stats
    and row-count union, and the parent's merge-on-read delete
    attachments (an append that dropped them would resurrect deleted
    rows). Shared by write_snapshot, publish_staged and
    write_snapshot_branch (round-5 review: three hand-kept copies)."""
    return (
        _merge_schemas(StructType.fromJson(pm["schema"]), schema),
        pm["files"] + new_files,
        {**pm.get("file_stats", {}), **file_stats},
        {**pm.get("file_rows", {}), **file_rows},
        _delete_map(pm),
        pm.get("delete_counts", {}),
    )


def write_snapshot(
    df: DataFrame,
    root: str,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
    data_name: str | None = None,
    meta_fn=None,
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    mode="overwrite": the new version's file set is just this snapshot.
    mode="append": the new version lists the parent's files too (no
    rewrite of existing data); the appended frame may ADD columns —
    the manifest records the merged schema (see module docstring).

    ``stats_cols``: record per-file min/max for these columns in the
    manifest (parquet-footer read, no extra scan) so ``read_snapshot``
    can skip files by predicate. Timestamp columns only carry footer
    stats when ``spark.sql.parquet.outputTimestampType`` is an
    annotated type (TIMESTAMP_MICROS/MILLIS) — Spark's INT96 default
    writes no min/max, so such columns silently get no stats (reads
    stay correct, just unpruned); tz-aware stats are normalized to
    naive UTC (see ``_json_safe``). ``meta``: caller key/values stored
    in the manifest (e.g. a streaming batch id for exactly-once
    publish).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    lock_path = os.path.join(root, LOCK)
    fd = None
    try:
        fd = _acquire_lock(root)

        _gc_orphans(root)
        parent = current_version(root)
        version = (parent or 0) + 1
        pm = _read_manifest(root, parent) if parent is not None else None
        # meta_fn runs UNDER the commit lock with the true parent
        # manifest — the hook for metadata that must be derived from
        # the commit-time parent (partition-evolution bookkeeping; a
        # pre-lock computation would race concurrent commits) and for
        # guards that must see the frozen parent. It runs BEFORE the
        # data write so a refusing guard aborts cheaply.
        hook_meta = meta_fn(pm) if meta_fn is not None else {}
        if stats_cols is None and mode == "append" and pm is not None:
            # appends inherit the parent's stats columns by default —
            # otherwise a forgetful append silently degrades file
            # pruning and metadata-only aggregation for its files (the
            # same inheritance row ops already apply); an explicit
            # stats_cols still wins
            stats_cols = _parent_stats_cols(pm, []) or None
        new_files, file_stats, file_rows, n = _write_data_dir(
            df, root, stats_cols, data_name=data_name)
        schema = df.schema
        files = new_files
        delete_files: dict = {}
        delete_counts: dict = {}
        meta_out = dict(meta or {})
        meta_out.update(hook_meta)
        if parent is not None:
            # the streaming batch-id high-water mark rides EVERY commit
            # (append, overwrite, row ops): it must stay on the NEWEST
            # manifest — that is what makes it immune to
            # expire_versions — even when a maintenance append or a
            # re-clustering overwrite lands between stream batches
            # (round-5 reviews); caller-supplied meta still wins
            for k in _DURABLE_WRITER_META:
                if k in pm.get("meta", {}) and k not in meta_out:
                    meta_out[k] = pm["meta"][k]
            if mode == "append":
                (schema, files, file_stats, file_rows,
                 delete_files, delete_counts) = _merge_append_manifest(
                    pm, df.schema, new_files, file_stats, file_rows)

        _publish_manifest(root, version, {
            "version": version,
            "parent": parent,
            "mode": mode,
            "files": files,
            "file_stats": file_stats,
            "file_rows": file_rows,
            "delete_files": delete_files,
            "delete_counts": delete_counts,
            "schema": schema.jsonValue(),
            "rows_written": n,
            "committed_at": time.time(),
            "meta": meta_out,
        })
        return version
    finally:
        if fd is not None:
            os.close(fd)
            os.unlink(lock_path)


def _pin_data_dir(root: str) -> tuple[str, str]:
    """Reserve a data dir name for a LOCK-FREE write and pin it against
    both garbage collectors via a `_staged/` pin entry (see
    _staged_live_dirs / _gc_orphans). Returns (data_name, pin_path);
    the caller unpins in a finally."""
    os.makedirs(os.path.join(root, STAGED_DIR), exist_ok=True)
    data_name = f"{DATA_PREFIX}{uuid.uuid4().hex[:12]}"
    pin_path = os.path.join(
        root, STAGED_DIR, f"pin-{uuid.uuid4().hex[:12]}.json")
    tmp = pin_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({
            "pin_dir": data_name,
            "pid": os.getpid(),
            "created_at": time.time(),
        }, f)
    os.replace(tmp, pin_path)
    return data_name, pin_path


def _unpin(pin_path: str) -> None:
    try:
        os.unlink(pin_path)
    except FileNotFoundError:
        pass


def _footer_rows(root: str, data_name: str) -> dict:
    """Per-file row counts for an already-written data dir, keyed by the
    manifest-relative path — the one definition of the path-prefix
    convention the lock-free committers share."""
    return {
        f"{data_name}/{name}": r
        for name, r in _file_row_counts(
            os.path.join(root, data_name)).items()
    }


def _footer_stats(root: str, data_name: str, stats_cols) -> dict:
    """Per-file min/max/null stats for an already-written data dir —
    footer-only, so lock-free writers can defer stats collection to
    COMMIT time (against the commit-time parent's stats columns)."""
    if not stats_cols:
        return {}
    return {
        f"{data_name}/{name}": st
        for name, st in _collect_file_stats(
            os.path.join(root, data_name), stats_cols
        ).items()
    }


def write_snapshot_concurrent(
    df: DataFrame,
    root: str,
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
    lock_timeout: float = 30.0,
) -> int:
    """Optimistic-concurrency APPEND (the Iceberg fast-append model):
    the data write runs with NO commit lock held — only the manifest
    merge + pointer swap serialize, shrinking the critical section from
    O(Spark job) to O(manifest). ``write_snapshot`` holds the lock for
    the whole write, so N concurrent appenders (streaming publishers,
    per-partition ingest jobs, maintenance) execute their cluster jobs
    one at a time; with this path they run simultaneously and queue
    only for the milliseconds of commit.

    Appends never conflict (pure file addition — each commit rebases
    onto whatever the parent is at commit time), so no validation or
    retry-of-the-write is ever needed; this is why the optimistic path
    is append-only. Overwrites and row-level ops keep the pessimistic
    lock (their read-modify-write must see a frozen parent).

    Crash/GC safety: the target data dir is pinned via a `_staged/`
    pin entry BEFORE the write starts, so a concurrent committer's
    orphan GC cannot vaporize the half-written dir; a pin whose writer
    pid died is dropped by the next GC (the append never committed, the
    dir is garbage) — the same single-host liveness rule as lock
    stealing. Per-file stats are footer-only and therefore computed at
    COMMIT time against the commit-time parent's stats columns, so a
    parent whose stats set changed mid-flight still gets fully-pruned
    files.
    """
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    data_name, pin_path = _pin_data_dir(root)
    try:
        # lock-free: the expensive part. Stats are collected later from
        # parquet footers, so none are requested here.
        new_files, _, _, n = _write_data_dir(
            df, root, None, data_name=data_name)
        fd = _acquire_lock_wait(root, lock_timeout)
        try:
            _gc_orphans(root)  # our dir survives via the pin
            parent = current_version(root)
            version = (parent or 0) + 1
            schema = df.schema
            files = new_files
            delete_files: dict = {}
            delete_counts: dict = {}
            meta_out = dict(meta or {})
            eff_stats = stats_cols
            pm = None
            if parent is not None:
                pm = _read_manifest(root, parent)
                _refuse_transformed_parent(pm, "a concurrent append")
                if eff_stats is None:
                    eff_stats = _parent_stats_cols(pm, []) or None
                for k in _DURABLE_WRITER_META:
                    if k in pm.get("meta", {}) and k not in meta_out:
                        meta_out[k] = pm["meta"][k]
            file_stats = _footer_stats(root, data_name, eff_stats)
            file_rows = _footer_rows(root, data_name)
            if pm is not None:
                (schema, files, file_stats, file_rows,
                 delete_files, delete_counts) = _merge_append_manifest(
                    pm, df.schema, new_files, file_stats, file_rows)
            _publish_manifest(root, version, {
                "version": version,
                "parent": parent,
                "mode": "append",
                "files": files,
                "file_stats": file_stats,
                "file_rows": file_rows,
                "delete_files": delete_files,
                "delete_counts": delete_counts,
                "schema": schema.jsonValue(),
                "rows_written": n,
                "committed_at": time.time(),
                "meta": meta_out,
            })
            return version
        finally:
            os.close(fd)
            os.unlink(os.path.join(root, LOCK))
    finally:
        _unpin(pin_path)


def _file_row_counts(data_dir: str) -> dict[str, int]:
    """Per-file row counts from the parquet footers (metadata only)."""
    import pyarrow.parquet as pq

    return {
        name: pq.ParquetFile(os.path.join(data_dir, name)).metadata.num_rows
        for name in sorted(os.listdir(data_dir))
        if name.endswith(".parquet")
    }


def _write_data_dir(
    df: DataFrame, root: str, stats_cols: list[str] | None,
    data_name: str | None = None,
) -> tuple[list[str], dict, dict, int]:
    """Write ``df`` into a fresh uuid data dir under ``root``; returns
    (relative file paths, per-file stats for ``stats_cols``, per-file
    row counts, row count). Shared by the committing writer and the WAP
    staging writer. ``data_name`` lets the optimistic appender pick (and
    GC-pin) the dir before the write starts."""
    data_name = data_name or f"{DATA_PREFIX}{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(root, data_name)
    obs = Observation(f"snap_{uuid.uuid4().hex[:8]}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    observed.write.mode("error").parquet(data_dir)
    n = int(obs.get["rows"])
    new_files = [
        f"{data_name}/{f}"
        for f in sorted(os.listdir(data_dir))
        if f.endswith(".parquet")
    ]
    file_stats = {}
    if stats_cols:
        file_stats = {
            f"{data_name}/{name}": st
            for name, st in _collect_file_stats(data_dir, stats_cols).items()
        }
    file_rows = {
        f"{data_name}/{name}": r
        for name, r in _file_row_counts(data_dir).items()
    }
    return new_files, file_stats, file_rows, n


def _publish_manifest(root: str, version: int, manifest: dict) -> None:
    """The shared commit tail for every writer path: durable manifest
    (tmp + rename), then the pointer swap — the SOLE commit point."""
    tmp = _manifest_path(root, version) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(root, version))
    ptr_tmp = os.path.join(root, VERSION_PTR + ".tmp")
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.replace(ptr_tmp, os.path.join(root, VERSION_PTR))


def _file_can_match(
    stats: dict | None, predicates: dict, n_rows=None,
) -> bool:
    """Driver-side pruning decision: False only when the recorded stats
    PROVE no row in the file satisfies every predicate. Missing stats →
    must keep. NULL rows never satisfy a comparison predicate (SQL), so
    min/max (which exclude nulls) stay a sound bound; a recorded null
    count prunes ``isnull``/``notnull`` predicates and lets an all-NULL
    file (which has a null count but no min/max) refute any value
    predicate when ``n_rows`` (the file's recorded row count) is
    known."""
    if stats is None:
        return True
    try:
        return _stats_can_match(stats, predicates, n_rows)
    except TypeError:
        # predicate value not comparable with the stored stat type
        # (e.g. int vs string-typed stats): pruning silently keeps the
        # file — the residual filter still guarantees exact results
        return True


def _stats_can_match(stats: dict, predicates: dict, n_rows=None) -> bool:
    for col, (op, val) in predicates.items():
        st = stats.get(col)
        if st is None:
            continue
        nulls = st.get("nulls")
        if op == "isnull":
            if nulls == 0:
                return False
            continue
        if op == "notnull":
            if n_rows is not None and nulls == n_rows:
                return False
            continue
        # every value op is NULL-rejecting: an all-NULL file can never
        # match (such files carry no min/max, only a null count)
        if n_rows is not None and nulls == n_rows:
            return False
        if "min" not in st:
            continue  # nulls-only stats: no range to refute with
        mn, mx = st["min"], st["max"]
        if op == "==":
            if val < mn or val > mx:
                return False
        elif op == ">=":
            if mx < val:
                return False
        elif op == ">":
            if mx <= val:
                return False
        elif op == "<=":
            if mn > val:
                return False
        elif op == "<":
            if mn >= val:
                return False
        elif op == "between":
            lo, hi = val
            if mx < lo or mn > hi:
                return False
    return True


def _residual_filter(predicates: dict) -> Column:
    cond = F.lit(True)
    for col, (op, val) in predicates.items():
        c = F.col(col)
        if op == "isnull":
            cond = cond & c.isNull()
        elif op == "notnull":
            cond = cond & c.isNotNull()
        elif op == "==":
            cond = cond & (c == F.lit(val))
        elif op == ">=":
            cond = cond & (c >= F.lit(val))
        elif op == ">":
            cond = cond & (c > F.lit(val))
        elif op == "<=":
            cond = cond & (c <= F.lit(val))
        elif op == "<":
            cond = cond & (c < F.lit(val))
        else:  # between
            cond = cond & c.between(F.lit(val[0]), F.lit(val[1]))
    return cond


def _check_predicates(predicates: dict) -> None:
    for col, spec in predicates.items():
        if not (isinstance(spec, tuple) and len(spec) == 2 and spec[0] in _PRUNE_OPS):
            raise ValueError(
                f"predicate for {col!r} must be (op, value) with op in "
                f"{_PRUNE_OPS}; got {spec!r}"
            )


def _resolve_version(
    root: str, version: int | None, as_of: float | None
) -> int:
    if version is not None and as_of is not None:
        raise ValueError("pass version or as_of, not both")
    committed = _committed_versions(root)
    if as_of is not None:
        candidates = [
            v for v in committed
            if _read_manifest(root, v)["committed_at"] <= as_of
        ]
        if not candidates:
            raise FileNotFoundError(f"no version of {root} as of {as_of}")
        return max(candidates)
    if version is not None:
        if version not in committed:
            raise FileNotFoundError(
                f"{root} has no committed version {version}"
            )
        return version
    if not committed:
        raise FileNotFoundError(f"{root} has no committed version")
    return max(committed)


def _plan_from_manifest(m: dict, predicates: dict | None) -> tuple[list[str], int]:
    """(relative files to scan, files skipped by stats) for one resolved
    manifest — shared by main-table and branch reads."""
    files, skipped = m["files"], 0
    if predicates:
        _check_predicates(predicates)
        stats = m.get("file_stats", {})
        fr = m.get("file_rows", {})
        kept = [
            f for f in files
            if _file_can_match(stats.get(f), predicates, fr.get(f))
        ]
        skipped = len(files) - len(kept)
        files = kept
    return files, skipped


def plan_files(
    root: str,
    version: int | None = None,
    as_of: float | None = None,
    predicates: dict | None = None,
) -> tuple[list[str], int, StructType]:
    """Resolve a read: (absolute files to scan, files skipped by stats,
    manifest schema). ``read_snapshot`` is this plus ``spark.read``;
    exposed so tests and tools can assert pruning without running a job."""
    v = _resolve_version(root, version, as_of)
    m = _read_manifest(root, v)
    files, skipped = _plan_from_manifest(m, predicates)
    abs_files = [os.path.join(root, f) for f in files]
    return abs_files, skipped, StructType.fromJson(m["schema"])


def _delete_map(m: dict) -> dict[str, list[str]]:
    """Manifest's live position-delete attachments: {data_rel_file:
    [delete_rel_file, ...]} — empty dict when the snapshot has none."""
    return {f: d for f, d in m.get("delete_files", {}).items() if d}


def _check_mor_reserved(schema: StructType) -> None:
    bad = [c for c in (MOR_FILE_COL, MOR_POS_COL) if c in schema.fieldNames()]
    if bad:
        raise ValueError(
            f"merge-on-read deletes reserve column name(s) {bad}; the "
            "table must not contain them"
        )


def _rel_file_cols() -> list[Column]:
    """(relative data file, row position) of each scanned row, from the
    parquet reader's metadata columns. Data files always live exactly
    one uuid directory below the table root, so the relative path is
    the last two URI segments — location-independent, unlike the full
    ``file:///...`` path."""
    parts = F.split(F.col("_metadata.file_path"), "/")
    return [
        F.concat_ws(
            "/", F.element_at(parts, -2), F.element_at(parts, -1)
        ).alias(MOR_FILE_COL),
        F.col("_metadata.row_index").alias(MOR_POS_COL),
    ]


# above this many live delete positions across the scanned files, the
# read-side anti-join is left to AQE instead of a forced broadcast
MOR_BROADCAST_CAP = 2_000_000

# up to this many per-file scan branches, a delete-aware read scans each
# needed file as its OWN parquet source with the file identity as a
# LITERAL column — zero per-row string work, and the anti-join runs on
# row_index alone (bigint vs a tiny broadcast). Above the cap the plan
# would bloat, so it falls back to one scan with the relative path
# computed per row from the reader's file_path metadata (measured 8.6x
# slower on a 20M-row read in tools/bench_mor.py, but plan-size-safe
# for a mass delete touching thousands of files).
MOR_PLAN_CAP = 64

# a dirty file with at most this many live positions filters them as an
# inlined InSet predicate (pure whole-stage codegen, no join); heavier
# files fall back to a broadcast anti-join on row_index
MOR_INLINE_CAP = 10_000


def _load_delete_positions(
    root: str, dmap: dict, dcounts: dict, files: list[str],
) -> dict[str, list[int]] | None:
    """Driver-side load of the position sets attached to ``files`` —
    delete parquets are tiny by contract (``max_positions``-bounded
    writes), so pyarrow reads them without a Spark job. Returns None
    (callers fall back to the join path) when the recorded counts say
    the load would not be driver-safe."""
    if sum(dcounts.get(f, 0) for f in files) > MOR_BROADCAST_CAP:
        return None
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    del_rel = sorted({d for f in files for d in dmap[f]})
    # the cap above bounds the positions we WANT; a shared delete
    # parquet can carry far more rows for OTHER files — bound the
    # actual load by the footers before reading anything (round-5
    # review: the want-side cap alone let a 5M-row delete file
    # materialize driver-side for a 5k-position scan); one open per
    # file: the footer check and the read share the handle
    handles = [pq.ParquetFile(os.path.join(root, d)) for d in del_rel]
    if sum(h.metadata.num_rows for h in handles) > MOR_BROADCAST_CAP:
        return None
    out: dict[str, list[int]] = {}
    want = pa.array(sorted(set(files)))
    for h in handles:
        t = h.read(columns=["file", "pos"])
        t = t.filter(pc.is_in(t.column("file"), value_set=want))
        for fval, pos in zip(
            t.column("file").to_pylist(), t.column("pos").to_pylist()
        ):
            out.setdefault(fval, []).append(int(pos))
    return out


def _scan_files(
    spark: SparkSession,
    root: str,
    m: dict,
    rel_files: list[str],
    with_pos: bool = False,
    schema: StructType | None = None,
) -> DataFrame:
    """THE data-file scan every read and rewrite path routes through:
    read ``rel_files`` under ``schema`` (default: the manifest's),
    anti-joining out any position-delete files the manifest attaches to
    them, so merge-on-read deletes are invisible everywhere by
    construction. Files without delete entries scan clean — no metadata
    columns, no join (at 100 TB almost every file is clean; only the
    deleted-against minority pays the anti-join). ``with_pos=True``
    additionally returns each surviving row's (relative file, position)
    as ``MOR_FILE_COL``/``MOR_POS_COL`` — the delete writer's input.
    Per-file delete sides are broadcast while the recorded position
    count stays under ``MOR_BROADCAST_CAP``; above it, AQE picks the
    strategy (bulk deletes belong in copy-on-write ``delete_where``)."""
    schema = schema or StructType.fromJson(m["schema"])
    dmap = _delete_map(m)
    dirty = [f for f in rel_files if f in dmap]
    if dirty or with_pos:
        _check_mor_reserved(schema)
    if not rel_files:
        df = spark.createDataFrame([], schema)
        if with_pos:
            df = df.select(
                "*",
                F.lit(None).cast("string").alias(MOR_FILE_COL),
                F.lit(None).cast("bigint").alias(MOR_POS_COL),
            )
        return df

    def scan(files: list[str], attach: bool) -> DataFrame:
        df = spark.read.schema(schema).parquet(
            *[os.path.join(root, f) for f in files]
        )
        return df.select("*", *_rel_file_cols()) if attach else df

    dcounts = m.get("delete_counts", {})

    def _del_side(files: list[str]) -> DataFrame:
        import pyarrow.parquet as pq

        del_rel = sorted({d for f in files for d in dmap[f]})
        dels = spark.read.parquet(
            *[os.path.join(root, d) for d in del_rel]
        )
        # broadcast gate on the parquets' ACTUAL footer rows, not the
        # scanned files' wanted counts — a shared delete file carries
        # rows for other files too (round-5 review, same hazard as
        # _load_delete_positions)
        n_actual = sum(
            pq.ParquetFile(os.path.join(root, d)).metadata.num_rows
            for d in del_rel
        )
        return dels, n_actual

    dirty_set = set(dirty)
    clean = [f for f in rel_files if f not in dirty_set]
    parts: list[DataFrame] = []
    n_branches = len(dirty) + (len(clean) if with_pos else 0)
    if n_branches <= MOR_PLAN_CAP:
        # fast path: one scan branch per file that needs an identity or
        # an anti-join — the file is a literal, the join key is just
        # row_index
        if clean and not with_pos:
            parts.append(scan(clean, False))
        else:
            for f in clean:
                parts.append(
                    spark.read.schema(schema)
                    .parquet(os.path.join(root, f))
                    .select(
                        "*",
                        F.lit(f).alias(MOR_FILE_COL),
                        F.col("_metadata.row_index").alias(MOR_POS_COL),
                    )
                )
        if dirty:
            pos_map = _load_delete_positions(root, dmap, dcounts, dirty)
            dels = None
            for f in dirty:
                one = (
                    spark.read.schema(schema)
                    .parquet(os.path.join(root, f))
                    .select(
                        "*",
                        F.lit(f).alias(MOR_FILE_COL),
                        F.col("_metadata.row_index").alias(MOR_POS_COL),
                    )
                )
                plist = None if pos_map is None else pos_map.get(f)
                if plist is not None and len(plist) <= MOR_INLINE_CAP:
                    # sparse deletes: positions inline as an InSet
                    # filter — no join, no broadcast exchange, the scan
                    # stays one whole-stage-codegen pipeline (measured:
                    # the per-branch broadcast-join overhead dominated
                    # the sparse case, tools/bench_mor.py)
                    one = one.filter(~F.col(MOR_POS_COL).isin(plist))
                else:
                    if dels is None:
                        dels, _ = _del_side(dirty)
                    pos = dels.filter(F.col("file") == f).select(
                        F.col("pos").alias(MOR_POS_COL))
                    if dcounts.get(f, 0) <= MOR_BROADCAST_CAP:
                        pos = F.broadcast(pos)
                    one = one.join(pos, [MOR_POS_COL], "left_anti")
                    # anti-join keeps only left columns; order the
                    # metadata pair last so unionByName lines up
                    one = one.select(
                        *[c for c in one.columns
                          if c not in (MOR_FILE_COL, MOR_POS_COL)],
                        MOR_FILE_COL, MOR_POS_COL,
                    )
                if not with_pos:
                    one = one.drop(MOR_FILE_COL, MOR_POS_COL)
                parts.append(one)
    else:
        # plan-size fallback: one scan, per-row relative path
        if clean:
            parts.append(scan(clean, with_pos))
        if dirty:
            dels, n_actual = _del_side(dirty)
            dels = dels.select(
                F.col("file").alias(MOR_FILE_COL),
                F.col("pos").alias(MOR_POS_COL),
            )
            if n_actual <= MOR_BROADCAST_CAP:
                dels = F.broadcast(dels)
            cleaned = scan(dirty, True).join(
                dels, [MOR_FILE_COL, MOR_POS_COL], "left_anti"
            )
            if not with_pos:
                cleaned = cleaned.drop(MOR_FILE_COL, MOR_POS_COL)
            parts.append(cleaned)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_snapshot(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of: float | None = None,
    predicates: dict | None = None,
    keep_internal: bool = False,
    tag: str | None = None,
) -> DataFrame:
    """Read the table at ``version``, at the latest version committed at
    or before timestamp ``as_of``, at the version a ``tag`` pins, or
    (default) at the current pointer.

    ``predicates``: ``{col: (op, value)}`` with op in ``==, <, <=, >,
    >=, between`` (between → value=(lo, hi)). Files whose manifest
    min/max prove no match are never handed to Spark; the residual
    filter is applied to the survivors, so results equal a full scan +
    filter. Date/timestamp predicate values are ISO strings (how stats
    are stored; naive UTC for timestamps). Uncommitted snapshots
    (crashed writers) are invisible by construction — reads resolve
    through committed manifests only.

    Tables written through a partition transform carry an internal
    layout column (``_pt_bucket`` / ``_pt_transform``); it is dropped
    AFTER the residual filter so plain reads return the user schema
    (round-4 ADVICE: the scratch column must not leak into unions or
    oracle comparisons). ``keep_internal=True`` keeps it (debugging /
    layout inspection).
    """
    if tag is not None:
        if version is not None or as_of is not None:
            raise ValueError("pass exactly one of version / as_of / tag")
        version = resolve_tag(root, tag)
    v = _resolve_version(root, version, as_of)
    m = _read_manifest(root, v)
    files, _ = _plan_from_manifest(m, predicates)
    # _scan_files reads the explicit manifest schema (evolved columns
    # missing from old files read as NULL, no mergeSchema footer-scan)
    # and anti-joins out any merge-on-read delete positions
    df = _scan_files(spark, root, m, files)
    if predicates:
        df = df.filter(_residual_filter(predicates))
    if not keep_internal:
        df = _drop_internal(df, m)
    return df


BUCKET_COL = "_pt_bucket"


def _bucket_expr(col: str, n: int) -> Column:
    """THE bucket-id formula — the layout contract shared by the write
    side, the JVM probe fallback and the merge rewrite (round-5 review:
    three inline copies of a parity-critical expression; the pure-Python
    port in functions/xxhash.py is golden-tested against this)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n)).cast("int")


def write_snapshot_bucketed(
    df: DataFrame,
    root: str,
    col: str,
    n_buckets: int,
    n_files: int | None = None,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
) -> int:
    """Iceberg ``bucket(N, col)`` partition-transform write: a point
    lookup on an UNORDERED key can't use min/max stats (hash-scattered
    values span every file), so a deterministic bucket id
    (``pmod(xxhash64(col), N)``) is materialized as a narrow column,
    files are range-laid-out by it, and its per-file stats go in the
    manifest. ``read_snapshot_bucket_eq`` then turns ``col == v`` into
    a bucket-id prune — at 100 TB, a point lookup touches ~1/N of the
    files instead of all of them. The transform spec is recorded in the
    manifest meta; extra ``stats_cols`` still apply to other columns."""
    if mode == "append":
        parent = current_version(root)
        if parent is not None:
            pspec = _read_manifest(root, parent).get("meta", {}).get(
                "bucket_transform"
            )
            if pspec != {"col": col, "n": n_buckets}:
                # a spec mismatch (or a non-bucketed parent) would make
                # read_snapshot_bucket_eq prune/filter the parent's rows
                # with the wrong bucket ids — silently wrong answers
                raise ValueError(
                    f"bucketed append requires the parent's transform to "
                    f"match: parent has {pspec!r}, append wants "
                    f"{{'col': {col!r}, 'n': {n_buckets}}}"
                )
    laid_out = df.withColumn(BUCKET_COL, _bucket_expr(col, n_buckets)).repartitionByRange(
        n_files or n_buckets, BUCKET_COL
    )
    return write_snapshot(
        laid_out, root, mode=mode,
        stats_cols=[BUCKET_COL, *(stats_cols or [])],
        meta={**(meta or {}), "bucket_transform": {"col": col, "n": n_buckets}},
    )


_INT_RANGES = {
    "ByteType": (-(1 << 7), (1 << 7) - 1, "int"),
    "ShortType": (-(1 << 15), (1 << 15) - 1, "int"),
    "IntegerType": (-(1 << 31), (1 << 31) - 1, "int"),
    "LongType": (-(1 << 63), (1 << 63) - 1, "long"),
}


def _bucket_id_py(value, col_type, n: int) -> int | None:
    """Driver-side bucket id via the pure-Python xxhash64 port (round-4
    VERDICT item 6 — a point lookup should issue exactly ONE Spark job,
    the read). Returns None when the (value, type) pair is outside the
    golden-tested fast path — caller falls back to the 1-row JVM probe.
    Lossy probes (1.5 against a bigint column) raise, exactly like the
    JVM path's representability check."""
    from ..functions.xxhash import xxhash64_bytes, xxhash64_int, xxhash64_long

    tname = type(col_type).__name__
    if tname == "StringType":
        if not isinstance(value, str):
            return None  # cross-type coercion: keep the JVM's semantics
        return xxhash64_bytes(value.encode("utf-8")) % n
    if tname in _INT_RANGES:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            return None
        if isinstance(value, float):
            if not value.is_integer():
                raise ValueError(
                    f"probe value {value!r} is not exactly representable as "
                    f"the bucketed column's type {col_type.simpleString()}"
                )
            value = int(value)
        lo, hi, width = _INT_RANGES[tname]
        if not lo <= value <= hi:
            raise ValueError(
                f"probe value {value!r} is not exactly representable as "
                f"the bucketed column's type {col_type.simpleString()}"
            )
        h = xxhash64_long(value) if width == "long" else xxhash64_int(value)
        return h % n
    return None


def read_snapshot_bucket_eq(
    spark: SparkSession, root: str, value, version: int | None = None,
) -> DataFrame:
    """Point lookup through the bucket transform: resolve the manifest's
    recorded ``bucket(N, col)`` spec, compute the value's bucket id
    driver-side (pure-Python xxhash64 port, golden-tested against the
    JVM per type; exotic type/value pairs fall back to a 1-row Spark
    probe with identical semantics), and read only files whose
    bucket-id stats admit it; the exact equality filter runs on the
    survivors. Result equals a full scan + filter; int/long/string
    lookups issue exactly one Spark job — the read."""
    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    spec = m.get("meta", {}).get("bucket_transform")
    if not spec:
        raise ValueError(f"{root} v{v} was not written with a bucket transform")
    # the literal must hash EXACTLY like the stored column: cast it to
    # the column's manifest type (xxhash64 of int32 != xxhash64 of int64)
    col_type = StructType.fromJson(m["schema"])[spec["col"]].dataType
    lit = F.lit(value).cast(col_type)
    b = _bucket_id_py(value, col_type, spec["n"])
    if b is None:
        probe = spark.range(1).select(
            F.pmod(F.xxhash64(lit), F.lit(spec["n"])).cast("int").alias("b"),
            # a lossy cast (1.5 probing a bigint column truncates to 1)
            # would RETURN rows a full scan + filter would not — reject it
            (lit == F.lit(value)).alias("ok"),
        ).first()
        if not probe["ok"]:
            raise ValueError(
                f"probe value {value!r} is not exactly representable as the "
                f"bucketed column's type {col_type.simpleString()}"
            )
        b = probe["b"]
    # pin the read to the version whose spec we just resolved — a commit
    # landing between two resolutions must not pair v's bucket id with
    # v+1's files (snapshot isolation); read_snapshot drops the internal
    # bucket column after the residual filter
    df = read_snapshot(
        spark, root, version=v, predicates={BUCKET_COL: ("==", int(b))}
    )
    return df.filter(F.col(spec["col"]) == lit)


PT_COL = "_pt_transform"


def _drop_internal(df: DataFrame, manifest: dict) -> DataFrame:
    """Drop the internal layout column(s) a transformed table carries —
    applied by EVERY user-facing read path, including empty-result
    shortcuts (round-5 review: an idle incremental poll returned the
    scratch column while non-empty polls did not, breaking unionByName
    across cycles)."""
    meta = manifest.get("meta", {})
    internal = []
    if meta.get("bucket_transform"):
        internal.append(BUCKET_COL)
    if meta.get("partition_transform"):
        internal.append(PT_COL)
    return df.drop(*internal) if internal else df

def _to_date(v) -> datetime.date:
    if isinstance(v, datetime.datetime):
        return v.date()
    if isinstance(v, datetime.date):
        return v
    return datetime.date.fromisoformat(str(v)[:10])


def _transform_expr(kind: str, col: str, w) -> Column:
    """Spark-side transform value. Monotone by construction — that is
    what makes mapping range-predicate BOUNDS through the transform
    (driver-side, in ``_transform_value``) a sound pruning rule."""
    c = F.col(col)
    if kind == "year":
        return F.year(c).cast("long")
    if kind == "month":
        # months since year 0 — any monotone month index works
        return (F.year(c) * 12 + F.month(c) - 1).cast("long")
    if kind == "day":
        return F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("long")
    # truncate(W): ints → floor multiple of W (`c - pmod(c, W)` — exact
    # integer arithmetic, no double rounding on big longs); strings →
    # W-char prefix. Both monotone. The variant is resolved from the
    # COLUMN type at write time and recorded in the spec.
    if kind == "truncate_int":
        return c - F.pmod(c, F.lit(w))
    return F.substring(c, 1, int(w))


def _transform_value(kind: str, v, w):
    """Python-side transform of a predicate bound — must agree with
    ``_transform_expr`` exactly (stats are compared against these)."""
    if kind == "year":
        return _to_date(v).year
    if kind == "month":
        return _to_date(v).year * 12 + _to_date(v).month - 1
    if kind == "day":
        return (_to_date(v) - datetime.date(1970, 1, 1)).days
    if kind == "truncate_int":
        return v - (v % w)
    return str(v)[:w]


def _pt_dtype(kind: str) -> str:
    """Spark type of the materialized transform column — evolution may
    only move between transforms in the same lane (all the date +
    truncate(int) transforms are ``long``; truncate(str) is ``string``),
    or the shared ``_pt`` column's type would conflict across files."""
    return "string" if kind == "truncate_str" else "long"


def write_snapshot_transformed(
    df: DataFrame,
    root: str,
    transform: tuple,
    n_files: int | None = None,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
    evolve: bool = False,
) -> int:
    """Iceberg partition-transform write for the MONOTONE transforms:
    ``transform`` is ``("year"|"month"|"day", col)`` over a date/
    timestamp column or ``("truncate", W, col)`` over an int (floor
    multiple of W) or string (W-char prefix) column. The transform
    value is materialized as a narrow internal column, files are
    range-laid-out by it, and its per-file stats drive
    ``read_snapshot_transformed`` pruning — the reference's date-blocked
    access pattern (mapping/steps.ts:744-747) as a TABLE PROPERTY
    instead of a writer convention (round-4 VERDICT item 3: a plain
    range-partitioned write prunes only because the writer happened to
    sort; the recorded transform makes layout + pruning a contract that
    appends must honor). ``bucket(N, col)`` hashes — see
    ``write_snapshot_bucketed`` for the equality-probe variant."""
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType, StringType,
    )

    if transform[0] == "truncate":
        _, w, col = transform
        if not isinstance(w, int) or w < 1:
            raise ValueError(f"truncate width must be a positive int, got {w!r}")
        dt = df.schema[col].dataType
        if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
            kind = "truncate_int"
        elif isinstance(dt, StringType):
            kind = "truncate_str"
        else:
            raise ValueError(
                f"truncate supports int/string columns, {col!r} is "
                f"{dt.simpleString()}"
            )
    else:
        kind, col = transform
        w = None
        if kind not in ("year", "month", "day"):
            raise ValueError(f"unknown transform kind {kind!r}")
    spec = {"kind": kind, "col": col, "w": w}
    evo_data_name: str | None = None
    hook = None
    if mode == "append":
        # the spec guard + evolution bookkeeping run UNDER the commit
        # lock (write_snapshot's meta_fn), against the COMMIT-TIME
        # parent — a pre-lock parent read would race concurrent
        # transformed appends: the loser could publish a newest
        # manifest with stale or missing spec metadata and reads would
        # silently misprune (round-5 review finding). The data dir is
        # pre-named so the dir→spec map can include it.
        evo_data_name = f"{DATA_PREFIX}{uuid.uuid4().hex[:12]}"

        def hook(pm, _dn=evo_data_name):
            if pm is None:
                if evolve:
                    raise ValueError(
                        "partition evolution requires an existing "
                        "transformed parent (genesis appends record "
                        "their spec without evolve)")
                return {}
            pmeta = pm.get("meta", {})
            pspec = pmeta.get("partition_transform")
            pspecs = pmeta.get("partition_specs")
            if evolve and pspec is None:
                # an evolving append onto a plain or bucketed table
                # would commit parent files with NO layout column under
                # a transform spec — transformed reads would residual-
                # filter their NULL _pt and silently drop every parent
                # row (round-5 review finding)
                raise ValueError(
                    "partition evolution requires a transformed parent: "
                    "this table has no partition_transform (plain and "
                    "bucket-transformed tables cannot evolve)")
            if pspec != spec and not evolve:
                # mismatched layouts under one manifest would prune the
                # parent's files with the wrong transform values
                raise ValueError(
                    f"transformed append requires the parent's transform "
                    f"to match: parent has {pspec!r}, append wants "
                    f"{spec!r} (pass evolve=True to change the table's "
                    f"partition spec going forward — Iceberg partition "
                    f"evolution: existing files keep their layout and "
                    f"are pruned with the spec that produced them)"
                )
            if pspec is None or (pspec == spec and not pspecs):
                return {}
            # partition-evolution bookkeeping: every spec the table
            # has ever used (index = spec id) plus a data-dir →
            # spec-id map, so the read prunes each file with ITS
            # spec. Same-spec appends onto an evolved table go
            # through here too (the metadata must keep riding).
            specs_out = [dict(s) for s in (pspecs or [pspec])]
            for s in specs_out + [spec]:
                if _pt_dtype(s["kind"]) != _pt_dtype(spec["kind"]):
                    raise ValueError(
                        "partition evolution cannot cross layout-"
                        f"column types: table has {s!r} "
                        f"({_pt_dtype(s['kind'])}), append wants "
                        f"{spec!r} ({_pt_dtype(spec['kind'])})"
                    )
            if spec in specs_out:
                spec_id = specs_out.index(spec)
            else:
                specs_out.append(dict(spec))
                spec_id = len(specs_out) - 1
            dir_specs = dict(pmeta.get("partition_dir_specs") or {})
            if not dir_specs:
                # previously single-spec parent: all its dirs carry
                # the parent spec
                pid = specs_out.index(pspec)
                for f in pm["files"]:
                    dir_specs.setdefault(f.split("/", 1)[0], pid)
            dir_specs[_dn] = spec_id
            return {
                "partition_specs": specs_out,
                "partition_dir_specs": dir_specs,
            }
    laid_out = df.withColumn(PT_COL, _transform_expr(kind, col, w)).repartitionByRange(
        n_files or 8, PT_COL
    )
    return write_snapshot(
        laid_out, root, mode=mode,
        stats_cols=[PT_COL, *(stats_cols or [])],
        meta={**(meta or {}), "partition_transform": spec},
        data_name=evo_data_name,
        meta_fn=hook,
    )


def read_snapshot_transformed(
    spark: SparkSession,
    root: str,
    predicates: dict,
    version: int | None = None,
) -> DataFrame:
    """Pruned read through the recorded partition transform:
    ``predicates`` are on the SOURCE column(s); any predicate on the
    transform's source column is mapped to a transform-value predicate
    (bounds transformed driver-side — sound because the transforms are
    monotone: ``>``/``>=`` map to ``>= t(v)``, ``<``/``<=`` to
    ``<= t(v)``, ``==`` to ``== t(v)``, between to the transformed
    bounds), pruning files by the internal column's stats; the original
    predicates run as the residual filter, so the result equals a full
    scan + filter. The read pins the version whose spec it resolved
    (snapshot isolation), and the internal column is dropped by
    ``read_snapshot``."""
    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    meta = m.get("meta", {})
    spec = meta.get("partition_transform")
    if not spec:
        raise ValueError(
            f"{root} v{v} was not written with a partition transform"
        )
    _check_predicates(predicates)
    if not meta.get("partition_specs"):
        # single-spec table: one mapped predicate covers every file
        mapped = _map_through_spec(spec, predicates)
        full = dict(predicates)
        if mapped is not None:
            full[PT_COL] = mapped
        return read_snapshot(spark, root, version=v, predicates=full)
    # evolved table: prune each file with the spec that laid it out
    kept, _ = plan_files_transformed(root, predicates, version=v)
    df = _scan_files(spark, root, m, kept)
    df = df.filter(_residual_filter(predicates))
    return _drop_internal(df, m)


def _map_through_spec(spec: dict, predicates: dict):
    """The predicate on the spec's SOURCE column, mapped to a
    transform-value predicate — sound because the transforms are
    monotone and null-preserving (isnull/notnull map verbatim). None if
    no predicate touches the spec's column."""
    src = predicates.get(spec["col"])
    if src is None:
        return None
    kind, w = spec["kind"], spec.get("w")
    op, val = src
    if op in ("isnull", "notnull"):
        return (op, val)
    if op == "between":
        return ("between", (
            _transform_value(kind, val[0], w),
            _transform_value(kind, val[1], w),
        ))
    if op in (">", ">="):
        return (">=", _transform_value(kind, val, w))
    if op in ("<", "<="):
        return ("<=", _transform_value(kind, val, w))
    return ("==", _transform_value(kind, val, w))


def plan_files_transformed(
    root: str, predicates: dict, version: int | None = None,
) -> tuple[list[str], int]:
    """(relative files to scan, files skipped) for a transform-pruned
    read of an EVOLVED table (Iceberg partition evolution): each file is
    pruned with the partition spec that produced it — the manifest's
    ``partition_specs`` list (index = spec id) and ``partition_dir_specs``
    data-dir → spec-id map. Files from dirs with no recorded spec (e.g.
    a row-op rewrite, whose rows re-materialize under the CURRENT spec
    but may mix layouts within a file) are never transform-pruned —
    source-column stats and the residual filter still apply, so reads
    stay exact, just less pruned."""
    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    meta = m.get("meta", {})
    specs = meta.get("partition_specs")
    if not specs:
        spec = meta.get("partition_transform")
        if not spec:
            raise ValueError(
                f"{root} v{v} was not written with a partition transform")
        specs = [spec]
        dir_specs: dict = {f.split("/", 1)[0]: 0 for f in m["files"]}
    else:
        dir_specs = meta.get("partition_dir_specs") or {}
    _check_predicates(predicates)
    mapped_by_id = {
        sid: mp for sid, s in enumerate(specs)
        if (mp := _map_through_spec(s, predicates)) is not None
    }
    stats = m.get("file_stats", {})
    fr = m.get("file_rows", {})
    kept = []
    for f in m["files"]:
        preds = dict(predicates)
        sid = dir_specs.get(f.split("/", 1)[0])
        if sid is not None and sid in mapped_by_id:
            preds[PT_COL] = mapped_by_id[sid]
        if _file_can_match(stats.get(f), preds, fr.get(f)):
            kept.append(f)
    return kept, len(m["files"]) - len(kept)


SEMIJOIN_KEY_COL = "_sjk"


def read_snapshot_semijoin(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    col: str,
    version: int | None = None,
    keep_internal: bool = False,
) -> DataFrame:
    """Join-driven file pruning — the dynamic-partition-pruning idea
    applied to manifest stats (Iceberg runtime-filtering analog): the
    semi-join ``table ⋉ keys`` skips every data file whose ``col``
    min/max stats refute ALL probe keys BEFORE Spark lists it. At
    100 TB, joining a selective dimension (one nation's customers, one
    day's ids) against a key-clustered fact touches a handful of files
    instead of the table — the read-side twin of ``merge_snapshot``'s
    rewrite pruning, with the same two-tier ladder: exact keys (sorted
    + binary search per file range) up to ``MERGE_KEY_COLLECT_CAP``
    distinct values, then ``[min, max]`` overlap.

    ``keys`` is a single-column DataFrame of join keys (NULL keys never
    match, per SQL semi-join). The result is EXACTLY
    ``read_snapshot(...).join(keys.distinct(), col == key,
    "left_semi")``: survivors still pass through the semi-join, so a
    file kept by a coarse range is filtered row-exactly. Incomparable
    stat/key types (e.g. date stats stored as ISO strings vs date
    keys) keep the file conservatively, like the merge ladder."""
    import bisect

    if len(keys.columns) != 1:
        raise ValueError(
            f"keys must be a single-column DataFrame, got {keys.columns}"
        )
    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    schema = StructType.fromJson(m["schema"])
    if SEMIJOIN_KEY_COL in schema.fieldNames():
        raise ValueError(
            f"read_snapshot_semijoin reserves column name "
            f"{SEMIJOIN_KEY_COL!r}; the table must not contain it"
        )

    krows = (
        keys.select(F.col(f"`{keys.columns[0]}`").alias(SEMIJOIN_KEY_COL))
        .filter(F.col(SEMIJOIN_KEY_COL).isNotNull())
        .distinct()
    )
    vals = [
        r[SEMIJOIN_KEY_COL]
        for r in krows.limit(MERGE_KEY_COLLECT_CAP + 1).collect()
    ]
    exact = len(vals) <= MERGE_KEY_COLLECT_CAP
    if exact:
        if not vals:  # empty key set: the semi-join is empty by definition
            return _drop_internal(spark.createDataFrame([], schema), m)
        vals.sort()
        kmin, kmax = vals[0], vals[-1]
    else:
        row = krows.agg(
            F.min(SEMIJOIN_KEY_COL).alias("lo"),
            F.max(SEMIJOIN_KEY_COL).alias("hi"),
        ).first()
        vals, kmin, kmax = [], row["lo"], row["hi"]

    stats = m.get("file_stats", {})
    kept = []
    for f in m["files"]:
        st = stats.get(f, {}).get(col)
        if st is None or "min" not in st:
            kept.append(f)
            continue
        mn, mx = st["min"], st["max"]
        try:
            if exact:
                i = bisect.bisect_left(vals, mn)
                hit = i < len(vals) and vals[i] <= mx
            else:
                hit = not (kmax < mn or kmin > mx)
        except TypeError:
            hit = True  # incomparable stat/key types: conservative
        if hit:
            kept.append(f)

    df = _scan_files(spark, root, m, kept)
    if exact:
        # the semi-join probes the EXACT collected set, so pruning and
        # filtering are decided by the same values by construction
        kdf = F.broadcast(
            spark.createDataFrame([(x,) for x in vals], krows.schema)
        )
    else:
        kdf = krows  # above the cap: let AQE pick the join strategy
    out = df.join(
        kdf, F.col(f"`{col}`") == F.col(SEMIJOIN_KEY_COL), "left_semi"
    )
    if not keep_internal:
        out = _drop_internal(out, m)
    return out


def plan_files_semijoin(
    root: str, col: str, key_values: list, version: int | None = None
) -> tuple[list[str], int]:
    """Driver-side pruning census for :func:`read_snapshot_semijoin`
    with a concrete key list (exact ladder only): (kept absolute
    files, skipped count) — lets tests assert skip counts without a
    Spark job, like :func:`plan_files`."""
    import bisect

    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    if not key_values:  # empty key set: the semi-join is empty
        return [], len(m["files"])
    vals = sorted(key_values)
    stats = m.get("file_stats", {})
    kept, skipped = [], 0
    for f in m["files"]:
        st = stats.get(f, {}).get(col)
        if st is None or "min" not in st:
            kept.append(os.path.join(root, f))
            continue
        try:
            i = bisect.bisect_left(vals, st["min"])
            hit = i < len(vals) and vals[i] <= st["max"]
        except TypeError:
            hit = True
        if hit:
            kept.append(os.path.join(root, f))
        else:
            skipped += 1
    return kept, skipped


# Durable meta keys that ride every merge/delete commit (the rewrite
# preserves the layout property, so the spec stays true; batch_id_hwm
# must survive retention — see publish_batch_versioned). Plain appends
# inherit ONLY batch_id_hwm: auto-carrying a transform spec onto an
# append whose files lack the layout column would make point lookups
# silently MISS those rows, so bucketed/transformed appends must go
# through their validating writers instead.
_DURABLE_ROW_OP_META = (
    "batch_id_hwm", "bucket_transform", "partition_transform",
    "mv_src_version",
    # partition-evolution bookkeeping must survive row ops, or a pruned
    # read after an update would map EVERY file through the current
    # spec — wrongly pruning old-spec files. Rewrite dirs are simply
    # absent from the dir map (their files may mix layouts), which the
    # evolved read treats as never-transform-prunable: exact, unpruned.
    "partition_specs", "partition_dir_specs",
)


def _parent_stats_cols(pm: dict, extra: list[str]) -> list[str]:
    cols = {c for st in pm.get("file_stats", {}).values() for c in st}
    cols.update(extra)
    return sorted(cols)


def _row_op_commit(
    spark: SparkSession,
    root: str,
    plan,
    meta: dict | None,
    op: str,
) -> int | None:
    """Shared copy-on-write commit for row-level ops (merge / delete /
    compact).

    Runs ENTIRELY under the commit lock (single-writer discipline): the
    target version is the pointer read after lock acquisition, and
    EVERY decision — file classification, rewrite plan, no-op bailout —
    is made by ``plan(pm)`` against that locked manifest (round-5
    review: an unlocked peek can disagree with the lock-time state).
    ``plan(pm)`` returns None for "nothing to do" (the lock is
    released, no version commits, the op returns None) or a
    ``(touched_rel_files, kept_rel_files, build_rewrite)`` triple;
    ``build_rewrite(src)`` maps the touched rows to their replacement
    rows. The new version lists kept files UNCHANGED (no data copy —
    their stats carry over) plus the newly written files; the pointer
    swap stays the sole commit point, so a crash mid-rewrite leaves
    the table at the old version with only an orphan dir for the next
    writer to GC.
    """
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    lock_path = os.path.join(root, LOCK)
    fd = None
    try:
        fd = _acquire_lock(root)
        _gc_orphans(root)
        parent = current_version(root)
        if parent is None:
            raise FileNotFoundError(f"{root} has no committed version to {op}")
        pm = _read_manifest(root, parent)
        schema = StructType.fromJson(pm["schema"])
        planned = plan(pm)
        if planned is None:
            return None
        touched, kept, build_rewrite = planned

        # delete-aware scan: touched files' merge-on-read positions are
        # applied BEFORE the rewrite (a raw read would resurrect
        # deleted rows into the new files) — the rewrite therefore
        # ABSORBS those deletes; kept files keep their entries below
        src = _scan_files(spark, root, pm, touched, schema=schema)
        rewritten = build_rewrite(src)

        data_name = f"{DATA_PREFIX}{uuid.uuid4().hex[:12]}"
        data_dir = os.path.join(root, data_name)
        obs = Observation(f"{op}_{uuid.uuid4().hex[:8]}")
        observed = rewritten.observe(obs, F.count(F.lit(1)).alias("rows"))
        observed.write.mode("error").parquet(data_dir)
        n = int(obs.get["rows"])

        new_files = [
            f"{data_name}/{f}" for f in sorted(os.listdir(data_dir))
            if f.endswith(".parquet")
        ]
        stats_cols = _parent_stats_cols(pm, [])
        new_stats = {}
        if stats_cols:
            new_stats = {
                f"{data_name}/{name}": st
                for name, st in _collect_file_stats(data_dir, stats_cols).items()
            }
        parent_stats = pm.get("file_stats", {})
        parent_rows = pm.get("file_rows", {})
        new_rows = {
            f"{data_name}/{name}": r
            for name, r in _file_row_counts(data_dir).items()
        }
        version = parent + 1
        meta_out = dict(meta or {})
        for k in _DURABLE_ROW_OP_META:
            if k in pm.get("meta", {}) and k not in meta_out:
                meta_out[k] = pm["meta"][k]
        # kept files keep their merge-on-read delete entries; touched
        # files' entries were absorbed by the delete-aware rewrite scan
        pdel, pdelc = _delete_map(pm), pm.get("delete_counts", {})
        _publish_manifest(root, version, {
            "version": version,
            "parent": parent,
            "mode": op,
            "files": kept + new_files,
            "file_stats": {
                **{f: parent_stats[f] for f in kept if f in parent_stats},
                **new_stats,
            },
            "file_rows": {
                **{f: parent_rows[f] for f in kept if f in parent_rows},
                **new_rows,
            },
            "delete_files": {f: pdel[f] for f in kept if f in pdel},
            "delete_counts": {f: pdelc[f] for f in kept if f in pdelc},
            "schema": pm["schema"],
            "rows_written": n,
            "committed_at": time.time(),
            "meta": meta_out,
        })
        return version
    finally:
        if fd is not None:
            os.close(fd)
            os.unlink(lock_path)


# above this many distinct merge keys, per-file pruning falls back to a
# [min,max] range-overlap test instead of collecting every key
MERGE_KEY_COLLECT_CAP = 100_000


def merge_snapshot(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
    meta: dict | None = None,
) -> int:
    """Copy-on-write MERGE (upsert) — the Iceberg row-level-update
    analog: every current row whose ``key`` appears in ``updates`` is
    replaced by the update row, update rows with unseen keys are
    inserted, and ONLY files that can possibly contain a matching key
    are rewritten — files whose manifest min/max stats refute every
    update key are listed unchanged in the new version (at 100 TB the
    difference between a CDC batch touching a handful of files and
    rewriting the table). Pruning is exact-key (sorted keys + binary
    search per file range) up to MERGE_KEY_COLLECT_CAP distinct keys,
    then degrades to [min,max] range overlap. ``updates`` must be
    unique on ``key`` (raises otherwise — one replacement per target
    row is the contract) and must carry the table's user schema.
    Bucketed/transformed tables are supported: the internal layout
    column is recomputed from the recorded spec for the rewritten rows,
    so the table property (and its point-lookup pruning) survives the
    merge. Snapshot isolation + atomicity as write_snapshot: rewrite
    runs under the commit lock, pointer swap is the sole commit point,
    old versions stay time-travel readable.
    """
    from pyspark import StorageLevel

    # Materialize the CDC frame once (round-5 review: the dup-check, the
    # key collection and the locked rewrite each re-evaluated the plan —
    # up to 4x the input cost, and a non-deterministic source could make
    # the pruning key set disagree with the rows actually written). If
    # the CALLER already persisted it, respect their cache — persisting
    # over it is a no-op and unpersisting would evict what they own.
    we_persisted = updates.storageLevel == StorageLevel.NONE
    if we_persisted:
        updates = updates.persist(StorageLevel.DISK_ONLY)
    try:
        dup = updates.groupBy(key).count().filter(
            F.col("count") > 1).limit(1).count()
        if dup:
            raise ValueError(f"merge updates must be unique on {key!r}")

        krows = updates.select(F.col(f"`{key}`").alias("_mk")).filter(
            F.col("_mk").isNotNull()
        ).distinct()
        keys = [r["_mk"] for r in krows.limit(MERGE_KEY_COLLECT_CAP + 1).collect()]
        exact = len(keys) <= MERGE_KEY_COLLECT_CAP
        if exact:
            keys.sort()
            kmin, kmax = (keys[0], keys[-1]) if keys else (None, None)
            # the anti-join uses the EXACT collected key set, so pruning
            # and rewrite are decided by the same values by construction
            anti = updates.sparkSession.createDataFrame(
                [(k,) for k in keys], krows.schema
            ) if keys else krows
        else:
            # fallback pruning bounds must be the TRUE extremes — a
            # truncated sample's min/max would wrongly keep files that
            # hold unsampled keys and duplicate those rows (round-5
            # review, the one real correctness bug of this family)
            row = krows.agg(F.min("_mk").alias("lo"), F.max("_mk").alias("hi")).first()
            keys, kmin, kmax = [], row["lo"], row["hi"]
            anti = krows

        def plan(pm: dict):
            import bisect

            schema = StructType.fromJson(pm["schema"])
            user_cols = [
                f.name for f in schema.fields if f.name not in (BUCKET_COL, PT_COL)
            ]
            if sorted(c for c in updates.columns) != sorted(user_cols):
                raise ValueError(
                    f"merge updates schema {sorted(updates.columns)} must "
                    f"match the table's user columns {sorted(user_cols)}"
                )
            stats = pm.get("file_stats", {})
            touched, kept = [], []
            for f in pm["files"]:
                st = stats.get(f, {}).get(key)
                if st is None or "min" not in st or kmin is None:
                    touched.append(f)
                    continue
                mn, mx = st["min"], st["max"]
                try:
                    if exact:
                        i = bisect.bisect_left(keys, mn)
                        hit = i < len(keys) and keys[i] <= mx
                    else:
                        hit = not (kmax < mn or kmin > mx)
                except TypeError:
                    hit = True  # incomparable stat/key types: conservative
                (touched if hit else kept).append(f)

            bspec = pm.get("meta", {}).get("bucket_transform")
            tspec = pm.get("meta", {}).get("partition_transform")

            def build_rewrite(src: DataFrame):
                survivors = src.join(
                    anti, F.col(f"`{key}`") == F.col("_mk"), "left_anti")
                up = updates
                if bspec:
                    up = up.withColumn(
                        BUCKET_COL, _bucket_expr(bspec["col"], bspec["n"]))
                if tspec:
                    up = up.withColumn(
                        PT_COL,
                        _transform_expr(tspec["kind"], tspec["col"], tspec.get("w")),
                    )
                return survivors.unionByName(up.select(*src.columns))

            return touched, kept, build_rewrite

        v = _row_op_commit(spark, root, plan, meta, "merge")
        assert v is not None  # merge always commits
        return v
    finally:
        if we_persisted:
            updates.unpersist()


def delete_where(
    spark: SparkSession,
    root: str,
    predicates: dict,
    meta: dict | None = None,
) -> int:
    """Copy-on-write row-level DELETE: rows satisfying every predicate
    (same ``{col: (op, value)}`` grammar as ``read_snapshot``) are
    removed; files whose stats prove no row matches are listed
    unchanged — only files that CAN match are rewritten with the
    negated filter. SQL DELETE semantics: a row whose predicate
    evaluates NULL (e.g. a NULL key under ``==``) is NOT deleted.
    Internal layout columns pass through the rewrite untouched, so
    bucketed/transformed tables keep their property. An EMPTY
    predicates dict is refused: the vacuous residual is TRUE, so it
    would silently truncate the whole table (round-5 review) — use
    ``write_snapshot(empty_df, root)`` to truncate on purpose."""
    if not predicates:
        raise ValueError(
            "delete_where with no predicates would delete every row; "
            "commit an empty overwrite snapshot to truncate deliberately"
        )
    _check_predicates(predicates)

    def plan(pm: dict):
        stats = pm.get("file_stats", {})
        fr = pm.get("file_rows", {})
        touched, kept = [], []
        for f in pm["files"]:
            (touched if _file_can_match(
                stats.get(f), predicates, fr.get(f)) else kept).append(f)

        def build_rewrite(src: DataFrame):
            return src.filter(
                ~F.coalesce(_residual_filter(predicates), F.lit(False)))

        return touched, kept, build_rewrite

    v = _row_op_commit(spark, root, plan, meta, "delete")
    assert v is not None  # delete always commits
    return v


def update_where(
    spark: SparkSession,
    root: str,
    predicates: dict,
    assignments: dict,
    meta: dict | None = None,
) -> int | None:
    """Copy-on-write row-level UPDATE — completes the row-op triad
    (merge = keyed upsert, delete = predicate removal, update =
    predicate mutation): rows satisfying every predicate (same
    ``{col: (op, value)}`` grammar as ``read_snapshot``) get
    ``assignments`` applied ({col: Column expression or literal};
    expressions may reference the row's own columns, e.g.
    ``F.col("price") * 1.1``); all other rows pass through unchanged.
    SQL UPDATE semantics: a row whose predicate evaluates NULL is NOT
    updated. Only files whose stats admit a match are rewritten — the
    rest are listed unchanged (at 100 TB, a targeted correction touches
    a handful of files, never the table). Assigned values are cast to
    the column's manifest type, so the schema cannot drift. On a
    bucketed/transformed table, assigning the layout SOURCE column
    recomputes the internal layout column for the rewritten rows, so
    point-lookup pruning stays sound; assigning internal columns
    directly is refused. Merge-on-read delete positions on touched
    files are applied before the rewrite (absorbed), like every row op.

    Returns the new version, or None when no file can match (no
    commit). An empty predicate dict is refused — an intentional
    full-table mutation should be an explicit overwrite commit."""
    if not predicates:
        raise ValueError(
            "update_where with no predicates would rewrite every row; "
            "commit an overwrite snapshot to transform the whole table"
        )
    if not assignments:
        raise ValueError("update_where needs at least one assignment")
    _check_predicates(predicates)

    def plan(pm: dict):
        schema = StructType.fromJson(pm["schema"])
        names = set(schema.fieldNames())
        for c in assignments:
            if c in (BUCKET_COL, PT_COL, MOR_FILE_COL, MOR_POS_COL):
                raise ValueError(
                    f"column {c!r} is internal — assign the layout "
                    "SOURCE column and the layout recomputes"
                )
            if c not in names:
                raise ValueError(
                    f"assignment target {c!r} is not a table column "
                    f"({sorted(names)})"
                )
        stats = pm.get("file_stats", {})
        fr = pm.get("file_rows", {})
        touched = [
            f for f in pm["files"]
            if _file_can_match(stats.get(f), predicates, fr.get(f))
        ]
        if not touched:
            return None
        kept = [f for f in pm["files"] if f not in set(touched)]
        bspec = pm.get("meta", {}).get("bucket_transform")
        tspec = pm.get("meta", {}).get("partition_transform")

        def build_rewrite(src: DataFrame):
            cond = F.coalesce(_residual_filter(predicates), F.lit(False))
            cols = []
            for fdef in schema.fields:
                cur = F.col(f"`{fdef.name}`")
                if fdef.name in assignments:
                    v = assignments[fdef.name]
                    newc = v if isinstance(v, Column) else F.lit(v)
                    cols.append(
                        F.when(cond, newc.cast(fdef.dataType))
                        .otherwise(cur).alias(fdef.name)
                    )
                else:
                    cols.append(cur.alias(fdef.name))
            out = src.select(*cols)
            if bspec and bspec["col"] in assignments:
                out = out.withColumn(
                    BUCKET_COL, _bucket_expr(bspec["col"], bspec["n"]))
            if tspec and tspec["col"] in assignments:
                out = out.withColumn(
                    PT_COL,
                    _transform_expr(tspec["kind"], tspec["col"], tspec.get("w")),
                )
            return out

        return touched, kept, build_rewrite

    return _row_op_commit(spark, root, plan, meta, "update")


def delete_where_mor(
    spark: SparkSession,
    root: str,
    predicates: dict,
    meta: dict | None = None,
    max_positions: int = 5_000_000,
) -> int | None:
    """Merge-on-read row-level DELETE (Iceberg v2 position-delete
    analog): instead of rewriting every file that can match (what
    ``delete_where`` does), commit a tiny parquet of ``(file, pos)``
    positions; every read path anti-joins them back out via
    ``_scan_files``. At 100 TB, dropping a few rows from a terabyte
    partition becomes a kilobyte write — the data files, their stats
    and their cached scans are untouched. Same predicate grammar and
    SQL NULL semantics as ``delete_where``; files whose stats refute
    the predicate are never scanned. Positions are computed AGAINST the
    visible rows (existing deletes applied first), so a position is
    recorded at most once and per-file delete counts stay exact.

    Returns the new version, or None when no row matches (no commit).
    Refuses (ValueError) when more than ``max_positions`` rows match:
    the read-side anti-join is sized for sparse deletes — bulk deletes
    belong in copy-on-write ``delete_where``, and ``compact_snapshot``
    absorbs accumulated positions back into clean files."""
    import pyarrow.parquet as pq

    if not predicates:
        raise ValueError(
            "delete_where_mor with no predicates would delete every row; "
            "commit an empty overwrite snapshot to truncate deliberately"
        )
    _check_predicates(predicates)
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    lock_path = os.path.join(root, LOCK)
    fd = None
    try:
        fd = _acquire_lock(root)
        _gc_orphans(root)
        parent = current_version(root)
        if parent is None:
            raise FileNotFoundError(
                f"{root} has no committed version to delete from")
        pm = _read_manifest(root, parent)
        stats = pm.get("file_stats", {})
        fr = pm.get("file_rows", {})
        candidates = [
            f for f in pm["files"]
            if _file_can_match(stats.get(f), predicates, fr.get(f))
        ]
        if not candidates:
            return None
        src = _scan_files(spark, root, pm, candidates, with_pos=True)
        # SQL DELETE semantics: a row whose predicate evaluates NULL is
        # NOT deleted — only a definite TRUE records a position
        matches = src.filter(
            F.coalesce(_residual_filter(predicates), F.lit(False))
        ).select(
            F.col(MOR_FILE_COL).alias("file"),
            F.col(MOR_POS_COL).alias("pos"),
        )
        data_name = f"{DATA_PREFIX}{uuid.uuid4().hex[:12]}"
        data_dir = os.path.join(root, data_name)
        matches.coalesce(1).write.mode("error").parquet(data_dir)
        del_files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet"))
        # per-file position counts from the (tiny) delete parquet itself
        # — driver-side pyarrow, no second job
        counts: dict[str, int] = {}
        total = 0
        for name in del_files:
            t = pq.read_table(os.path.join(data_dir, name), columns=["file"])
            total += t.num_rows
            for fval, n in zip(*_value_counts(t.column("file"))):
                counts[fval] = counts.get(fval, 0) + n
        if total == 0:
            shutil.rmtree(data_dir, ignore_errors=True)
            return None
        if total > max_positions:
            shutil.rmtree(data_dir, ignore_errors=True)
            raise ValueError(
                f"{total} rows match — above max_positions="
                f"{max_positions}; a delete this large should rewrite "
                "files via copy-on-write delete_where instead of "
                "accumulating merge-on-read positions"
            )
        new_rel = [f"{data_name}/{n}" for n in del_files]
        dmap = {f: list(d) for f, d in _delete_map(pm).items()}
        dcounts = dict(pm.get("delete_counts", {}))
        for f in counts:
            dmap[f] = dmap.get(f, []) + new_rel
            dcounts[f] = dcounts.get(f, 0) + counts[f]
        version = parent + 1
        meta_out = dict(meta or {})
        for k in _DURABLE_ROW_OP_META:
            if k in pm.get("meta", {}) and k not in meta_out:
                meta_out[k] = pm["meta"][k]
        _publish_manifest(root, version, {
            "version": version,
            "parent": parent,
            "mode": "mor_delete",
            "files": pm["files"],
            "file_stats": pm.get("file_stats", {}),
            "file_rows": pm.get("file_rows", {}),
            "delete_files": dmap,
            "delete_counts": dcounts,
            "schema": pm["schema"],
            "rows_written": 0,
            "rows_deleted": total,
            "committed_at": time.time(),
            "meta": meta_out,
        })
        return version
    finally:
        if fd is not None:
            os.close(fd)
            os.unlink(lock_path)


def _value_counts(arr) -> tuple[list[str], list[int]]:
    """(values, counts) of a pyarrow string column — tiny driver-side
    tally for the delete writer's per-file bookkeeping."""
    import pyarrow.compute as pc

    vc = pc.value_counts(arr)
    return (
        [str(v) for v in vc.field("values").to_pylist()],
        [int(n) for n in vc.field("counts").to_pylist()],
    )


def compact_snapshot(
    spark: SparkSession,
    root: str,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_files: int | None = None,
    meta: dict | None = None,
) -> int | None:
    """Compaction (Iceberg ``rewrite_data_files`` analog): coalesce the
    current version's files SMALLER than ``small_file_bytes`` into
    ``target_files`` outputs (default: their total size ÷ the
    threshold, at least 1); files already at/above the threshold are
    listed unchanged. Purely physical — row set, schema, layout
    columns and durable meta are untouched, old versions stay
    readable; returns the new version, or None when fewer than two
    small files exist (nothing to gain). The operation streaming
    publish needs at scale: ``maxFilesPerTrigger``-grained appends
    accrete file counts linearly, and manifests + scan planning are
    per-file. Stats for layout/stat columns are re-collected from the
    rewritten files' footers, so pruning keeps working (a compacted
    file spanning several old ranges simply carries the merged range).
    The small-file census, the no-op decision AND the output-file count
    are all computed under the commit lock against the resolved
    manifest (round-5 review: an unlocked peek could disagree with the
    lock-time file set and coalesce 52 files into a stale n_out of 1)."""

    def plan(pm: dict):
        sizes = {f: os.path.getsize(os.path.join(root, f)) for f in pm["files"]}
        dmap = _delete_map(pm)
        # delete-bearing files are touched REGARDLESS of size (Iceberg
        # rewrite_position_deletes analog): compaction is how
        # accumulated merge-on-read positions get absorbed back into
        # clean files, restoring join-free scans and exact stats
        touched = [
            f for f in pm["files"] if sizes[f] < small_file_bytes or f in dmap
        ]
        kept = [f for f in pm["files"] if f not in set(touched)]
        if len(touched) < 2 and not any(f in dmap for f in touched):
            return None
        n_out = target_files or max(
            1, sum(sizes[f] for f in touched) // small_file_bytes)

        def build_rewrite(src: DataFrame):
            return src.coalesce(int(n_out))

        return touched, kept, build_rewrite

    return _row_op_commit(spark, root, plan, meta, "compact")


def _zvalue_expr(a16: Column, b16: Column) -> Column:
    """Bit-interleave two 16-bit lane values into a 32-bit Morton
    (Z-order) value — pure shift/or column expressions, no UDF.
    Lanes MUST be bigint: with int32 lanes, bit 15 of ``a16`` shifts
    into the int sign bit, every upper-half-of-a row goes negative and
    range-partitions BEFORE the lower half — the opposite of Morton
    order (pruning stays sound — stats are on source columns — but the
    clustering this layout exists for silently degrades)."""
    import functools
    import operator

    terms = []
    for i in range(16):
        terms.append(
            F.shiftleft(F.shiftright(a16, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(
            F.shiftleft(F.shiftright(b16, i).bitwiseAND(F.lit(1)), 2 * i))
    return functools.reduce(operator.add, terms)


def write_snapshot_zordered(
    df: DataFrame,
    root: str,
    cols: tuple,
    n_files: int = 8,
    mode: str = "overwrite",
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
) -> int:
    """Z-ORDER layout write (Iceberg ``rewrite_data_files`` with a
    zorder strategy, as a write-time property): files are clustered by
    the Morton interleave of two numeric/date columns, so a predicate
    on EITHER dimension — or a box on both — prunes files. Soundness
    never depends on the z-value: per-file min/max of the SOURCE
    columns go in the manifest, and ``read_snapshot(predicates=...)``
    prunes with those; the interleave only makes the layout cluster
    both dimensions at once, which is what makes the pruning BITE
    (a single-column range layout answers boxes on the other column
    with a full scan). Lane values are 16-bit linear ranks between the
    column's global min/max (ONE tiny aggregation covering both lanes,
    no global sort); the scratch z column never lands in the files."""
    from pyspark.sql.types import DateType, TimestampNTZType

    ca, cb = cols

    def _numeric(c: str):
        col = F.col(c)
        dt = df.schema[c].dataType
        if isinstance(dt, DateType):
            col = F.datediff(col, F.lit("1970-01-01"))
        elif isinstance(dt, TimestampNTZType):
            col = col.cast("timestamp")  # NTZ → LTZ(UTC session) → seconds
        return col.cast("double")

    na, nb = _numeric(ca), _numeric(cb)
    bounds = df.agg(
        F.min(na).alias("alo"), F.max(na).alias("ahi"),
        F.min(nb).alias("blo"), F.max(nb).alias("bhi"),
    ).first()

    def _lane(col: Column, lo, hi):
        # bigint, not int: bit 15 must not land in an int32 sign bit
        # when _zvalue_expr shifts it to position 31.
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("bigint")
        return F.least(
            F.lit(65535).cast("bigint"),
            F.floor((col - F.lit(float(lo)))
                    / F.lit((float(hi) - float(lo)) / 65535.0)).cast("bigint"),
        )

    zed = df.withColumn("_pt_z", _zvalue_expr(
        _lane(na, bounds["alo"], bounds["ahi"]),
        _lane(nb, bounds["blo"], bounds["bhi"])))
    laid_out = zed.repartitionByRange(n_files, "_pt_z").drop("_pt_z")
    return write_snapshot(
        laid_out, root, mode=mode,
        stats_cols=[ca, cb, *(stats_cols or [])],
        meta={**(meta or {}), "zorder": {"cols": [ca, cb]}},
    )


def rollback_to(root: str, version: int) -> int:
    """Iceberg ``rollback_to_snapshot`` analog: commit a NEW version
    whose file list, stats and schema are exactly those of committed
    ``version`` — no data copy, history preserved (the bad versions
    stay time-travel readable until expired), and every reader flips
    atomically via the pointer swap. Durable meta (batch-id HWM,
    transform specs) comes from the ROLLED-BACK-TO manifest: the table
    state is that snapshot's, so its layout contract applies; the HWM
    keeps the max of both manifests so a rollback can never re-open
    already-published streaming batches for duplication."""
    lock_path = os.path.join(root, LOCK)
    fd = _acquire_lock(root)
    try:
        _gc_orphans(root)
        ptr = current_version(root)
        if ptr is None:
            raise FileNotFoundError(f"{root} has no committed version")
        if version == ptr:
            return ptr
        if version not in _committed_versions(root):
            raise FileNotFoundError(f"{root} has no committed version {version}")
        target = _read_manifest(root, version)
        head = _read_manifest(root, ptr)
        meta_out = dict(target.get("meta", {}))
        hwms = [
            m.get("batch_id_hwm") for m in (target.get("meta", {}), head.get("meta", {}))
            if m.get("batch_id_hwm") is not None
        ]
        if hwms:
            meta_out["batch_id_hwm"] = max(hwms)
        new_version = ptr + 1
        _publish_manifest(root, new_version, {
            "version": new_version,
            "parent": ptr,
            "mode": "rollback",
            "files": target["files"],
            "file_stats": target.get("file_stats", {}),
            "file_rows": target.get("file_rows", {}),
            "delete_files": target.get("delete_files", {}),
            "delete_counts": target.get("delete_counts", {}),
            "schema": target["schema"],
            "rows_written": 0,
            "committed_at": time.time(),
            "meta": {**meta_out, "rolled_back_to": version},
        })
        return new_version
    finally:
        os.close(fd)
        os.unlink(lock_path)


def read_appended(
    spark: SparkSession,
    root: str,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Incremental read (Iceberg incremental-append scan analog): the
    rows ADDED between ``since_version`` (exclusive) and ``version``
    (default: current) — the consumption primitive that lets a
    downstream pipeline process only each new publish instead of
    re-scanning the table (at 100 TB, the difference between reading a
    micro-batch and reading everything). Sound only across
    append-lineage: if any commit in the range rewrote or dropped files
    (overwrite / merge / delete / compact / rollback), a file diff is
    not a row delta and this raises — fall back to a snapshot diff or
    re-read. Reads exactly the files the newer manifests added, with
    the end version's schema."""
    hi = _resolve_version(root, version, None)
    if since_version == hi:
        end = _read_manifest(root, hi)
        schema = StructType.fromJson(end["schema"])
        return _drop_internal(spark.createDataFrame([], schema), end)
    if since_version not in _committed_versions(root):
        raise FileNotFoundError(
            f"{root} has no committed version {since_version} (expired?)"
        )
    if since_version > hi:
        raise ValueError(f"since_version {since_version} is newer than {hi}")
    delta, end = plan_appended_files(root, since_version, hi)
    schema = StructType.fromJson(end["schema"])
    if not delta:
        return _drop_internal(spark.createDataFrame([], schema), end)
    return _drop_internal(
        spark.read.schema(schema).parquet(
            *[os.path.join(root, f) for f in delta]),
        end,
    )


def plan_appended_files(
    root: str, since_version: int, version: int,
    genesis_exempt: bool = False,
) -> tuple[list[str], dict]:
    """The shared append-lineage contract behind :func:`read_appended`
    and the ``versioned_appends`` streaming source: relative paths of
    files added in ``(since_version, version]`` plus the end manifest,
    raising when any commit in the window rewrote files (a file diff is
    only a row delta across pure appends). ``since_version=0`` means
    from genesis (every file at ``version``); ``genesis_exempt`` allows
    version 1 any mode — it is the table's initial data, not a rewrite
    of consumed rows (the streaming source's contract)."""
    end = _read_manifest(root, version)
    v, m = version, end
    while v > since_version:
        if m["mode"] != "append" and not (genesis_exempt and v == 1):
            raise ValueError(
                f"version {v} is a {m['mode']!r} commit — the range "
                f"({since_version}, {version}] is not pure append "
                "lineage, a file diff is not a row delta; re-read the "
                "snapshot (or use the read_changes CDC feed)"
            )
        parent = m["parent"]
        if parent is None:
            if since_version > 0:
                raise ValueError(
                    f"version {since_version} not on {version}'s lineage")
            break
        v, m = parent, _read_manifest(root, parent)
    if since_version > 0 and v != since_version:
        # a parent link that jumps past since_version (rollback-style
        # lineage) must not silently diff against the wrong base
        raise ValueError(
            f"version {since_version} not on {version}'s lineage")
    base = set(m["files"]) if since_version > 0 else set()
    return [f for f in end["files"] if f not in base], end


CHANGE_TYPE_COL = "_change_type"
CHANGE_VERSION_COL = "_change_version"


def read_changes(
    spark: SparkSession,
    root: str,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Row-level change feed (Iceberg changelog / CDC scan analog): one
    row per change between ``since_version`` (exclusive) and ``version``
    (default: current), with the table's visible columns plus
    ``_change_type`` ('insert' | 'delete') and ``_change_version`` (the
    commit that made the change). An update surfaces as delete(old) +
    insert(new) at the same version — standard CoW changelog form.

    Completes :func:`read_appended`: where that refuses any rewrite
    commit, this computes the commit's true row delta as the symmetric
    MULTISET difference (``exceptAll`` both ways) between the rows of
    the files the commit removed and the files it added. Untouched rows
    that a copy-on-write rewrite carried into new files appear on both
    sides and cancel, so the feed is row-level even though the storage
    diff is file-level.

    Scale shape: per commit, only the CHANGED files are scanned —
    append commits read just the added files with no diff at all
    (merge_snapshot/delete_where already rewrite minimally, so cost is
    proportional to churn, never table size); the two exceptAll sides
    shuffle once on full rows. ``compact_snapshot`` commits are skipped
    outright: compaction is row-preserving by contract (rewrite runs
    under the commit lock and is no-op-tested), so the feed is silent
    across it instead of paying a diff that provably cancels.

    Changes compose across evolved schemas: each commit's delta uses
    that commit's schema (old files' new columns read as NULL), and
    commits are unioned by name with missing columns as NULL.
    """
    hi = _resolve_version(root, version, None)
    if since_version not in _committed_versions(root):
        raise FileNotFoundError(
            f"{root} has no committed version {since_version} (expired?)"
        )
    if since_version > hi:
        raise ValueError(f"since_version {since_version} is newer than {hi}")
    chain: list[dict] = []
    v = hi
    while v != since_version:
        m = _read_manifest(root, v)
        if m["parent"] is None:
            raise ValueError(f"version {since_version} not on {hi}'s lineage")
        chain.append(m)
        v = m["parent"]
    chain.reverse()

    def _visible_empty(m: dict) -> DataFrame:
        return _drop_internal(
            spark.createDataFrame([], StructType.fromJson(m["schema"])), m
        )

    def _rows(m: dict, rel_files: list[str], dmap_m: dict) -> DataFrame:
        """Rows of ``rel_files`` under commit ``m``'s schema, with
        ``dmap_m``'s merge-on-read deletes applied: removed files read
        as visible BEFORE the commit (the previous manifest's map),
        added files as visible after (``m``'s own — relevant on a
        rollback whose target carried delete entries)."""
        if not rel_files:
            return _visible_empty(m)
        return _drop_internal(
            _scan_files(
                spark, root, dmap_m, rel_files,
                schema=StructType.fromJson(m["schema"]),
            ),
            m,
        )

    out: DataFrame | None = None
    prev = _read_manifest(root, since_version)
    for m in chain:
        parent_files = set(prev["files"])
        cur = set(m["files"])
        added = [f for f in m["files"] if f not in parent_files]
        removed = sorted(parent_files - cur)
        delta: DataFrame | None = None
        if m["mode"] == "compact":
            pass  # row-preserving by contract (absorbing merge-on-read
            # positions preserves VISIBLE rows) — silent in the feed
        elif m["mode"] == "append":
            if added:
                delta = _rows(m, added, m).withColumn(
                    CHANGE_TYPE_COL, F.lit("insert")
                )
        else:
            # Files present in BOTH manifests whose merge-on-read
            # delete-entry lists differ changed row VISIBILITY without
            # changing the file list (a mor_delete commit, or a
            # rollback across one). Their delta is exactly a POSITION
            # SET difference, so it is read as a semi-join on the
            # (tiny) position diff — never a double full scan of the
            # touched file (round-5 review: the two-sided exceptAll
            # fold violated the cost-∝-churn contract on large files):
            #   entries grew  → those positions became invisible
            #                   (emit as deletes, rows read in the
            #                   BEFORE view — prev's map);
            #   entries shrank → positions became visible again
            #                   (emit as inserts, rows read in the
            #                   AFTER view — m's map).
            # A file whose lists changed in BOTH directions (never
            # produced by the shipped ops, but legal on exotic
            # rollback lineages) falls back to the two-sided fold,
            # where its surviving rows cancel in the multiset diff.
            pdmap, ndmap = _delete_map(prev), _delete_map(m)
            grown: dict[str, set] = {}
            shrunk: dict[str, set] = {}
            two_sided: list[str] = []
            for f in sorted(set(m["files"]) & parent_files):
                lo_e, hi_e = set(pdmap.get(f, [])), set(ndmap.get(f, []))
                if lo_e == hi_e:
                    continue
                if lo_e <= hi_e:
                    grown[f] = hi_e - lo_e
                elif hi_e <= lo_e:
                    shrunk[f] = lo_e - hi_e
                else:
                    two_sided.append(f)

            def _pos_delta(deltas: dict, view_m: dict, change: str):
                # rows at the delta positions, as visible in view_m; a
                # delta delete parquet may also hold entries for files
                # with a DIFFERENT delta list, so each parquet's rows
                # are restricted to the files it is a delta FOR
                by_del: dict[str, list[str]] = {}
                for f, ds in deltas.items():
                    for d in ds:
                        by_del.setdefault(d, []).append(f)
                side = None
                for d, fs in sorted(by_del.items()):
                    one = spark.read.parquet(os.path.join(root, d)).filter(
                        F.col("file").isin(fs))
                    side = one if side is None else side.unionByName(one)
                side = side.select(
                    F.col("file").alias(MOR_FILE_COL),
                    F.col("pos").alias(MOR_POS_COL),
                )
                import pyarrow.parquet as pq

                n_actual = sum(
                    pq.ParquetFile(os.path.join(root, d)).metadata.num_rows
                    for d in by_del
                )
                # same broadcast gate as every delete-applying scan
                if n_actual <= MOR_BROADCAST_CAP:
                    side = F.broadcast(side)
                rows = _scan_files(
                    spark, root, view_m, sorted(deltas), with_pos=True,
                    schema=StructType.fromJson(m["schema"]),
                ).join(side, [MOR_FILE_COL, MOR_POS_COL], "left_semi")
                return _drop_internal(
                    rows.drop(MOR_FILE_COL, MOR_POS_COL), m
                ).withColumn(CHANGE_TYPE_COL, F.lit(change))

            parts: list[DataFrame] = []
            if added or removed or two_sided:
                ins = _rows(m, added + two_sided, m)
                dels = _rows(m, removed + two_sided, prev)
                parts.append(
                    ins.exceptAll(dels)
                    .withColumn(CHANGE_TYPE_COL, F.lit("insert"))
                    .unionByName(
                        dels.exceptAll(ins).withColumn(
                            CHANGE_TYPE_COL, F.lit("delete"))
                    )
                )
            if grown:
                parts.append(_pos_delta(grown, prev, "delete"))
            if shrunk:
                parts.append(_pos_delta(shrunk, m, "insert"))
            if parts:
                delta = parts[0]
                for p in parts[1:]:
                    delta = delta.unionByName(p)
        if delta is not None:
            delta = delta.withColumn(
                CHANGE_VERSION_COL, F.lit(int(m["version"])).cast("int")
            )
            out = (
                delta
                if out is None
                else out.unionByName(delta, allowMissingColumns=True)
            )
        prev = m
    if out is None:
        end = _read_manifest(root, hi)
        return (
            _visible_empty(end)
            .withColumn(CHANGE_TYPE_COL, F.lit("").cast("string"))
            .withColumn(CHANGE_VERSION_COL, F.lit(0).cast("int"))
            .limit(0)
        )
    return out


def table_history(root: str) -> list[dict]:
    """All committed manifests, oldest first (version/mode/rows/time)."""
    out = []
    for v in _committed_versions(root):
        m = _read_manifest(root, v)
        h = {k: m[k] for k in
             ("version", "parent", "mode", "rows_written", "committed_at")}
        h["meta"] = m.get("meta", {})  # absent in pre-round-4 manifests
        out.append(h)
    return out


def snapshots_df(spark: SparkSession, root: str) -> DataFrame:
    """Iceberg ``table.snapshots`` metadata-table analog: one row per
    committed version (version/parent/mode/rows/files/committed_at) as
    a DataFrame — joinable with the data itself (e.g. change feed ⋈
    commit metadata). Driver-side manifest walk; no Spark job."""
    rows = []
    for h in table_history(root):
        m = _read_manifest(root, h["version"])
        rows.append((
            int(h["version"]),
            None if h["parent"] is None else int(h["parent"]),
            str(h["mode"]),
            int(h["rows_written"]),
            len(m["files"]),
            float(h["committed_at"]),
        ))
    return spark.createDataFrame(
        rows,
        "version: int, parent: int, mode: string, rows_written: long, "
        "n_files: int, committed_at: double",
    )


def files_df(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Iceberg ``table.files`` metadata-table analog: one row per data
    file of the resolved version, with its size, recorded row count,
    live merge-on-read delete-position count and per-column min/max
    stats as maps — the inspection surface for layout debugging
    ("which files would this predicate prune?", "which files still
    carry deletes to absorb?"). Driver-side only."""
    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    stats = m.get("file_stats", {})
    fr = m.get("file_rows", {})
    dcounts = m.get("delete_counts", {})
    dmap = _delete_map(m)
    rows = []
    for f in m["files"]:
        path = os.path.join(root, f)
        size = os.path.getsize(path) if os.path.exists(path) else None
        st = stats.get(f) or {}
        rows.append((
            f,
            size,
            fr.get(f),
            dcounts.get(f, 0) if f in dmap else 0,
            {c: None if b.get("min") is None else str(b["min"])
             for c, b in st.items()},
            {c: None if b.get("max") is None else str(b["max"])
             for c, b in st.items()},
        ))
    return spark.createDataFrame(
        rows,
        "file: string, size_bytes: long, n_rows: long, n_deletes: long, "
        "col_min: map<string,string>, col_max: map<string,string>",
    )


def expire_versions(root: str, keep_last: int) -> dict:
    """Drop all but the last ``keep_last`` committed versions: their
    manifests are deleted and any data dir no retained manifest
    references is removed (append manifests reuse parent files, so a
    parent's data dir survives as long as any retained child lists it).
    Returns {"expired_versions": [...], "removed_dirs": [...]}.
    Runs under the commit lock — never concurrent with a writer."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    lock_path = os.path.join(root, LOCK)
    fd = _acquire_lock(root)
    try:
        _gc_orphans(root)
        committed = _committed_versions(root)
        tagged = set(list_tags(root).values())
        # tagged versions are retention-pinned (Iceberg tag semantics):
        # their manifests and data survive any keep_last window until
        # the tag is deleted
        drop = [v for v in committed[:-keep_last] if v not in tagged]
        keep = [v for v in committed if v not in drop]
        # dir candidates BEFORE the pin read — same pin-then-write
        # ordering argument as _gc_orphans (lock-free writers run their
        # data writes while expire holds the commit lock)
        expire_candidates = [
            n for n in sorted(os.listdir(root)) if n.startswith(DATA_PREFIX)]
        live_dirs = _staged_live_dirs(root)
        for v in keep:
            m = _read_manifest(root, v)
            for f in m["files"]:
                live_dirs.add(f.split("/", 1)[0])
            for dels in _delete_map(m).values():
                for d in dels:
                    live_dirs.add(d.split("/", 1)[0])
        # every live branch pins its referenced dirs regardless of
        # keep_last (delete_branch first to reclaim a stale experiment)
        for n in _branch_names(root):
            _manifest_live_dirs(_branch_meta_root(root, n), live_dirs)
        for v in drop:
            os.unlink(_manifest_path(root, v))
        removed = []
        for name in expire_candidates:
            if name not in live_dirs:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
                removed.append(name)
        return {"expired_versions": drop, "removed_dirs": removed}
    finally:
        os.close(fd)
        os.unlink(lock_path)


# ---------------------------------------------------------------------------
# Write-audit-publish (WAP): stage a commit invisibly, audit it, then
# publish or abort — the Iceberg `spark.wap.id` / cherry-pick workflow
# (the standard shape for validating a 100-TB ingest before readers can
# see it). The existing commit machinery already separates the durable
# write (data dir + manifest) from the commit point (the pointer swap);
# staging simply pauses between the two: the staged entry lives under
# `_staged/`, outside the `NNNNN.json` manifest namespace, so every
# committed-read path ignores it by construction, and both garbage
# collectors treat its data dir as live (see _staged_live_dirs) so
# unrelated commits landing mid-audit cannot vaporize it.


def _staged_path(root: str, wap_id: str) -> str:
    return os.path.join(root, STAGED_DIR, f"{wap_id}.json")


def _load_staged(root: str, wap_id: str) -> dict:
    try:
        with open(_staged_path(root, wap_id)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no staged entry {wap_id!r} at {root} (published or aborted?)"
        ) from None


def list_staged(root: str) -> list[dict]:
    """All staging entries (audit queues, janitor jobs)."""
    sdir = os.path.join(root, STAGED_DIR)
    if not os.path.isdir(sdir):
        return []
    out = []
    for name in sorted(os.listdir(sdir)):
        if name.endswith(".json"):
            try:
                with open(os.path.join(sdir, name)) as f:
                    entry = json.load(f)
            except (OSError, ValueError):
                # published/aborted between listdir and open, or a
                # half-written entry — skip, same policy as the GC
                continue
            if entry.get("pin_dir"):
                continue  # optimistic-append pin, not a WAP staging entry
            out.append(entry)
    return out


def _refuse_transformed_parent(pm: dict, what: str) -> None:
    for k in ("bucket_transform", "partition_transform"):
        if pm.get("meta", {}).get(k):
            raise ValueError(
                f"{what} onto a table with a recorded {k} would add files "
                "without the layout column — point lookups would silently "
                "miss those rows; write through the validating transformed "
                "writer instead"
            )


def stage_snapshot(
    df: DataFrame,
    root: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
    wap_id: str | None = None,
    lock_timeout: float = 30.0,
) -> str:
    """Write ``df`` durably but INVISIBLY: no committed reader (any
    version, time travel, changes feed) can observe it until
    :func:`publish_staged`. Returns the ``wap_id`` handle. ``mode``
    semantics match :func:`write_snapshot`, resolved at PUBLISH time:
    an append attaches to whatever the parent is then (pure addition
    rebases cleanly across concurrent commits); an overwrite records
    the parent seen here and refuses to publish if the table moved.
    Audit the staged view with :func:`read_snapshot_staged`.

    Like :func:`write_snapshot_concurrent`, the data write runs with NO
    commit lock held (GC-pinned via a `_staged/` pin entry): N stagers
    run their cluster jobs simultaneously and serialize only on the
    milliseconds of entry registration. Consequences of deciding
    uniqueness at REGISTRATION time: a duplicate explicit ``wap_id``
    still raises, but only after its (wasted, GC-collected) data write;
    ``parent_at_stage`` and the transformed-parent refusal see the
    registration-time table; per-file stats are footer-collected then
    too, against the registration-time parent's stats columns."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    os.makedirs(os.path.join(root, MANIFEST_DIR), exist_ok=True)
    wap_id = wap_id or uuid.uuid4().hex[:12]
    path = _staged_path(root, wap_id)
    data_name, pin_path = _pin_data_dir(root)
    try:
        new_files, _, _, n = _write_data_dir(
            df, root, None, data_name=data_name)
        fd = _acquire_lock_wait(root, lock_timeout)
        try:
            # uniqueness decided under the lock: an unlocked peek could
            # race a concurrent stager with the same explicit wap_id and
            # silently os.replace its entry, orphaning that writer's data
            if os.path.exists(path):
                raise ValueError(
                    f"staged entry {wap_id!r} already exists at {root}")
            _gc_orphans(root)
            parent = current_version(root)
            if mode == "append" and parent is not None:
                pm0 = _read_manifest(root, parent)
                _refuse_transformed_parent(pm0, "a staged append")
                if stats_cols is None:
                    # same stats-column inheritance as a direct append
                    stats_cols = _parent_stats_cols(pm0, []) or None
            file_stats = _footer_stats(root, data_name, stats_cols)
            file_rows = _footer_rows(root, data_name)
            entry = {
                "wap_id": wap_id,
                "mode": mode,
                "new_files": new_files,
                "file_stats": file_stats,
                "file_rows": file_rows,
                "schema": df.schema.jsonValue(),
                "rows_written": n,
                "parent_at_stage": parent,
                "staged_at": time.time(),
                "meta": dict(meta or {}),
            }
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entry, f)
            os.replace(tmp, path)
            return wap_id
        finally:
            os.close(fd)
            os.unlink(os.path.join(root, LOCK))
    finally:
        _unpin(pin_path)


def read_snapshot_staged(spark: SparkSession, root: str, wap_id: str) -> DataFrame:
    """The table AS IT WOULD BE after publishing ``wap_id`` — the audit
    surface: for an append, the current committed files plus the staged
    files (merged schema, pre-evolution files read missing columns as
    NULL); for an overwrite, just the staged files. Committed readers
    remain unaffected."""
    entry = _load_staged(root, wap_id)
    schema = StructType.fromJson(entry["schema"])
    files = list(entry["new_files"])
    pm: dict = {}
    if entry["mode"] == "append":
        parent = current_version(root)
        if parent is not None:
            pm = _read_manifest(root, parent)
            # same refusal as publish: if a transformed overwrite landed
            # mid-audit, the append can never commit — fail the audit
            # read HERE instead of spending the audit on a dead state
            # (also keeps the parent's internal layout columns out of
            # the audit view)
            _refuse_transformed_parent(pm, "auditing a staged append")
            schema = _merge_schemas(StructType.fromJson(pm["schema"]), schema)
            files = pm["files"] + files
    # the parent's merge-on-read deletes apply to the audit view exactly
    # as they will after publish (staged files carry no delete entries)
    return _scan_files(spark, root, pm, files, schema=schema)


def publish_staged(root: str, wap_id: str) -> int:
    """Promote a staged entry to the next committed version (the pointer
    swap is, as everywhere, the sole commit point); returns the version.
    Appends rebase onto the CURRENT parent (concurrent commits since
    staging are fine — addition conflicts with nothing); an overwrite
    whose parent moved since staging raises instead of clobbering the
    interleaved commits. Durable meta (batch HWM, MV mark) is inherited
    exactly as a direct write would inherit it."""
    fd = _acquire_lock(root)
    try:
        entry = _load_staged(root, wap_id)
        parent = current_version(root)
        # replay detection, two tiers — the commit may be complete with
        # only the bookkeeping stale, and a retry must then no-op
        # instead of re-appending the same files (double delivery /
        # resurrection of deleted rows):
        # (1) the entry records the version a previous attempt was
        #     about to swap to, and the published manifest carries this
        #     wap_id in its meta. pointer >= marked does NOT alone prove
        #     our swap (a crash BEFORE the swap leaves an orphan that
        #     the next writer GCs, REUSING the version number), so the
        #     manifest's wap_id is the actual proof; a marked manifest
        #     that has since been EXPIRED is genuinely ambiguous —
        #     refuse loudly rather than guess either way;
        # (2) for entries staged before this marker existed, any
        #     retained manifest listing every staged file (uuid dirs —
        #     no false positives) is the same proof.
        marked = entry.get("publishing_version")
        if marked is not None and parent is not None and parent >= marked:
            try:
                mm = _read_manifest(root, marked)
            except FileNotFoundError:
                raise RuntimeError(
                    f"cannot decide whether staged entry {wap_id!r} was "
                    f"published: its target version {marked} has been "
                    f"expired from {root}'s history. Resolve manually — "
                    "abort_staged if the data is visible in the table, "
                    "or delete the entry's publishing_version field to "
                    "force a fresh publish"
                ) from None
            if mm.get("meta", {}).get("wap_id") == wap_id:
                os.unlink(_staged_path(root, wap_id))
                return int(marked)
            # another writer reused the number after GCing our orphan:
            # our swap never happened — fall through to a fresh publish
        published_at = _entry_committed_version(root, entry)
        if published_at is not None:
            os.unlink(_staged_path(root, wap_id))
            return published_at
        version = (parent or 0) + 1
        schema = StructType.fromJson(entry["schema"])
        files, file_stats = list(entry["new_files"]), dict(entry["file_stats"])
        # pre-file_rows entries (older stagings) publish without counts
        file_rows = dict(entry.get("file_rows", {}))
        delete_files: dict = {}
        delete_counts: dict = {}
        meta_out = dict(entry["meta"])
        if entry["mode"] == "overwrite":
            if parent != entry["parent_at_stage"]:
                raise ValueError(
                    f"staged overwrite {wap_id!r} was built against version "
                    f"{entry['parent_at_stage']} but the table is now at "
                    f"{parent} — publishing would clobber the interleaved "
                    "commits; re-stage against the current table"
                )
        if parent is not None:
            pm = _read_manifest(root, parent)
            # writer-grade inheritance only: an overwrite must NOT carry
            # a parent's layout-transform spec onto files that lack the
            # layout column (write_snapshot drops it the same way)
            for k in _DURABLE_WRITER_META:
                if k in pm.get("meta", {}) and k not in meta_out:
                    meta_out[k] = pm["meta"][k]
            if entry["mode"] == "append":
                _refuse_transformed_parent(pm, "publishing a staged append")
                (schema, files, file_stats, file_rows,
                 delete_files, delete_counts) = _merge_append_manifest(
                    pm, schema, files, file_stats, file_rows)
        # durably record the intended version BEFORE the pointer swap
        # and stamp the manifest with this wap_id — together they make
        # replay detection exact (tier 1 above)
        meta_out["wap_id"] = wap_id
        entry["publishing_version"] = version
        tmp = _staged_path(root, wap_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, _staged_path(root, wap_id))
        _publish_manifest(root, version, {
            "version": version,
            "parent": parent,
            "mode": entry["mode"],
            "files": files,
            "file_stats": file_stats,
            "file_rows": file_rows,
            "delete_files": delete_files,
            "delete_counts": delete_counts,
            "schema": schema.jsonValue(),
            "rows_written": entry["rows_written"],
            "committed_at": time.time(),
            "meta": meta_out,
        })
        os.unlink(_staged_path(root, wap_id))
        return version
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


def _entry_committed_version(root: str, entry: dict) -> int | None:
    """The committed version whose manifest lists every staged file, or
    None — the signature of a publish that crashed after the pointer
    swap but before the staged-entry unlink. Checked against ALL
    retained manifests, not just the current one: a rewrite commit
    landing between the crash and the retry must not make the retry
    re-append (and thus double-deliver / resurrect) already-published
    files. Returns the newest matching version."""
    if not entry["new_files"]:
        return None
    wanted = set(entry["new_files"])
    for v in reversed(_committed_versions(root)):
        if wanted <= set(_read_manifest(root, v)["files"]):
            return v
    return None


def abort_staged(root: str, wap_id: str) -> None:
    """Drop a staged entry and its data (the audit said no). Removing the
    entry first makes the data dir an orphan; the explicit rmtree is
    just eager cleanup — a crash in between leaves nothing visible and
    the next writer's GC finishes the job. Data dirs any committed
    manifest still references are NEVER deleted: an entry whose publish
    crashed post-commit (files live in a manifest) or whose dir is
    shared must only lose its bookkeeping."""
    fd = _acquire_lock(root)
    try:
        entry = _load_staged(root, wap_id)
        os.unlink(_staged_path(root, wap_id))
        committed_dirs = set()
        for v in _manifest_versions(root):
            for f in _read_manifest(root, v)["files"]:
                committed_dirs.add(f.split("/", 1)[0])
        for d in {f.split("/", 1)[0] for f in entry["new_files"]}:
            if d not in committed_dirs:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


# ---------------------------------------------------------------------------
# Tags: named immutable refs to committed versions (Iceberg tag
# semantics). A tag pins its version through retention — expire_versions
# keeps tagged manifests and their data alive regardless of keep_last —
# so "the corpus we trained v3 on" stays reproducible for as long as the
# tag exists, while the table keeps churning. Tags resolve anywhere a
# version does: read_snapshot(..., tag="x") is exact time travel by name.

TAGS_DIR = "_tags"
_TAG_NAME_RE = r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}"


def _tag_path(root: str, name: str) -> str:
    return os.path.join(root, TAGS_DIR, f"{name}.json")


def _check_tag_name(name: str) -> None:
    import re

    if not re.fullmatch(_TAG_NAME_RE, name):
        raise ValueError(
            f"invalid tag name {name!r}: must match {_TAG_NAME_RE}"
        )


def create_tag(root: str, name: str, version: int | None = None) -> int:
    """Pin ``version`` (default: current) under ``name``; returns the
    pinned version. Tags are immutable — re-tagging an existing name
    raises (delete it first); the target must be a committed version."""
    _check_tag_name(name)
    fd = _acquire_lock(root)
    try:
        v = _resolve_version(root, version, None)
        path = _tag_path(root, name)
        if os.path.exists(path):
            raise ValueError(
                f"tag {name!r} already exists at {root} (tags are "
                "immutable — delete_tag first to retarget)"
            )
        os.makedirs(os.path.join(root, TAGS_DIR), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"name": name, "version": v,
                       "created_at": time.time()}, f)
        os.replace(tmp, path)
        return v
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


def list_tags(root: str) -> dict[str, int]:
    """{tag name: pinned version} for every live tag."""
    tdir = os.path.join(root, TAGS_DIR)
    if not os.path.isdir(tdir):
        return {}
    out: dict[str, int] = {}
    for fname in sorted(os.listdir(tdir)):
        if not fname.endswith(".json"):
            continue  # .tmp of an in-flight atomic write
        try:
            with open(os.path.join(tdir, fname)) as f:
                t = json.load(f)
        except FileNotFoundError:
            continue  # deleted between listdir and open — benign race
        # other read errors PROPAGATE: tags are written atomically, and
        # expire_versions consumes this listing to decide which pinned
        # versions to KEEP — silently dropping an unreadable tag would
        # delete the very data the tag exists to protect
        out[t["name"]] = int(t["version"])
    return out


def resolve_tag(root: str, name: str) -> int:
    """The version a tag pins (FileNotFoundError when absent)."""
    try:
        with open(_tag_path(root, name)) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        raise FileNotFoundError(f"no tag {name!r} at {root}") from None


def delete_tag(root: str, name: str) -> None:
    """Drop the tag; its version becomes expirable like any other."""
    fd = _acquire_lock(root)
    try:
        try:
            os.unlink(_tag_path(root, name))
        except FileNotFoundError:
            raise FileNotFoundError(f"no tag {name!r} at {root}") from None
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


# ---------------------------------------------------------------------------
# Branches (Iceberg branch refs): a NAMED MUTABLE line of commits that
# forks from a main version and can later fast-forward back. Where a
# tag pins one immutable version and WAP stages one invisible commit, a
# branch accumulates MANY commits invisible to main readers — the
# standard shape for a multi-step backfill or an experiment validated
# against real table data before release. Layout: the branch keeps its
# own manifest namespace (`_branches/<name>/_versions/NNNNN.json` + its
# own VERSION pointer — structurally a table root minus data), while
# its DATA dirs live in the main root alongside everyone else's, so
# snapshot isolation, atomic pointer swaps and crash-orphan GC all
# apply per-ref with the existing machinery. All refs share the main
# table's single commit lock (one writer across main + every branch).
# Both garbage collectors treat branch-referenced files as live; a
# deleted branch's unshared data dirs become orphans the next writer
# GCs.

BRANCHES_DIR = "_branches"
_FORKED_FROM = "branch_forked_from"


def _branch_meta_root(root: str, name: str) -> str:
    _check_tag_name(name)  # same naming rules as tags
    return os.path.join(root, BRANCHES_DIR, name)


def _branch_names(root: str) -> list[str]:
    bdir = os.path.join(root, BRANCHES_DIR)
    if not os.path.isdir(bdir):
        return []
    return sorted(
        n for n in os.listdir(bdir)
        if os.path.isdir(os.path.join(bdir, n))
    )


def list_branches(root: str) -> dict[str, int]:
    """{branch name: head version on the branch} for live branches."""
    out = {}
    for n in _branch_names(root):
        v = current_version(_branch_meta_root(root, n))
        if v is not None:
            out[n] = v
    return out


def create_branch(root: str, name: str, version: int | None = None) -> int:
    """Fork a branch from main@``version`` (default: current): branch
    version 1 is a content-copy of that manifest (no data copy), and
    the fork point is recorded so ``fast_forward`` can later check that
    main has not diverged. Returns the forked-from main version."""
    broot = _branch_meta_root(root, name)
    fd = _acquire_lock(root)
    try:
        _gc_orphans(root)
        if current_version(broot) is not None:
            raise ValueError(f"branch {name!r} already exists at {root}")
        v = _resolve_version(root, version, None)
        m = _read_manifest(root, v)
        os.makedirs(os.path.join(broot, MANIFEST_DIR), exist_ok=True)
        _publish_manifest(broot, 1, {
            "version": 1,
            "parent": None,
            "mode": "branch",
            "files": m["files"],
            "file_stats": m.get("file_stats", {}),
            "file_rows": m.get("file_rows", {}),
            "delete_files": m.get("delete_files", {}),
            "delete_counts": m.get("delete_counts", {}),
            "schema": m["schema"],
            "rows_written": 0,
            "committed_at": time.time(),
            "meta": {**m.get("meta", {}), _FORKED_FROM: v},
        })
        return v
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


def write_snapshot_branch(
    df: DataFrame,
    root: str,
    name: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    meta: dict | None = None,
) -> int:
    """Commit ``df`` to branch ``name`` — same contract as
    ``write_snapshot`` (append inherits stats columns, merges schema
    and carries merge-on-read delete attachments; overwrite replaces
    the file set), except the manifest lands in the branch's namespace:
    committed main readers never see it. Data files are written into
    the MAIN root, so a later fast-forward is pure metadata."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    broot = _branch_meta_root(root, name)
    fd = _acquire_lock(root)
    try:
        _gc_orphans(root)
        parent = current_version(broot)
        if parent is None:
            raise FileNotFoundError(
                f"no branch {name!r} at {root} — create_branch first")
        pm = _read_manifest(broot, parent)
        if stats_cols is None and mode == "append":
            stats_cols = _parent_stats_cols(pm, []) or None
        if mode == "append":
            _refuse_transformed_parent(pm, "a branch append")
        new_files, file_stats, file_rows, n = _write_data_dir(
            df, root, stats_cols)
        schema = df.schema
        files = new_files
        delete_files: dict = {}
        delete_counts: dict = {}
        meta_out = dict(meta or {})
        for k in (*_DURABLE_WRITER_META, _FORKED_FROM):
            if k in pm.get("meta", {}) and k not in meta_out:
                meta_out[k] = pm["meta"][k]
        if mode == "append":
            (schema, files, file_stats, file_rows,
             delete_files, delete_counts) = _merge_append_manifest(
                pm, df.schema, new_files, file_stats, file_rows)
        version = parent + 1
        _publish_manifest(broot, version, {
            "version": version,
            "parent": parent,
            "mode": mode,
            "files": files,
            "file_stats": file_stats,
            "file_rows": file_rows,
            "delete_files": delete_files,
            "delete_counts": delete_counts,
            "schema": schema.jsonValue(),
            "rows_written": n,
            "committed_at": time.time(),
            "meta": meta_out,
        })
        return version
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


def read_snapshot_branch(
    spark: SparkSession,
    root: str,
    name: str,
    version: int | None = None,
    predicates: dict | None = None,
) -> DataFrame:
    """Read branch ``name`` at its head (or a branch ``version``), with
    the same stats pruning, residual filtering and merge-on-read
    delete application as ``read_snapshot`` — the audit surface for
    whatever the branch accumulated."""
    broot = _branch_meta_root(root, name)
    if current_version(broot) is None:
        raise FileNotFoundError(f"no branch {name!r} at {root}")
    v = _resolve_version(broot, version, None)
    m = _read_manifest(broot, v)
    files, _ = _plan_from_manifest(m, predicates)
    df = _scan_files(spark, root, m, files)
    if predicates:
        df = df.filter(_residual_filter(predicates))
    return _drop_internal(df, m)


def fast_forward(root: str, name: str) -> int:
    """Publish the branch head as the next MAIN version (pure metadata
    — the data dirs are already in the main root). Refuses when main
    moved past the branch's fork point (divergent histories: the
    branch's view no longer contains the interleaved main commits —
    re-create the branch from current main and re-apply, the same
    discipline as a stale staged overwrite). Returns the new main
    version; the branch stays (delete_branch when done)."""
    broot = _branch_meta_root(root, name)
    fd = _acquire_lock(root)
    try:
        _gc_orphans(root)
        bv = current_version(broot)
        if bv is None:
            raise FileNotFoundError(f"no branch {name!r} at {root}")
        bm = _read_manifest(broot, bv)
        base = bm.get("meta", {}).get(_FORKED_FROM)
        ptr = current_version(root)
        if ptr != base:
            raise ValueError(
                f"branch {name!r} forked from main version {base} but "
                f"main is now at {ptr} — fast-forward would drop the "
                "interleaved commits; re-branch from current main"
            )
        head = _read_manifest(root, ptr)
        meta_out = {
            k: v for k, v in bm.get("meta", {}).items() if k != _FORKED_FROM
        }
        hwms = [
            mm.get("batch_id_hwm")
            for mm in (bm.get("meta", {}), head.get("meta", {}))
            if mm.get("batch_id_hwm") is not None
        ]
        if hwms:
            meta_out["batch_id_hwm"] = max(hwms)
        version = ptr + 1
        _publish_manifest(root, version, {
            "version": version,
            "parent": ptr,
            "mode": "fast_forward",
            "files": bm["files"],
            "file_stats": bm.get("file_stats", {}),
            "file_rows": bm.get("file_rows", {}),
            "delete_files": bm.get("delete_files", {}),
            "delete_counts": bm.get("delete_counts", {}),
            "schema": bm["schema"],
            "rows_written": 0,
            "committed_at": time.time(),
            "meta": {**meta_out, "fast_forwarded_branch": name,
                     "fast_forwarded_version": bv},
        })
        return version
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


def delete_branch(root: str, name: str) -> None:
    """Drop the branch ref and its manifests; data dirs only the branch
    referenced become orphans for the next writer's GC."""
    broot = _branch_meta_root(root, name)
    fd = _acquire_lock(root)
    try:
        if current_version(broot) is None:
            raise FileNotFoundError(f"no branch {name!r} at {root}")
        shutil.rmtree(broot)
    finally:
        os.close(fd)
        os.unlink(os.path.join(root, LOCK))


def snapshot_meta_agg(
    root: str,
    cols: list[str] | None = None,
    version: int | None = None,
    count_cols: list[str] | None = None,
) -> dict:
    """Metadata-only aggregation (the Iceberg metadata-scan analog):
    ``count(*)`` and per-column ``min``/``max`` answered from the
    manifest alone — ZERO Spark jobs, no data-file I/O, O(files) driver
    work. At 100 TB this is the difference between a catalog lookup and
    a cluster-wide scan for the queries BI layers fire constantly.

    Returns ``{"n_rows": N, "min_<c>": ..., "max_<c>": ...}`` plus
    ``count_<c>`` (SQL ``count(col)`` — non-NULL rows, from the
    recorded per-file null counts) for each of ``count_cols``.
    Soundness: ``n_rows`` sums the per-file row counts every writer
    records from the parquet footers (exact, includes NULL rows like
    SQL ``count(*)``); min/max come from the recorded file stats, which
    exclude NULLs exactly as SQL min/max do. Refuses (ValueError) when
    the manifest predates per-file row counts, or when any file lacks
    stats for a requested column (unstatted writes and all-NULL files
    record none) — never guesses. Date/timestamp stats are ISO strings
    (the stored ordering-compatible form); numeric stats round-trip
    exactly through the manifest JSON.
    """
    v = _resolve_version(root, version, None)
    m = _read_manifest(root, v)
    fr = m.get("file_rows", {})
    missing = [f for f in m["files"] if f not in fr]
    if missing:
        raise ValueError(
            f"{len(missing)} file(s) of {root}@{v} have no recorded row "
            "count (manifest predates per-file counts) — re-commit the "
            "table or aggregate via Spark"
        )
    # merge-on-read deletes: per-file position counts are exact (each
    # position recorded at most once), so count(*) stays metadata-only;
    # min/max on a deleted-against file is NOT answerable — the deleted
    # row may be the extremum — so those refuse below
    dmap, dcounts = _delete_map(m), m.get("delete_counts", {})
    out: dict = {
        "n_rows": sum(fr[f] for f in m["files"])
        - sum(dcounts.get(f, 0) for f in m["files"] if f in dmap)
    }
    fs = m.get("file_stats", {})
    for c in cols or []:
        mins, maxs = [], []
        for f in m["files"]:
            if f in dmap:
                raise ValueError(
                    f"file {f} carries merge-on-read delete positions — "
                    f"its recorded min/max for {c!r} may be a deleted "
                    "row; compact_snapshot absorbs the deletes and "
                    "restores metadata-only min/max"
                )
            st = fs.get(f, {}).get(c)
            if st is None or "min" not in st:
                raise ValueError(
                    f"column {c!r} lacks min/max stats on {f} — record it "
                    "via stats_cols at write time (all-NULL files carry "
                    "only a null count); metadata cannot answer this "
                    "min/max"
                )
            mins.append(st["min"])
            maxs.append(st["max"])
        out[f"min_{c}"] = min(mins) if mins else None
        out[f"max_{c}"] = max(maxs) if maxs else None
    for c in count_cols or []:
        # SQL count(col) = rows minus NULLs — answerable from metadata
        # exactly when every file recorded a null count for the column
        # (all writers do, via the parquet footers) and none of the
        # files carries merge-on-read deletes (a deleted row's NULLness
        # is unknown to the manifest)
        n = 0
        for f in m["files"]:
            if f in dmap:
                raise ValueError(
                    f"file {f} carries merge-on-read delete positions — "
                    f"metadata cannot answer count({c!r}); "
                    "compact_snapshot absorbs the deletes"
                )
            st = fs.get(f, {}).get(c)
            if st is None or "nulls" not in st:
                raise ValueError(
                    f"column {c!r} lacks a recorded null count on {f} — "
                    "record it via stats_cols at write time; metadata "
                    f"cannot answer count({c!r})"
                )
            n += fr[f] - st["nulls"]
        out[f"count_{c}"] = n
    return out

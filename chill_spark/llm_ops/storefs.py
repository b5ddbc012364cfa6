"""Filesystem primitives for the sketch / embedding store lifecycle.

The store lifecycle — meta read/write, overwrite cleanup, the
compaction swap — needs directory-level operations (exists, recursive
delete, rename, recursive file listing with sizes, small-file
read/write) that ``os``/``shutil`` only provide for the local
filesystem. At the 100 TB scale the store lives on object storage or
HDFS, so everything here routes through Hadoop's ``FileSystem`` API
via the JVM gateway: one code path serves ``file://``, ``hdfs://``,
``s3a://`` — any scheme with a Hadoop connector on the classpath, and
plain local paths resolve to the local FS exactly as before.

Semantics callers must know:

- ``rename`` is atomic on HDFS and POSIX local filesystems; on S3A it
  is a server-side COPY + DELETE (non-atomic, O(bytes)). The
  compaction swap's crash windows are therefore wider on S3 — the
  heal-on-entry pass covers every window, but the sealed-store
  contract (compact only while no stream writes) matters even more
  there.
- Paths are passed around as plain strings (scheme-qualified or not);
  joins are string joins — Hadoop ``Path`` normalizes.

Reference parity note: the reference engine keeps all state on the
local filesystem of one node (Chill's loader writes beside its input
files); the remote-capable store is this engine's own addition for
the cluster deployment story.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _active_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "store filesystem operations need a SparkSession (Hadoop "
            "FileSystem API rides the JVM gateway) — none is active"
        )
    return s


class StoreFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` for the
    filesystem that owns ``root``. One instance per store root; all
    methods take/return plain string paths."""

    def __init__(self, root: str, spark: SparkSession | None = None):
        spark = _active_spark(spark)
        jvm = spark._jvm
        self._jvm = jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._conf = spark._jsc.hadoopConfiguration()
        self.root = root
        self._fs = self._Path(root).getFileSystem(self._conf)

    # -- predicates ---------------------------------------------------
    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def is_dir(self, path: str) -> bool:
        p = self._Path(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    # -- mutations ----------------------------------------------------
    def delete(self, path: str) -> None:
        """Recursive delete; no-op when absent."""
        p = self._Path(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def rename(self, src: str, dst: str) -> None:
        """Directory/file rename. Hadoop's rename returns False instead
        of raising on most failure modes (missing source, existing
        destination on some FSes) — surface that as an error, a swap
        protocol must never half-succeed silently."""
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise OSError(f"rename failed: {src} -> {dst}")

    # -- small control files (e.g. _meta.json) ------------------------
    def _read_fs(self):
        # Control files are read through the RAW filesystem when the
        # owning FS is checksummed (Hadoop's local FS keeps sidecar
        # .crc files): _meta.json is a human-editable control file,
        # and an out-of-band edit (plain editor/open()) leaves the
        # .crc stale, turning every subsequent checksummed read into
        # a ChecksumException. Verification adds nothing for a
        # ~100-byte JSON we fully parse anyway.
        try:
            return self._fs.getRawFileSystem()
        except Exception:  # not a ChecksumFileSystem (e.g. HDFS, S3A)
            return self._fs

    def read_text(self, path: str) -> str:
        # py4j copies a Python bytearray into a fresh byte[], so
        # Java-side writes into a passed buffer never reach Python —
        # read through commons-io (on Spark's classpath), which
        # RETURNS the bytes instead of mutating a caller buffer
        stream = self._read_fs().open(self._Path(path))
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        out = self._fs.create(self._Path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    # -- listings -----------------------------------------------------
    def list_dirs(self, path: str) -> list[str]:
        """Names (not paths) of the immediate child directories."""
        if not self.exists(path):
            return []
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._Path(path))
            if st.isDirectory()
        ]

    def list_children(self, path: str) -> list[str]:
        """Names of ALL immediate children (files and directories)."""
        if not self.exists(path):
            return []
        return [
            st.getPath().getName()
            for st in self._fs.listStatus(self._Path(path))
        ]

    def list_files(self, path: str, suffix: str = "") -> list[tuple[str, int]]:
        """Recursive (path, size) listing under ``path`` filtered by
        suffix. One round-trip iterator — on object stores this is the
        flat LIST call, not a directory walk."""
        out: list[tuple[str, int]] = []
        if not self.exists(path):
            return out
        it = self._fs.listFiles(self._Path(path), True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(suffix):
                out.append((p, int(st.getLen())))
        return out

    def list_files_mtime(
        self, path: str, suffix: str = ""
    ) -> list[tuple[str, float]]:
        """Recursive (path, modification-time-seconds) listing — the
        write-order signal for journals whose batch-id conventions
        are mixed (stream ids ascend, manual-append ids descend)."""
        out: list[tuple[str, float]] = []
        if not self.exists(path):
            return out
        it = self._fs.listFiles(self._Path(path), True)
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(suffix):
                out.append((p, st.getModificationTime() / 1000.0))
        return out


#: schemes whose directory rename is a single atomic metadata op.
#: Object stores (s3a/s3/s3n/gs/oss/wasb/abfs/cos...) implement rename
#: as COPY+DELETE — NOT atomic, and a crash mid-rename strands objects
#: across both directories. Anything not listed here is treated as
#: non-atomic (the safe assumption).
ATOMIC_RENAME_SCHEMES = {"", "file", "hdfs", "viewfs", "ofs", "o3fs"}


def rename_is_atomic(root: str) -> bool:
    scheme = root.split("://", 1)[0] if "://" in root else ""
    return scheme in ATOMIC_RENAME_SCHEMES


def swap_dir(
    fs: StoreFS,
    live: str,
    tmp: str,
    aside: str,
    marker: str,
    atomic: bool,
) -> None:
    """Swap a fully-written ``tmp`` directory into ``live``'s place.

    Two protocols, chosen by whether the filesystem's rename is a
    single atomic metadata op:

    - **Atomic rename** (local, file://, hdfs://): rename live aside,
      rename tmp in, drop the aside. Every crash window is healed by
      ``heal_swap``.
    - **Non-atomic rename** (object stores, rename = COPY+DELETE): the
      aside swap is unsafe — a crash mid-rename strands objects across
      both directories and a naive heal deletes the only copy of the
      stragglers. Staged instead, with ``marker`` as a single-object
      atomic PUT: marker(stage=committed) -> delete live ->
      marker(stage=renaming) -> rename tmp in -> drop marker. Every
      crash window either rolls forward from the marker or (true
      mid-rename, both directories present) refuses with data intact.

    Callers embedding the swap next to Spark-discovered partitions
    must pass HIDDEN names (``.``/``_`` prefix) for tmp/aside/marker
    so partition discovery never sees the scaffolding."""
    if atomic:
        fs.rename(live, aside)
        fs.rename(tmp, live)
        fs.delete(aside)
    else:
        fs.write_text(marker, '{"stage": "committed"}')
        fs.delete(live)
        fs.write_text(marker, '{"stage": "renaming"}')
        fs.rename(tmp, live)
        fs.delete(marker)


def heal_swap(
    fs: StoreFS,
    live: str,
    tmp: str,
    aside: str,
    marker: str,
) -> None:
    """Restore ``live`` from any crash window of either ``swap_dir``
    protocol. Conservative by construction: the only state it cannot
    roll forward — a non-atomic rename caught mid-flight, live and
    tmp both present under a stage=renaming marker — raises with
    everything intact instead of guessing."""
    import json

    if fs.exists(marker):
        stage = json.loads(fs.read_text(marker)).get("stage")
        has_live, has_tmp = fs.is_dir(live), fs.is_dir(tmp)
        if stage == "committed":
            # tmp was complete before the marker; live may be
            # partially deleted — roll forward. Guard on tmp's
            # existence so heal itself is idempotent: if a PRIOR heal
            # (or the original swap) crashed after rename(tmp, live)
            # but before dropping the marker, live already IS the new
            # data and deleting it would destroy the only copy.
            if has_tmp:
                fs.delete(live)
                fs.rename(tmp, live)
                fs.delete(marker)
            elif has_live:
                fs.delete(marker)  # roll-forward finished; stale marker
            else:
                raise RuntimeError(
                    f"directory swap for {live} is unrecoverable: "
                    f"marker {marker} says stage=committed but neither "
                    f"{live} nor {tmp} exists"
                )
        elif has_live and not has_tmp:
            fs.delete(marker)  # rename finished; only the marker is stale
        elif has_tmp and not has_live:
            fs.rename(tmp, live)  # rename never moved an object
            fs.delete(marker)
        else:
            raise RuntimeError(
                f"directory swap for {live} crashed mid-rename on a "
                f"non-atomic filesystem: objects are split between "
                f"{live} and {tmp} (marker {marker}, stage={stage}). "
                "Nothing was deleted — merge the two directories "
                "manually (every object exists in at least one) and "
                "remove the marker."
            )
        return
    if not fs.is_dir(live) and fs.is_dir(aside):
        fs.rename(aside, live)  # died between rename-aside and rename-in
    fs.delete(tmp)    # temp from a crashed run (live is intact)
    fs.delete(aside)  # died before removing the aside copy


def read_store_json(root: str, name: str = "_meta.json",
                    spark: SparkSession | None = None) -> dict | None:
    """Load a store-level JSON control file, or None when absent.

    Scheme-less roots resolve against ``fs.defaultFS`` — the SAME
    filesystem Spark's parquet writers resolve them against. Going
    through ``os`` here instead would split-brain the store on any
    cluster whose defaultFS isn't the local disk: data on HDFS, meta
    on one driver's filesystem, and the meta fail-fasts silently
    no-oping for every other node. Plain ``open`` is used only when
    no SparkSession exists at all (pure-local helper contexts, where
    defaultFS is necessarily the local FS)."""
    import json
    import os

    if SparkSession.getActiveSession() is None and "://" not in root:
        path = os.path.join(root, name)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
    fs = StoreFS(root, spark)
    path = f"{root}/{name}"
    if not fs.exists(path):
        return None
    return json.loads(fs.read_text(path))


def write_store_json(root: str, payload: dict, name: str = "_meta.json",
                     spark: SparkSession | None = None) -> None:
    """Write a store-level JSON control file (single small object —
    an atomic PUT on object stores). Same defaultFS resolution rule
    as ``read_store_json``."""
    import json
    import os

    if SparkSession.getActiveSession() is None and "://" not in root:
        path = os.path.join(root, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f)
        return
    StoreFS(root, spark).write_text(f"{root}/{name}", json.dumps(payload))


#: journaled stores this DRIVER PROCESS has touched (root -> the
#: store family's appended-leaf subdir). The meta check every probe/
#: append path goes through registers here, so a CI run's final
#: report can auto-cover the stores it actually used (the r10
#: verdict's order #6) without the operator enumerating them. Process
#: lifetime on purpose: a CI job chains several CLI commands through
#: one driver, and the e2e report at the end covers all of them.
_PARTICIPATING_STORES: dict[str, str] = {}


def note_store_participation(root: str, data_subdir: str) -> None:
    _PARTICIPATING_STORES[str(root)] = data_subdir


def participating_stores() -> dict[str, str]:
    """root -> appended-leaf subdir of every journaled store this
    process has touched (copy; mutation-safe)."""
    return dict(_PARTICIPATING_STORES)


def reset_store_participation() -> None:
    _PARTICIPATING_STORES.clear()


def write_health_event(
    root: str,
    batch_id: int,
    payload: dict,
    spark: SparkSession | None = None,
    keep_last: int = 64,
) -> None:
    """Append a per-epoch health verdict to the store's ``_health/``
    journal — the in-band "rebuild/compact now" signal a streaming
    maintainer emits so the operator doesn't need a side-channel CLI
    sweep to learn the store has drifted. One small JSON object per
    epoch, keyed by batch id, so a replayed micro-batch overwrites
    its OWN event instead of duplicating it (the same exactly-once
    convention as every batch-keyed leaf). Latest state = the event
    with the highest batch id.

    Retention: only the ``keep_last`` most recently WRITTEN events are
    kept — a continuous 5s-trigger stream with ``health_every=1``
    would otherwise grow the journal by ~17k files/day and make every
    ``read_health_events`` call list-and-parse all of them. Recency is
    file modification time, not batch id: the stores' id conventions
    are mixed (stream ids ascend from 0, manual appends DESCEND from
    -2), so any id horizon either never prunes a manual journal or
    prunes a mixed one by id instead of age. Verdicts beyond the
    horizon are superseded state, not an audit log (``keep_last=None``
    disables pruning). Pruning tolerates losing a delete race with a
    concurrent writer — events are independent files and a replayed
    batch rewrites (and re-dates) its own."""
    write_store_json(
        root, {"batch_id": int(batch_id), **payload},
        name=f"_health/batch-{int(batch_id)}.json", spark=spark,
    )
    if keep_last is None:
        return
    for path, _mtime in _health_files_by_age(root, spark)[int(keep_last):]:
        try:
            if SparkSession.getActiveSession() is None and "://" not in root:
                import os

                os.remove(path)
            else:
                StoreFS(root, spark).delete(path)
        except Exception:
            pass


def _health_files_by_age(
    root: str, spark: SparkSession | None = None
) -> list[tuple[str, float]]:
    """The ``_health/`` event files, most recently written first.

    Primary order is mtime desc; the same-timestamp tie-break (coarse
    filesystem clocks, fast availableNow batches) is the PARSED batch
    id's ABSOLUTE value, descending — later batches have larger |id|
    in BOTH namespaces (stream ids ascend 0,1,2,...; manual ids
    descend -2,-3,...), whereas the old raw-filename comparison ranked
    'batch-9' above 'batch-10' and could resurrect a superseded
    verdict or prune the newest event (r10 ADVICE). Known limit: when
    a MIXED journal's manual and stream events land in the same mtime
    second, |id| cannot order ACROSS the namespaces (no id scheme
    can); the next heartbeat's fresher mtime self-heals the order."""
    import os
    import re

    def _ord(path: str) -> int:
        m = re.search(r"batch-(-?\d+)\.json$", path)
        return abs(int(m.group(1))) if m else -1

    if SparkSession.getActiveSession() is None and "://" not in root:
        hdir = os.path.join(root, "_health")
        files: list[tuple[str, float]] = []
        if os.path.isdir(hdir):
            for name in os.listdir(hdir):
                if name.endswith(".json"):
                    p = os.path.join(hdir, name)
                    try:
                        files.append((p, os.stat(p).st_mtime))
                    except OSError:
                        pass
    else:
        fs = StoreFS(root, spark)
        hdir = f"{root}/_health"
        files = (
            fs.list_files_mtime(hdir, suffix=".json")
            if fs.is_dir(hdir) else []
        )
    return sorted(files, key=lambda x: (x[1], _ord(x[0]), x[0]),
                  reverse=True)


def latest_health_event(
    root: str, spark: SparkSession | None = None
) -> dict | None:
    """The most recently WRITTEN ``_health/`` event (None when the
    journal is empty). Recency is file mtime, NOT the highest batch
    id: manual-append stores number batches DOWNWARD from -2, so the
    max-id event there is the oldest verdict — picking it would read
    a freshly-journaled store as stale and resurrect long-superseded
    compact/rebuild flags."""
    import json

    for path, _mtime in _health_files_by_age(root, spark):
        try:
            if SparkSession.getActiveSession() is None and "://" not in root:
                with open(path) as f:
                    return json.load(f)
            return json.loads(StoreFS(root, spark).read_text(path))
        except Exception:
            continue
    return None


def read_health_events(
    root: str, spark: SparkSession | None = None
) -> list[dict]:
    """The health journal, sorted by batch id (empty when none).

    NOT full history: ``write_health_event`` keeps a rolling window of
    the ``keep_last`` (default 64) most recently written events — the
    journal is superseded-state retention, not an audit log (r10
    ADVICE: the default retroactively bounds every maintainer's
    journal, including pre-existing ones; the CLI ``--journal`` views
    surface the same window)."""
    import json
    import os

    events: list[dict] = []
    if SparkSession.getActiveSession() is None and "://" not in root:
        hdir = os.path.join(root, "_health")
        if os.path.isdir(hdir):
            for name in os.listdir(hdir):
                if name.endswith(".json"):
                    with open(os.path.join(hdir, name)) as f:
                        events.append(json.load(f))
        return sorted(events, key=lambda e: e.get("batch_id", -1))
    fs = StoreFS(root, spark)
    hdir = f"{root}/_health"
    if fs.is_dir(hdir):
        for path, _size in fs.list_files(hdir, suffix=".json"):
            events.append(json.loads(fs.read_text(path)))
    return sorted(events, key=lambda e: e.get("batch_id", -1))


def forget_rows(
    spark: SparkSession,
    path: str,
    id_col: str,
    ids: list,
    leaf_cols: list[str],
) -> dict:
    """Right-to-be-forgotten primitive shared by every batch-keyed
    store: physically remove rows whose ``id_col`` is in ``ids`` from
    a ``leaf_cols``-partitioned parquet table at cost proportional to
    the ids' footprint.

    - locate: ONE scan with the id predicate pushed to parquet
      (row-group stats skip untouched files);
    - leaves whose every row is forgotten are DELETED as directories;
    - partially-touched leaves are rewritten survivor-only,
      localCheckpointed first so the rewrite never overwrites files
      its own plan is still reading;
    - untouched leaves are never opened.

    Idempotent: a replayed forget matches nothing. Returns
    {"rows_forgotten", "leaves_rewritten", "leaves_deleted"}."""
    from pyspark.sql import functions as F

    empty = {"rows_forgotten": 0, "leaves_rewritten": 0,
             "leaves_deleted": 0}
    if not ids:
        return empty
    df = spark.read.parquet(path)
    hit = F.col(id_col).isin(ids)
    touched = {
        tuple(r[c] for c in leaf_cols): r["n"]
        for r in df.filter(hit).groupBy(*leaf_cols)
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not touched:
        return empty
    fs = StoreFS(path, spark)

    def _leaf_path(key: tuple) -> str:
        return f"{path}/" + "/".join(
            f"{c}={v}" for c, v in zip(leaf_cols, key)
        )

    def _leaf_pred(key: tuple):
        pred = F.lit(True)
        for c, v in zip(leaf_cols, key):
            pred = pred & (F.col(c) == F.lit(v))
        return pred

    in_touched = None
    for key in touched:
        p = _leaf_pred(key)
        in_touched = p if in_touched is None else (in_touched | p)
    totals = {
        tuple(r[c] for c in leaf_cols): r["n"]
        for r in df.filter(in_touched).groupBy(*leaf_cols)
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    doomed = [k for k in touched if touched[k] == totals[k]]
    partial = [k for k in touched if touched[k] < totals[k]]
    payload = [c for c in df.columns if c not in leaf_cols]
    for key in doomed:
        fs.delete(_leaf_path(key))
    for key in partial:
        # NULL-safe survivor predicate: ~isin(ids) is NULL (not true)
        # for NULL-id rows, which would silently delete them during a
        # forget of unrelated keys — keep them explicitly, matching
        # operators/forget.py's forget_keys.
        survivors = (
            df.filter(_leaf_pred(key))
            .filter(~hit | F.col(id_col).isNull()).select(*payload)
            .localCheckpoint(eager=True)
        )
        survivors.write.mode("overwrite").parquet(_leaf_path(key))
    return {
        "rows_forgotten": sum(touched.values()),
        "leaves_rewritten": len(partial),
        "leaves_deleted": len(doomed),
    }

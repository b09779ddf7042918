"""GriddedTable: a manifest-committed Parquet table.

Why not plain ``df.write.parquet``: the reference's hardest invariants are
write-path invariants (SURVEY §2.2 W13-W15) —

* a failed write must never corrupt the published dataset or its
  metadata (reference ``utils/publish.py:242-265``: on exception only the
  ``update_in_progress`` flag is cleared, attrs stay intact);
* concurrent updates must be refused (``publish.py:358-375``);
* inserts overwrite *regions* (time ranges) surgically
  (``publish.py:406-450``), appends extend the time dimension
  (``publish.py:452-478``);
* dataset attributes persist atomically with the data
  (``utils/store.py:200-247`` writes metadata surgically).

Design — a minimal Iceberg-flavored commit protocol in plain JSON +
Parquet, no extra dependencies:

* Every commit is a **version**: an immutable manifest
  ``_manifests/v{N}.json`` listing data *entries*; each entry =
  ``{bucket, path, min_time, max_time, rows, columns[, stats]}`` —
  ``columns`` is the file's column-set signature (schema-evolution
  detection), ``stats`` per-file min/max for the table's declared
  ``stat_cols`` (manifest-level pruning).  The manifest also records
  ``stat_cols`` itself, so every rewrite re-derives the stats.  Data
  files are written once and never mutated; versions share unchanged
  files.
* ``_latest.json`` is the atomic pointer (temp-file + ``os.replace``)
  carrying ``{version, attrs, update_in_progress}``.  Readers resolve
  the pointer, then the manifest, then ``spark.read.parquet(*paths)``.
* A crashed writer leaves orphan data files and an unreferenced
  manifest — never a broken table.  ``vacuum()`` collects orphans.
* ``bucket`` is a time-derived partition key (default monthly).  The
  time column is *also* stored in the data, so no Hive-style partition
  discovery is needed; manifest-level bucket/stat pruning plays the role
  of the reference's binary search over file time ranges
  (``publish.py:897-949``) and composes with Parquet row-group pruning.

Scale notes: the manifest is one JSON per version listing O(files)
entries — at 100 TB with ~256 MB files that is ~400k entries; fine for a
driver-side JSON (Iceberg does the same before needing manifest lists).
All data movement stays in Spark; this module only renames files the
executors already wrote.

Filesystem abstraction (round 8): every control-plane read/write/list/
delete goes through the :class:`~gridded_etl_tools_spark.sinks.fsio.
ControlFS` seam — local by default, in-memory (object-store semantics:
PUT + conditional PUT only, no rename) under test.  Commit atomicity no
longer leans on ``os.replace``: manifests are written under unique
collision-free names (``v{N}-{lock_token}.json``, Iceberg's model) and
the pointer is published with a COMPARE-AND-SWAP against the exact
bytes this writer observed at lock acquire — on an object store that is
one generation-/etag-conditioned PUT.  A TTL takeover between the
fencing check and the pointer write now makes the final CAS fail
loudly (ADVICE r7: the check-then-act window is closed, not narrowed),
and two zombie writers can never overwrite each other's manifests.
Data-plane I/O (executor parquet writes, footer reads) stays on
Spark/Hadoop/Arrow filesystems, which are already object-store capable.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gridded_etl_tools_spark.sinks.fsio import LOCAL_FS, ControlFS


class ConcurrentWriteError(RuntimeError):
    """Another writer holds ``update_in_progress`` (reference W14)."""


class TableCorruptionGuard(RuntimeError):
    """Refusing an operation that could corrupt the published table."""


class FormatVersionError(RuntimeError):
    """On-disk table protocol version disagrees with this library —
    refuse rather than misread or corrupt (reference
    ``dataset_manager.py:271-286`` / ``store.py:249-271``: the zarr v2/v3
    format-flag consistency check)."""


#: protocol version stamped into every commit; bump on any incompatible
#: manifest/pointer layout change.  v2 (round 8): manifests carry
#: unique names recorded in the pointer (``manifest``) and a
#: ``parent_manifest`` lineage link; v1 tables (fixed ``v{N}.json``
#: names) stay fully readable — only FUTURE versions are refused.
FORMAT_VERSION = 2

DEFAULT_BUCKET_FMT = "yyyy-MM"


@dataclass
class Snapshot:
    version: int
    entries: list[dict[str, Any]]
    attrs: dict[str, Any] = field(default_factory=dict)
    #: columns whose per-file min/max is maintained in the manifest —
    #: declared at write time or adopted by OPTIMIZE, and preserved by
    #: every rewrite so stats-pruning survives sustained mutation
    stat_cols: list[str] = field(default_factory=list)

    def paths(self) -> list[str]:
        return [e["path"] for e in self.entries]

    def buckets(self) -> set[str]:
        return {e["bucket"] for e in self.entries}


class GriddedTable:
    """One published gridded dataset rooted at ``root``."""

    def __init__(
        self,
        root: str,
        time_col: str = "time",
        bucket_fmt: str = DEFAULT_BUCKET_FMT,
        bloom_cols: list[str] | None = None,
        bloom_ndv: int = 100_000,
        stale_lock_seconds: float | None = None,
        fs: "ControlFS | None" = None,
    ):
        """``bloom_cols``: write parquet bloom filters for these columns
        (point-lookup keys that are neither the time axis nor part of the
        sort order — e.g. a station/entity id).  Row-group min/max stats
        only prune SORTED columns; a bloom filter lets the scan skip row
        groups for equality probes on unsorted high-cardinality keys —
        at 100 TB the difference between a point lookup touching every
        file and touching ~one.  ``bloom_ndv``: expected distinct values
        per row group (sizes the filter's false-positive rate).

        ``stale_lock_seconds``: opt-in crashed-writer recovery.  A
        writer that dies between acquiring the update flag and
        committing (or releasing on failure) leaves
        ``update_in_progress`` set forever, and every later write
        raises :class:`ConcurrentWriteError` (the reference has the
        same failure mode — its flag lives in the zarr attrs,
        publish.py:155-268).  With a TTL set, ``_acquire`` breaks a
        lock whose ``locked_at`` is older than the TTL and takes over;
        readers are never affected either way (the published pointer
        version only moves at commit), and any data files the dead
        writer orphaned are swept by :meth:`vacuum`.  Default ``None``
        keeps strict mutual exclusion: never break a lock that might
        belong to a live slow writer; use :meth:`force_unlock` for
        manual recovery.

        ``fs``: the control-plane filesystem seam (pointer, lock,
        manifests, gardening).  Defaults to the local filesystem; an
        object-store implementation needs exactly the
        :class:`~gridded_etl_tools_spark.sinks.fsio.ControlFS` contract
        (atomic PUT + conditional PUT)."""
        self.root = root
        self.time_col = time_col
        self.bucket_fmt = bucket_fmt
        self.bloom_cols = bloom_cols or []
        self.bloom_ndv = bloom_ndv
        self.stale_lock_seconds = stale_lock_seconds
        self._fs = fs if fs is not None else LOCAL_FS

    # -- layout ------------------------------------------------------------

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.root, "_manifests")

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_latest.json")

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    # -- pointer / manifest ------------------------------------------------

    def exists(self) -> bool:
        return self._fs.exists(self._pointer_path)

    @staticmethod
    def _pointer_text(pointer: dict[str, Any]) -> str:
        """Deterministic pointer serialization; keys starting with ``_``
        are writer-local bookkeeping (the CAS witness), never persisted."""
        clean = {k: v for k, v in pointer.items() if not k.startswith("_")}
        return json.dumps(clean, indent=2, sort_keys=True, default=str)

    def _read_pointer_text(self) -> str:
        return self._fs.read_text(self._pointer_path)

    def _read_pointer(self) -> dict[str, Any]:
        pointer = json.loads(self._read_pointer_text())
        # Grandfather older tables: pointers written before the
        # format_version field existed ARE v1 layout, and v1's fixed
        # manifest names remain readable under v2's resolution fallback
        # (reference ``store.py:249-271`` likewise tolerates both zarr
        # format flags).  Only FUTURE protocol versions are refused.
        declared = pointer.get("format_version", 1)
        if declared > FORMAT_VERSION:
            raise FormatVersionError(
                f"{self.root}: on-disk table protocol v{declared} > "
                f"library v{FORMAT_VERSION}; refusing to open "
                "(upgrade the library to read this table)"
            )
        return pointer

    def _write_pointer(self, pointer: dict[str, Any]) -> None:
        """Unconditional atomic swap — recovery/test hook; the protocol's
        own mutations go through the acquire/commit CAS instead."""
        self._fs.write_atomic(self._pointer_path, self._pointer_text(pointer))

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._manifest_dir, name)

    def _resolve_manifest(
        self, version: int, pointer: dict[str, Any] | None = None
    ) -> str:
        """Committed manifest filename for ``version``: the pointer's own
        record for the live version, the legacy fixed name for v1-era
        commits, a unique ``v{N}-{token}.json`` otherwise; ambiguity
        (a zombie writer's orphan beside the committed manifest) is
        settled by walking the ``parent_manifest`` lineage from the
        pointer — the chain only ever contains committed manifests."""
        pointer = pointer or self._read_pointer()
        if version == pointer.get("version") and pointer.get("manifest"):
            return pointer["manifest"]
        legacy = f"v{version}.json"
        if self._fs.exists(self._manifest_path(legacy)):
            return legacy  # fixed v1-era names were only ever committed
        # unique-named manifests resolve ONLY through the committed
        # lineage: a name scan could return a zombie writer's orphan —
        # a manifest for this version that never won its commit CAS —
        # as history (and would, once the real one is expired)
        for v, name, _m in self._walk_committed(pointer):
            if v == version:
                return name
        raise FileNotFoundError(
            f"{self.root}: no committed manifest for version {version} "
            "(expired, or never committed)"
        )

    def _walk_committed(self, pointer: dict[str, Any] | None = None):
        """Yield ``(version, manifest_name, manifest_dict)`` from the
        live version back through the ``parent_manifest`` lineage —
        the committed chain and nothing else (stops at v0 or the
        retention horizon)."""
        pointer = pointer or self._read_pointer()
        version = pointer["version"]
        name = pointer.get("manifest") or f"v{version}.json"
        while True:
            try:
                m = json.loads(self._fs.read_text(self._manifest_path(name)))
            except FileNotFoundError:
                return  # expired beyond the retention horizon
            yield version, name, m
            if version <= 0:
                return
            name = m.get("parent_manifest") or f"v{version - 1}.json"
            version -= 1

    def snapshot(self, version: int | None = None) -> Snapshot:
        pointer = self._read_pointer()
        if version is None:
            version = pointer["version"]
        name = self._resolve_manifest(version, pointer)
        m = json.loads(self._fs.read_text(self._manifest_path(name)))
        return Snapshot(
            version=m["version"],
            entries=m["entries"],
            attrs=m.get("attrs", {}),
            stat_cols=m.get("stat_cols", []),
        )

    def attrs(self) -> dict[str, Any]:
        return self._read_pointer().get("attrs", {})

    def update_in_progress(self) -> bool:
        return self.exists() and bool(self._read_pointer().get("update_in_progress"))

    # -- concurrency flag (reference publish.py:155-268, 358-375) ----------

    def _acquire(self) -> dict[str, Any]:
        if not self.exists():
            return {
                "version": -1,
                "attrs": {},
                "update_in_progress": True,
                "lock_token": uuid.uuid4().hex,
                "_cas_witness": None,  # pointer must not exist at commit
            }
        observed = self._read_pointer_text()
        pointer = json.loads(observed)
        declared = pointer.get("format_version", 1)
        if declared > FORMAT_VERSION:
            raise FormatVersionError(
                f"{self.root}: on-disk table protocol v{declared} > "
                f"library v{FORMAT_VERSION}; refusing to open"
            )
        if pointer.get("update_in_progress"):
            if "locked_at" not in pointer:
                # legacy lock written before locked_at existed: its age is
                # unknowable, so a TTL must never auto-break it (a live
                # pre-upgrade writer would be corrupted the moment one
                # side enables stale_lock_seconds) — manual force_unlock
                # is the only recovery
                raise ConcurrentWriteError(
                    f"update already in progress on {self.root} "
                    f"(version {pointer['version']}, lock age unknown — "
                    "pre-TTL lock; use force_unlock() after confirming "
                    "the writer is dead)"
                )
            age = time.time() - pointer["locked_at"]
            if (
                self.stale_lock_seconds is not None
                and age >= self.stale_lock_seconds
            ):
                # crashed-writer takeover: the published version never
                # moved, so adopting the flag is safe for readers; the
                # dead writer's orphan data files fall to vacuum(), and
                # the fresh lock_token below fences it out — if it is in
                # fact alive, its _commit/_release_failed see a token
                # mismatch and raise instead of silently overwriting
                # this writer's manifest (lost update)
                pass
            else:
                raise ConcurrentWriteError(
                    f"update already in progress on {self.root} "
                    f"(version {pointer['version']}, lock age {age:.0f}s)"
                )
        pointer["update_in_progress"] = True
        pointer["locked_at"] = time.time()
        pointer["lock_token"] = uuid.uuid4().hex
        locked = self._pointer_text(pointer)
        # CAS against the exact bytes observed above: two writers racing
        # for the same free (or same expired) lock cannot both win
        if not self._fs.compare_and_swap(self._pointer_path, locked, observed):
            raise ConcurrentWriteError(
                f"lost the lock race on {self.root} (another writer "
                "acquired between read and swap)"
            )
        # the commit CAS later verifies the pointer is STILL these bytes
        pointer["_cas_witness"] = locked
        return pointer

    def _check_fencing(self, pointer: dict[str, Any]) -> None:
        """Early fencing-token check: a writer whose lock was broken by a
        TTL takeover (or force_unlock + re-acquire) fails here before
        writing a manifest.  This is an OPTIMIZATION, not the guarantee —
        the commit's pointer CAS against the acquire-time bytes is what
        makes a takeover-raced commit impossible (ADVICE r7: the
        check-then-act window between this check and the pointer write
        is closed by that CAS, and manifests are uniquely named so a
        zombie can't overwrite the new owner's either).  Pre-existence
        pointers (version -1) have nothing on disk to fence against."""
        if pointer["version"] < 0 or not self.exists():
            return
        fresh = self._read_pointer()
        if fresh.get("lock_token") != pointer.get("lock_token"):
            raise ConcurrentWriteError(
                f"lock on {self.root} was taken over while this writer "
                "was working (stale-lock TTL or force_unlock); aborting "
                "commit to avoid overwriting the new owner's version"
            )

    def force_unlock(self) -> None:
        """Manually clear a crashed writer's update flag (operational
        recovery; see ``stale_lock_seconds``).  Never call while a
        writer might still be alive — two concurrent committers can
        each publish a version numbered from the same parent, and the
        second ``os.replace`` would silently supersede the first."""
        if not self.exists():
            return
        pointer = self._read_pointer()
        if pointer.get("update_in_progress"):
            pointer["update_in_progress"] = False
            pointer.pop("locked_at", None)
            pointer.pop("lock_token", None)
            self._write_pointer(pointer)

    def _release_failed(self, pointer: dict[str, Any]) -> None:
        """On failure: clear the flag, change nothing else — the published
        version and attrs survive untouched (reference publish.py:242-252).
        The clear is a CAS against the acquire-time bytes: if the lock
        was taken over meanwhile, the CAS no-ops and the flag stays with
        the new owner (no read-check-write window)."""
        if pointer["version"] >= 0:
            cleared = dict(pointer)
            cleared["update_in_progress"] = False
            cleared.pop("locked_at", None)
            cleared.pop("lock_token", None)
            self._fs.compare_and_swap(
                self._pointer_path,
                self._pointer_text(cleared),
                pointer.get("_cas_witness"),
            )

    def _commit(
        self,
        pointer: dict[str, Any],
        entries: list[dict[str, Any]],
        attrs: dict[str, Any],
        stat_cols: list[str] | tuple[str, ...] = (),
    ) -> Snapshot:
        self._check_fencing(pointer)
        version = pointer["version"] + 1
        # unique, collision-free manifest name (Iceberg's model): two
        # writers racing the same parent version write DIFFERENT files;
        # the pointer CAS below picks exactly one winner and the loser's
        # manifest is vacuum-able debris, never an overwrite
        name = f"v{version}-{pointer['lock_token']}.json"
        parent = None
        if version > 0:
            parent = pointer.get("manifest") or f"v{pointer['version']}.json"
        manifest = {
            "version": version,
            "entries": entries,
            "attrs": attrs,
            "stat_cols": list(stat_cols),
            "parent_manifest": parent,
        }
        self._fs.write_atomic(
            self._manifest_path(name),
            json.dumps(manifest, indent=2, sort_keys=True, default=str),
        )
        published = self._pointer_text(
            {
                "version": version,
                "attrs": attrs,
                "update_in_progress": False,
                "format_version": FORMAT_VERSION,
                "manifest": name,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        # the commit point: conditional swap against the acquire-time
        # bytes.  On an object store this is the one generation-checked
        # PUT the whole protocol needs.
        if not self._fs.compare_and_swap(
            self._pointer_path, published, pointer.get("_cas_witness")
        ):
            raise ConcurrentWriteError(
                f"lock on {self.root} was taken over while this writer "
                "was working (stale-lock TTL or force_unlock); the "
                "pointer moved, so this commit is abandoned — its "
                "manifest and data files fall to vacuum()"
            )
        return Snapshot(
            version=version,
            entries=entries,
            attrs=attrs,
            stat_cols=list(stat_cols),
        )

    # -- data-file production ----------------------------------------------

    def _align_schema(
        self, df: DataFrame, snap: Snapshot, evolve: bool = False
    ) -> DataFrame:
        """Schema enforcement at the write boundary (what Delta calls
        ``mergeSchema=false``): incoming updates are cast to the table's
        committed column types so one update can never fork the on-disk
        schema (e.g. a ``value + 1000.0`` promoting float→double would
        otherwise write DOUBLE pages into a FLOAT table and break every
        subsequent multi-file read).  By default column *set* changes are
        refused — that is a migration, not an update.

        ``evolve=True`` is the opt-in migration path (Delta's
        ``mergeSchema=true``): existing columns are still cast to their
        committed types (type forks stay impossible), but NEW columns are
        written through, and columns the update omits are simply absent
        from the new files — ``read()`` detects the divergence from the
        manifest's per-file column signatures and turns on parquet
        schema merging, surfacing absences as NULL."""
        if not snap.entries:
            return df
        target = df.sparkSession.read.parquet(snap.entries[0]["path"]).schema
        if not evolve and set(df.columns) != set(target.names):
            raise TableCorruptionGuard(
                f"update columns {sorted(df.columns)} != table columns "
                f"{sorted(target.names)}; pass evolve_schema=True to migrate"
            )
        typed = {f.name: f.dataType for f in target.fields}
        present = set(df.columns)
        ordered = [f.name for f in target.fields if f.name in present] + [
            c for c in df.columns if c not in typed
        ]
        return df.select(
            *[
                F.col(c).cast(typed[c]).alias(c) if c in typed else F.col(c)
                for c in ordered
            ]
        )

    def _schema_reader(self, spark: SparkSession, entries: list[dict[str, Any]]):
        """Reader with parquet schema merging enabled iff the per-file
        column signatures in ``entries`` diverge (the same detection
        :meth:`read` uses).  Every internal REWRITE (merge / delete /
        optimize) must read through this: a plain read of
        mixed-generation files infers the schema from one arbitrary
        file and would silently drop evolved columns from the files it
        rewrites — permanent data loss, not a read-time artifact."""
        sigs = {tuple(e["columns"]) for e in entries if "columns" in e}
        legacy = any("columns" not in e for e in entries)
        reader = spark.read
        if len(sigs) > 1 or (sigs and legacy):
            reader = reader.option("mergeSchema", "true")
        return reader

    @staticmethod
    def _time_key(v) -> str:
        """Canonical sortable string for time-stat comparisons.  Manifest
        stats are ``str(datetime)`` (space-separated, see
        :meth:`_file_stats`); a caller passing an ISO-8601 ``T``-separated
        string would otherwise compare ``"2024-01-02T…" > "2024-01-02 …"``
        lexically and wrongly prune overlapping files — normalize the
        separator on BOTH sides before comparing.  A bare DATE bound
        (``datetime.date`` or ``"YYYY-MM-DD"``) is padded to midnight:
        unpadded it sorts BELOW every same-day stat string, so a
        ``time_hi`` date would wrongly prune the file containing exactly
        the midnight rows the row-level filter keeps.

        Non-temporal strings are returned UNMODIFIED: normalization
        substitutions (``Z`` → ``+00:00``, `` UTC`` → ``+00:00``) are
        attempted only as parse candidates and kept only when the
        candidate actually parses as an instant.  Blindly rewriting
        characters first is not order-preserving for ordinary strings —
        a stat pair like ``["ATA", "ATZ"]`` would collapse below a probe
        ``"ATM"`` and silently prune (then MERGE-skip) the file."""
        import datetime as _dt

        raw = str(v)
        candidates = [raw]
        if raw.endswith("Z"):
            candidates.append(raw[:-1] + "+00:00")
        if raw.endswith(" UTC"):
            candidates.append(raw[:-4] + "+00:00")
        for s in candidates:
            try:
                # full normalization: any parseable instant (incl.
                # non-UTC offsets — '…05:00:00+05:00' must compare EQUAL
                # to '…00:00:00' UTC, not lexically above it) converts to
                # a naive-UTC string; bare dates parse to midnight; the
                # ISO 'T' separator is accepted by fromisoformat natively
                parsed = _dt.datetime.fromisoformat(s)
            except ValueError:
                continue
            if parsed.tzinfo is not None:
                parsed = parsed.astimezone(_dt.timezone.utc).replace(
                    tzinfo=None
                )
            return f"{parsed:%Y-%m-%d %H:%M:%S.%f}"
        # sentinels ('', '9999') and non-time strings: compare as-is
        return raw

    @classmethod
    def _prune_entries(
        cls,
        entries: list[dict[str, Any]],
        time_lo=None,
        time_hi=None,
        where: dict[str, tuple[Any, Any]] | None = None,
    ) -> list[dict[str, Any]]:
        """Manifest-level pruning, shared by :meth:`read`,
        :meth:`pruned_file_count`, :meth:`merge_upsert`, and
        :meth:`optimize`: time-range overlap on the recorded per-file
        (min_time, max_time), then stats-range overlap per ``where``
        column.  Files without stats for a column are conservatively
        kept; ``None`` bounds are open; a fully-None range (empty/all-NULL
        probe) prunes nothing."""
        if time_lo is not None:
            lo_k = cls._time_key(time_lo)
            entries = [e for e in entries if cls._time_key(e["max_time"]) >= lo_k]
        if time_hi is not None:
            hi_k = cls._time_key(time_hi)
            entries = [e for e in entries if cls._time_key(e["min_time"]) <= hi_k]
        for col, (lo, hi) in (where or {}).items():
            if lo is None and hi is None:
                continue
            entries = [
                e
                for e in entries
                if col not in e.get("stats", {})
                or cls._stat_overlaps(
                    e["stats"][col][0], e["stats"][col][1], lo, hi
                )
            ]
        return entries

    @classmethod
    def _stat_overlaps(cls, stat_lo, stat_hi, lo, hi) -> bool:
        """Range-overlap test between a file's recorded [stat_lo,
        stat_hi] and the caller's [lo, hi].  Numeric stats compare
        natively; temporal/string stats go through :meth:`_time_key` —
        manifest JSON stringifies datetime stats (``default=str``), so
        a datetime bound against a reloaded manifest would otherwise
        raise TypeError (str vs datetime), and string-vs-string hits
        the same separator/date-padding pitfalls the time axis fixes."""
        if isinstance(stat_lo, str) or isinstance(lo, str) or isinstance(hi, str):
            k = cls._time_key
            return not (
                (hi is not None and k(stat_lo) > k(hi))
                or (lo is not None and k(stat_hi) < k(lo))
            )
        try:
            return not (
                (hi is not None and stat_lo > hi)
                or (lo is not None and stat_hi < lo)
            )
        except TypeError:  # e.g. datetime bound vs date stat
            k = cls._time_key
            return not (
                (hi is not None and k(stat_lo) > k(hi))
                or (lo is not None and k(stat_hi) < k(lo))
            )

    def _bucket_col(self):
        return F.date_format(F.col(self.time_col), self.bucket_fmt)

    def _write_data_files(
        self,
        df: DataFrame,
        sort_cols: list[str],
        stat_cols: tuple[str, ...] = (),
        sort_exprs: list | None = None,
        drop_after_sort: tuple[str, ...] = (),
        range_partition: int = 0,
    ) -> list[dict[str, Any]]:
        """Write ``df`` as new immutable parquet files partitioned by time
        bucket; return manifest entries with per-file time stats (plus
        per-file min/max for each of ``stat_cols`` — the hook
        :meth:`optimize` uses to make spatial clustering prunable at the
        manifest level).

        Layout choices for scale: ``repartition(bucket)`` aligns Spark
        partitions with storage buckets (one shuffle, map-side combine
        free for downstream per-bucket work) and
        ``sortWithinPartitions(time, *sort_cols)`` gives every file
        monotone time + spatially clustered rows, so parquet row-group
        stats prune both time and space predicates — the analog of the
        reference's zarr chunk layout (dataset_manager.py:220-221).
        ``sort_exprs`` replaces that default ordering entirely (z-order
        rewrites sort space-first); ``drop_after_sort`` drops helper
        columns (e.g. the Morton code) after ordering, before the bytes
        hit disk — a projection preserves partition-local order.
        ``range_partition=N`` switches the bucket-hash shuffle to a
        RANGE partitioning into N explicit partitions over the ordering,
        so one bucket splits into several files each covering a
        contiguous slice — what gives z-order rewrites per-FILE (not
        just per-row-group) prunable extents.
        """
        staging = os.path.join(self._data_dir, uuid.uuid4().hex)
        ordering = (
            sort_exprs
            if sort_exprs is not None
            else [self.time_col, *sort_cols]
        )
        df = df.withColumn("__bucket", self._bucket_col())
        if range_partition:
            # explicit partition count: AQE would otherwise coalesce the
            # range shuffle and collapse the per-file extents OPTIMIZE
            # exists to create
            part = df.repartitionByRange(range_partition, "__bucket", *ordering)
        else:
            part = df.repartition(F.col("__bucket"))
        part = part.sortWithinPartitions(*ordering)
        for c in drop_after_sort:
            part = part.drop(c)
        writer = part.write.partitionBy("__bucket")
        for c in self.bloom_cols:
            # parquet-mr suppresses bloom filters for dictionary-only
            # column chunks (the dictionary already answers membership);
            # a declared bloom key is by definition high-cardinality, so
            # force plain encoding to make the filter deterministic
            # instead of depending on dictionary fallback
            writer = (
                writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
                .option(f"parquet.bloom.filter.expected.ndv#{c}", str(self.bloom_ndv))
                .option(f"parquet.enable.dictionary#{c}", "false")
            )
        writer.parquet(staging)
        entries: list[dict[str, Any]] = []
        for bucket_dir in sorted(os.listdir(staging)):
            if not bucket_dir.startswith("__bucket="):
                continue
            bucket = bucket_dir.split("=", 1)[1]
            bdir = os.path.join(staging, bucket_dir)
            for fname in sorted(os.listdir(bdir)):
                if not fname.endswith(".parquet"):
                    continue
                path = os.path.join(bdir, fname)
                entries.append(
                    {"bucket": bucket, "path": path, **self._file_stats(path, stat_cols)}
                )
        return entries

    @staticmethod
    def _footer_minmax(md, name: str):
        """Footer-only min/max of one column across row groups (None when
        the column has no usable statistics)."""
        idx = md.schema.to_arrow_schema().get_field_index(name)
        if idx < 0:
            return None, None
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return lo, hi

    def _file_stats(self, path: str, stat_cols: tuple[str, ...] = ()) -> dict[str, Any]:
        """Per-file (rows, min_time, max_time) from the parquet footer —
        no data scan, exactly the stats a format like Iceberg tracks.
        ``stat_cols`` adds a ``stats: {col: [min, max]}`` block for
        manifest-level pruning on non-time axes (see :meth:`optimize`)."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        lo, hi = self._footer_minmax(md, self.time_col)
        out: dict[str, Any] = {
            "rows": md.num_rows,
            "min_time": str(lo) if lo is not None else "",
            "max_time": str(hi) if hi is not None else "9999",
            # column-set signature: lets read() detect schema evolution
            # from the manifest alone and only pay parquet mergeSchema
            # when file schemas actually diverge
            "columns": sorted(md.schema.to_arrow_schema().names),
        }
        stats: dict[str, list[Any]] = {}
        for c in stat_cols:
            clo, chi = self._footer_minmax(md, c)
            if clo is not None:
                # numpy scalars -> native python so the manifest JSON
                # round-trips to comparable types
                stats[c] = [
                    getattr(clo, "item", lambda v=clo: v)(),
                    getattr(chi, "item", lambda v=chi: v)(),
                ]
        if stats:
            out["stats"] = stats
        return out

    # -- public write API ----------------------------------------------------

    def write_initial(
        self,
        df: DataFrame,
        sort_cols: list[str] | None = None,
        attrs: dict[str, Any] | None = None,
        overwrite: bool = False,
        stat_cols: list[str] | None = None,
    ) -> Snapshot:
        """Initial publish (reference ``write_initial_zarr``,
        publish.py:301-318).  Refuses to clobber an existing table unless
        ``overwrite`` (reference publish_data's rebuild/allow_overwrite
        branch, publish.py:86-129).

        ``stat_cols``: declare columns whose per-file min/max should be
        tracked in the manifest from day one (a table property — every
        later append/merge/delete rewrite maintains them), so a keyed
        MERGE or ``read(where=...)`` gets manifest-level pruning BEFORE
        the first OPTIMIZE pass ever runs.  The footer read is free; the
        files are time-sorted so non-time stats only prune well once the
        data is clustered, but correctness never depends on them."""
        if self.exists() and not overwrite:
            raise TableCorruptionGuard(
                f"{self.root} already exists; pass overwrite=True to rebuild"
            )
        declared = list(stat_cols or [])
        pointer = self._acquire()
        try:
            entries = self._write_data_files(
                df, sort_cols or [], stat_cols=tuple(declared)
            )
            return self._commit(pointer, entries, attrs or {}, stat_cols=declared)
        except Exception:
            self._release_failed(pointer)
            raise

    def append(
        self,
        df: DataFrame,
        sort_cols: list[str] | None = None,
        attrs_update: dict[str, Any] | None = None,
        evolve_schema: bool = False,
        stat_cols: list[str] | None = None,
    ) -> Snapshot:
        """Append new times (reference ``append_to_dataset``,
        publish.py:452-478): new data files; manifest = old ∪ new.
        ``evolve_schema=True`` additionally admits new columns (see
        ``_align_schema``).  The table's declared/adopted ``stat_cols``
        are maintained: new files get per-file min/max for them too.
        ``stat_cols`` widens the declaration mid-life (union with the
        existing property): NEW files carry the added columns' stats,
        pre-existing files stay stat-less for them and are
        conservatively kept by pruning until OPTIMIZE or a rewrite
        touches them."""
        pointer = self._acquire()
        try:
            snap = self.snapshot(pointer["version"])
            declared = list(snap.stat_cols) + [
                c for c in (stat_cols or []) if c not in snap.stat_cols
            ]
            df = self._align_schema(df, snap, evolve=evolve_schema)
            entries = snap.entries + self._write_data_files(
                df, sort_cols or [], stat_cols=tuple(declared)
            )
            attrs = {**pointer.get("attrs", {}), **(attrs_update or {})}
            return self._commit(pointer, entries, attrs, stat_cols=declared)
        except Exception:
            self._release_failed(pointer)
            raise

    def overwrite_buckets(
        self,
        df: DataFrame,
        buckets: set[str],
        sort_cols: list[str] | None = None,
        attrs_update: dict[str, Any] | None = None,
    ) -> Snapshot:
        """Surgical region overwrite (reference ``insert_into_dataset``,
        publish.py:406-450): replace exactly the given buckets' files with
        new data.  The caller is responsible for ``df`` containing the
        *complete* contents of those buckets (see
        :func:`publish.insert_into` which widens via combine_first —
        reference ``complete_insert_slice``, publish.py:1341-1385)."""
        pointer = self._acquire()
        try:
            snap = self.snapshot(pointer["version"])
            df = self._align_schema(df, snap)
            new_entries = self._write_data_files(
                df, sort_cols or [], stat_cols=tuple(snap.stat_cols)
            )
            produced = {e["bucket"] for e in new_entries}
            if not produced <= buckets:
                raise TableCorruptionGuard(
                    f"insert produced buckets {produced - buckets} outside "
                    f"the declared overwrite set {buckets}"
                )
            kept = [e for e in snap.entries if e["bucket"] not in buckets]
            attrs = {**pointer.get("attrs", {}), **(attrs_update or {})}
            return self._commit(
                pointer, kept + new_entries, attrs, stat_cols=snap.stat_cols
            )
        except Exception:
            self._release_failed(pointer)
            raise

    @staticmethod
    def _norm_file_uri(p: str) -> str:
        """``input_file_name()`` URIs -> the plain os paths manifests use."""
        from urllib.parse import unquote, urlparse

        if p.startswith("file:"):
            p = unquote(urlparse(p).path)
        return os.path.abspath(p)

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: list[str],
        sort_cols: list[str] | None = None,
        attrs_update: dict[str, Any] | None = None,
        evolve_schema: bool = False,
    ) -> Snapshot:
        """Keyed MERGE (the Delta ``MERGE INTO`` / Iceberg upsert shape):
        rows of ``updates`` whose ``key_cols`` match an existing row
        REPLACE that row; unmatched rows are inserted.  The reference has
        no keyed upsert — its updates are whole-time-slice overwrites
        (publish.py:406-450) — but a relational port needs one the moment
        late-arriving corrections stop aligning with chunk boundaries.

        Scale shape (what Delta calls *merge touched files only*):

        1. **Manifest prune** — when ``time_col`` is part of the key, the
           batch's [min, max] time (two scalars) drops every file whose
           stat range cannot contain a matching key: a recent-data MERGE
           against a 100 TB table reads only the recent sliver.
        2. **Key probe** — surviving files are scanned reading ONLY the
           key columns (+ ``input_file_name``), semi-joined against the
           distinct update keys to find the touched-file set.  The join
           strategy is left to AQE: a typical batch broadcasts, a huge
           backfill degrades to a shuffle instead of OOMing the driver.
        3. **Surgical rewrite** — only touched files are re-read in full;
           their unmatched rows survive via an anti-join and the update
           batch is unioned in.  Untouched files keep their manifest
           entries byte-for-byte; readers of prior versions are
           unaffected (immutable files + new manifest = ACID).

        Precondition: ``key_cols`` identify rows uniquely in the TABLE
        (the usual primary-key contract).  Duplicate keys *within the
        batch* are written as-is (multiset semantics) — dedup the batch
        first (`dedup_keep_best`) when that is not intended.
        """
        pointer = self._acquire()
        try:
            # MERGE into a table that does not exist yet bootstraps it
            # (the Delta "MERGE creates the target" convenience) instead
            # of crashing on a v-1 manifest read
            snap = (
                self.snapshot(pointer["version"])
                if pointer["version"] >= 0
                else Snapshot(version=-1, entries=[])
            )
            attrs = {**pointer.get("attrs", {}), **(attrs_update or {})}
            if not snap.entries:
                entries = self._write_data_files(
                    updates, sort_cols or [], stat_cols=tuple(snap.stat_cols)
                )
                return self._commit(
                    pointer, entries, attrs, stat_cols=snap.stat_cols
                )
            updates = self._align_schema(updates, snap, evolve=evolve_schema)
            # one materialization: the batch feeds the key probe, the
            # anti-join, and the final union — localCheckpoint guarantees
            # all three branches see identical rows even for
            # nondeterministic upstreams
            updates = updates.localCheckpoint(eager=True)
            candidates = snap.entries
            if self.time_col in key_cols:
                lo, hi = updates.agg(
                    F.min(self.time_col), F.max(self.time_col)
                ).first()
                if lo is not None:
                    candidates = self._prune_entries(
                        candidates, time_lo=lo, time_hi=hi
                    )
            # stats-pruning on NON-time key columns: after OPTIMIZE the
            # manifest carries per-file min/max for the cluster columns,
            # so a keyed merge on (say) user_id skips every z-file whose
            # recorded range cannot contain a batch key — two scalars per
            # column, files without stats (or an all-NULL/empty batch
            # range) are conservatively kept
            stat_keys = [
                c
                for c in key_cols
                if c != self.time_col
                and any(c in e.get("stats", {}) for e in candidates)
            ]
            if stat_keys:
                row = updates.agg(
                    *[m(c) for c in stat_keys for m in (F.min, F.max)]
                ).first()
                candidates = self._prune_entries(
                    candidates,
                    where={
                        c: (row[2 * i], row[2 * i + 1])
                        for i, c in enumerate(stat_keys)
                    },
                )
            keys = updates.select(*key_cols).dropDuplicates(key_cols)
            keys = keys.localCheckpoint(eager=True)  # probe + anti-join reuse
            touched: set[str] = set()
            if candidates:
                probe = (
                    self._schema_reader(spark, candidates)
                    .parquet(*[e["path"] for e in candidates])
                    .withColumn("__file", F.input_file_name())
                    .select("__file", *key_cols)
                )
                hit = (
                    probe.join(keys, key_cols, "left_semi")
                    .select("__file")
                    .distinct()
                    .collect()
                )
                touched = {self._norm_file_uri(r[0]) for r in hit}
            if touched:
                touched_entries = [
                    e
                    for e in snap.entries
                    if os.path.abspath(e["path"]) in touched
                ]
                current = self._schema_reader(spark, touched_entries).parquet(
                    *[e["path"] for e in touched_entries]
                )
                kept_rows = current.join(keys, key_cols, "left_anti")
                # allowMissingColumns: touched files may predate a column
                # the aligned batch carries (schema evolution) — those
                # rows never had it, NULL is the correct fill
                merged = kept_rows.unionByName(
                    updates, allowMissingColumns=True
                )
            else:
                merged = updates
            # stat_cols preserved across the rewrite: a z-ordered file a
            # MERGE touches loses its z-order (expected — the rewrite is
            # time-sorted) but keeps per-file min/max for the table's
            # stat columns, so manifest pruning does not erode under
            # sustained mutation
            new_entries = self._write_data_files(
                merged, sort_cols or [], stat_cols=tuple(snap.stat_cols)
            )
            kept_entries = [
                e
                for e in snap.entries
                if os.path.abspath(e["path"]) not in touched
            ]
            return self._commit(
                pointer, kept_entries + new_entries, attrs,
                stat_cols=snap.stat_cols,
            )
        except Exception:
            self._release_failed(pointer)
            raise

    def delete_where(
        self,
        spark: SparkSession,
        condition,
        sort_cols: list[str] | None = None,
        attrs_update: dict[str, Any] | None = None,
    ) -> Snapshot:
        """Predicate DELETE (the Delta ``DELETE FROM ... WHERE`` shape):
        rewrite ONLY the files that contain at least one matching row,
        dropping those rows; every other file's manifest entry survives
        untouched.  Two passes, both minimal: the probe scan reads only
        the predicate's columns (+ ``input_file_name`` — Parquet column
        pruning does the rest), the rewrite re-reads just the touched
        files.  A no-match delete is a no-op that writes nothing.

        ``condition`` is a Column or SQL string over the table's columns.
        """
        cond = F.expr(condition) if isinstance(condition, str) else condition
        if not self.exists():
            raise TableCorruptionGuard(
                f"delete_where on non-existent table {self.root}; "
                "publish with write_initial first"
            )
        pointer = self._acquire()
        try:
            snap = self.snapshot(pointer["version"])
            attrs = {**pointer.get("attrs", {}), **(attrs_update or {})}
            if not snap.entries:
                self._release_failed(pointer)
                return snap
            hit = (
                self._schema_reader(spark, snap.entries)
                .parquet(*snap.paths())
                .withColumn("__file", F.input_file_name())
                .filter(cond)
                .select("__file")
                .distinct()
                .collect()
            )
            touched = {self._norm_file_uri(r[0]) for r in hit}
            if not touched:
                self._release_failed(pointer)
                return snap
            touched_entries = [
                e
                for e in snap.entries
                if os.path.abspath(e["path"]) in touched
            ]
            # keep every row where cond is NOT TRUE — plain ~cond would
            # also drop NULL-evaluating rows from touched files while
            # identical rows in untouched files survive (SQL DELETE
            # removes only rows where the predicate IS TRUE)
            kept_rows = (
                self._schema_reader(spark, touched_entries)
                .parquet(*[e["path"] for e in touched_entries])
                .filter(~F.coalesce(cond.cast("boolean"), F.lit(False)))
            )
            new_entries = self._write_data_files(
                kept_rows, sort_cols or [], stat_cols=tuple(snap.stat_cols)
            )
            kept_entries = [
                e
                for e in snap.entries
                if os.path.abspath(e["path"]) not in touched
            ]
            return self._commit(
                pointer, kept_entries + new_entries, attrs,
                stat_cols=snap.stat_cols,
            )
        except Exception:
            self._release_failed(pointer)
            raise

    def write_metadata_only(self, attrs_update: dict[str, Any]) -> Snapshot:
        """Attrs-only commit (reference ``write_metadata_only``,
        store.py:200-247): same data entries, new version with merged
        attrs."""
        if not self.exists():
            raise TableCorruptionGuard(
                f"write_metadata_only on non-existent table {self.root}; "
                "publish with write_initial first"
            )
        pointer = self._acquire()
        try:
            snap = self.snapshot(pointer["version"])
            attrs = {**pointer.get("attrs", {}), **attrs_update}
            return self._commit(
                pointer, snap.entries, attrs, stat_cols=snap.stat_cols
            )
        except Exception:
            self._release_failed(pointer)
            raise

    def compact(
        self,
        spark: SparkSession,
        target_file_rows: int = 5_000_000,
        sort_cols: list[str] | None = None,
    ) -> Snapshot:
        """Maintenance job replacing the reference's chunk-alignment
        machinery (``calculate_time_dim_chunks``, publish.py:1296-1338):
        rewrite buckets whose file count exceeds what ``target_file_rows``
        needs, restoring the one-sorted-run-per-bucket layout that append
        fragments over time."""
        if not self.exists():
            raise TableCorruptionGuard(
                f"compact on non-existent table {self.root}; "
                "publish with write_initial first"
            )
        pointer = self._acquire()
        try:
            snap = self.snapshot(pointer["version"])
            by_bucket: dict[str, list[dict[str, Any]]] = {}
            for e in snap.entries:
                by_bucket.setdefault(e["bucket"], []).append(e)
            rewrite = {
                b: es
                for b, es in by_bucket.items()
                if len(es) > max(1, sum(x["rows"] for x in es) // target_file_rows + 1)
            }
            if not rewrite:
                self._release_failed(pointer)  # no-op: just clear the flag
                return snap
            rewrite_entries = [e for es in rewrite.values() for e in es]
            df = self._schema_reader(spark, rewrite_entries).parquet(
                *[e["path"] for e in rewrite_entries]
            )
            new_entries = self._write_data_files(
                df, sort_cols or [], stat_cols=tuple(snap.stat_cols)
            )
            kept = [e for e in snap.entries if e["bucket"] not in rewrite]
            return self._commit(
                pointer, kept + new_entries, pointer.get("attrs", {}),
                stat_cols=snap.stat_cols,
            )
        except Exception:
            self._release_failed(pointer)
            raise

    def optimize(
        self,
        spark: SparkSession,
        cluster_by: list[str],
        ranges: dict[str, tuple[float, float]] | None = None,
        resolution: float | None = None,
        target_file_rows: int = 5_000_000,
        time_lo=None,
        time_hi=None,
    ) -> Snapshot:
        """OPTIMIZE ZORDER BY (the Delta maintenance analog): rewrite
        the selected buckets with rows ordered by the Morton interleave
        of 2-4 ``cluster_by`` columns (one column degrades to a plain
        sort; 3+ use the generic k-axis interleave), and record
        per-file min/max for those columns in the manifest.  Afterwards a bbox read through :meth:`read`'s
        ``where`` ranges prunes files at the MANIFEST level and row
        groups at the parquet level — the relational analog of the
        reference's 2-D zarr chunk tiling (``dataset_manager.py:220-221``),
        applied retroactively to a table that was written time-sorted.

        ``time_lo``/``time_hi`` bound the maintenance pass (Delta's
        ``OPTIMIZE ... WHERE``): only files whose stat range overlaps
        are rewritten, everything else keeps its manifest entry — at
        100 TB the periodic job z-orders the newly-landed slice instead
        of repaying the whole archive; omit both for the full-table
        pass.  Readers are unaffected until the atomic commit; prior
        versions time-travel to the pre-optimize layout.

        ``ranges``: per-column (lo, hi) quantization bounds; any column
        without one gets the ACTUAL data extent from a 2-scalar agg
        (correct for arbitrary columns — a fixed geographic default
        would clamp non-lat/lon values into edge cells and void the
        pruning); ``resolution``: regular-grid cell size so cell
        indices, not range fractions, interleave."""
        from gridded_etl_tools_spark.operators.zorder import (
            z_index,
            z_index_n,
        )

        if not 1 <= len(cluster_by) <= 4:
            raise ValueError("cluster_by takes one to four columns")
        if not self.exists():
            raise TableCorruptionGuard(
                f"optimize on non-existent table {self.root}; "
                "publish with write_initial first"
            )
        pointer = self._acquire()
        try:
            snap = self.snapshot(pointer["version"])
            # cluster columns become table stat columns from here on:
            # every later append/merge/delete rewrite re-derives per-file
            # min/max for them, so the pruning this pass creates survives
            # sustained mutation instead of eroding until the next pass
            stat_cols = list(snap.stat_cols) + [
                c for c in cluster_by if c not in snap.stat_cols
            ]
            targets = self._prune_entries(snap.entries, time_lo, time_hi)
            if not targets:
                self._release_failed(pointer)
                return snap
            tgt = {e["path"] for e in targets}
            kept = [e for e in snap.entries if e["path"] not in tgt]
            df = self._schema_reader(spark, targets).parquet(
                *[e["path"] for e in targets]
            )
            if len(cluster_by) >= 2:
                # quantization bounds: caller-supplied, else the ACTUAL
                # data extent (one 2-scalar agg per missing column) —
                # a fixed whole-globe default would collapse
                # non-geographic values into edge cells and quietly
                # void the per-file pruning this rewrite exists for
                rng = dict(ranges or {})
                missing = [c for c in cluster_by if c not in rng]
                if missing:
                    row = df.agg(
                        *[m(c) for c in missing for m in (F.min, F.max)]
                    ).first()
                    for i, c in enumerate(missing):
                        lo_v = float(row[2 * i])
                        hi_v = float(row[2 * i + 1])
                        rng[c] = (lo_v, hi_v if hi_v > lo_v else lo_v + 1.0)
                if len(cluster_by) == 2:
                    # 2-axis keeps the magic-mask spread (shorter tree)
                    a, b = cluster_by
                    z = z_index(
                        a,
                        b,
                        lat_range=tuple(rng[a]),
                        lon_range=tuple(rng[b]),
                        resolution=resolution,
                    )
                else:
                    z = z_index_n(
                        list(cluster_by),
                        [tuple(rng[c]) for c in cluster_by],
                        resolution=resolution,
                    )
                df = df.withColumn("__z", z)
                order, drop = ["__z", self.time_col], ("__z",)
            else:
                order, drop = [cluster_by[0], self.time_col], ()
            entries = self._write_data_files(
                df,
                [],
                stat_cols=tuple(stat_cols),
                sort_exprs=order,
                drop_after_sort=drop,
                # file count sized from committed manifest row totals —
                # deterministic, no sampling job
                range_partition=max(
                    1,
                    -(-sum(e.get("rows", 0) for e in targets) // target_file_rows),
                ),
            )
            return self._commit(
                pointer, kept + entries, pointer.get("attrs", {}),
                stat_cols=stat_cols,
            )
        except Exception:
            self._release_failed(pointer)
            raise

    # -- read API ------------------------------------------------------------

    def read(
        self,
        spark: SparkSession,
        time_lo=None,
        time_hi=None,
        version: int | None = None,
        where: dict[str, tuple[Any, Any]] | None = None,
    ) -> DataFrame | None:
        """Open a snapshot (reference ``store.dataset``, store.py:182-198 —
        None when absent), latest by default or a retained prior
        ``version`` (time travel; the reference keeps version history on
        overwrite, store.py:398-422).  ``time_lo``/``time_hi`` prune
        manifest entries by file stats before Spark ever lists them (the
        reference's binary search, publish.py:897-949), then re-apply the
        predicate for row-group pruning inside the files.

        ``where``: ``{col: (lo, hi)}`` range predicates on non-time
        columns.  Files whose recorded per-file stats (written by
        :meth:`optimize`) cannot overlap the range are skipped at the
        manifest level; files without stats for a column are
        conservatively kept.  Predicates are re-applied as filters either
        way, so results are exact regardless of layout."""
        if not self.exists():
            return None
        snap = self.snapshot(version)
        entries = self._prune_entries(snap.entries, time_lo, time_hi, where)
        # schema-evolution detection from the manifest alone: parquet
        # footer merging (mergeSchema) costs a distributed footer pass at
        # scale, so only pay it when the per-file column signatures
        # actually diverge (legacy entries without a signature are
        # conservatively treated as divergent-unknown only if a recorded
        # signature also exists to differ from) — _schema_reader is the
        # shared implementation every internal rewrite also uses
        reader = self._schema_reader(spark, snap.entries)
        if not snap.entries:
            # a table emptied by delete_where: nothing to read and no
            # file to take a schema from — same None contract as absent
            # (reference store.dataset, store.py:182-198); time travel
            # to a pre-delete version still reads normally
            return None
        if not entries:
            return reader.parquet(*snap.paths()).limit(0)
        df = reader.parquet(*[e["path"] for e in entries])
        if time_lo is not None:
            df = df.filter(F.col(self.time_col) >= F.lit(time_lo))
        if time_hi is not None:
            df = df.filter(F.col(self.time_col) <= F.lit(time_hi))
        for col, (lo, hi) in (where or {}).items():
            if lo is not None:
                df = df.filter(F.col(col) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(col) <= F.lit(hi))
        return df

    def pruned_file_count(
        self,
        time_lo=None,
        time_hi=None,
        where: dict[str, tuple[Any, Any]] | None = None,
        version: int | None = None,
    ) -> tuple[int, int]:
        """(files the predicate set would scan, total files) — the
        manifest-level skipping measurement :meth:`optimize`'s A/B uses,
        computed from stats alone (no Spark job)."""
        snap = self.snapshot(version)
        entries = self._prune_entries(snap.entries, time_lo, time_hi, where)
        return len(entries), len(snap.entries)

    def distinct_times(self, spark: SparkSession) -> DataFrame | None:
        df = self.read(spark)
        return None if df is None else df.select(self.time_col).distinct()

    def diff(
        self,
        spark: SparkSession,
        v_from: int,
        v_to: int | None = None,
    ) -> DataFrame:
        """Change data feed between two retained versions: every row added
        ("insert") or removed ("delete") going from ``v_from`` to ``v_to``
        (latest by default); an in-place update surfaces as a delete +
        insert of the same key.

        Data files are immutable once committed, so files present in BOTH
        manifests cannot contribute changes and are never read — the scan
        is proportional to the churned file set, not the table.  Within
        the churned files, ``exceptAll`` (multiset EXCEPT) computes the
        exact row-level delta, which also cancels out pure rewrites
        (compaction produces an empty diff)."""
        snap_a = self.snapshot(v_from)
        snap_b = self.snapshot(v_to)
        paths_a = set(snap_a.paths())
        paths_b = set(snap_b.paths())
        removed = sorted(paths_a - paths_b)
        added = sorted(paths_b - paths_a)

        def rows(paths: list[str]) -> DataFrame:
            if paths:
                return spark.read.parquet(*paths)
            ref = (snap_a.paths() or snap_b.paths())[0]
            return spark.read.parquet(ref).limit(0)

        old_rows, new_rows = rows(removed), rows(added)
        inserts = new_rows.exceptAll(old_rows).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = old_rows.exceptAll(new_rows).withColumn(
            "_change_type", F.lit("delete")
        )
        return inserts.unionByName(deletes)

    def history(self) -> list[dict[str, Any]]:
        """All retained versions, oldest first: version, file count, rows.
        The time-travel index (reference version history,
        store.py:398-422)."""
        # a half-created table (first commit crashed between its
        # manifest write and the pointer CAS) has a manifest dir but no
        # pointer: nothing is committed, so the history is empty
        if not self.exists() or not self._fs.isdir(self._manifest_dir):
            return []
        out = [
            {
                "version": v,
                "n_files": len(m["entries"]),
                "rows": sum(e.get("rows", 0) for e in m["entries"]),
            }
            # the committed lineage IS the history — a name scan would
            # also pick up zombie writers' never-committed orphans
            for v, _name, m in self._walk_committed()
        ]
        return sorted(out, key=lambda h: h["version"])

    # -- maintenance ---------------------------------------------------------

    def restore(self, version: int) -> Snapshot:
        """Roll the table back to an earlier version AS A NEW COMMIT
        (Delta-style RESTORE): the target version's manifest entries are
        re-committed under version+1, so history is append-only, nothing
        is deleted, and a concurrent reader never observes a pointer
        moving backwards.  Data files are immutable and shared between
        manifests, so this writes no data — one manifest + one pointer
        swap.  ``vacuum(keep_versions=True)`` keeps every referenced
        file alive afterwards."""
        pointer = self._acquire()
        try:
            target = self.snapshot(version)
            return self._commit(
                pointer, target.entries, target.attrs,
                stat_cols=target.stat_cols,
            )
        except Exception:
            self._release_failed(pointer)
            raise

    def clone_to(
        self,
        dest_root: str,
        version: int | None = None,
        attrs_update: dict[str, Any] | None = None,
    ) -> "GriddedTable":
        """ZERO-COPY SHALLOW CLONE (Delta ``CREATE TABLE ... SHALLOW
        CLONE``): commit the source snapshot's manifest entries as the
        destination's version 0 — no data moves, so a dev/test copy of
        a 100 TB production table is one manifest write.  Files are
        immutable under this protocol, so the clone's own commits
        (append / merge / delete / optimize) write NEW files under the
        clone's root and progressively stop referencing the source;
        the source is never mutated through a clone.

        Caveat (same as Delta's): ``vacuum(keep_versions=False)`` /
        ``expire_versions`` on the SOURCE can delete files a shallow
        clone still references — retain the cloned version there, or
        rewrite the clone (e.g. a no-op ``optimize``) to deep-copy."""
        snap = self.snapshot(version)
        dest = GriddedTable(
            dest_root,
            time_col=self.time_col,
            bucket_fmt=self.bucket_fmt,
            bloom_cols=list(self.bloom_cols),
            bloom_ndv=self.bloom_ndv,
            stale_lock_seconds=self.stale_lock_seconds,
            fs=self._fs,
        )
        if dest.exists():
            raise TableCorruptionGuard(
                f"clone destination already exists: {dest_root}"
            )
        pointer = dest._acquire()
        try:
            dest._commit(
                pointer,
                snap.entries,
                {**snap.attrs, **(attrs_update or {})},
                stat_cols=snap.stat_cols,
            )
        except Exception:
            dest._release_failed(pointer)
            raise
        return dest

    def vacuum(self, keep_versions: bool = True) -> list[str]:
        """Delete data files not referenced by ANY retained manifest
        (debris from crashed writers).  Takes the writer flag so a
        concurrent in-flight writer's staged-but-uncommitted files are
        never swept.  Committed manifests stay (cheap; they are the
        time-travel index) unless ``keep_versions=False``, which drops
        all but the live manifest and its files.  ORPHAN manifests — a
        zombie writer's never-committed ``v{N}-{token}.json``, off the
        lineage chain — are swept in BOTH modes (with the same
        mtime-newer-than-acquire guard that protects a concurrent
        takeover writer's staging), making good on the commit-failure
        error's promise that a lost commit's debris falls to vacuum."""
        if not self.exists():
            return []
        pointer = self._acquire()
        acquired_at = time.time()
        try:
            if keep_versions:
                # ONE lineage walk yields every retained manifest dict —
                # snapshot(v) per version would re-walk the chain each
                # time (O(N^2) manifest reads on an object store)
                live: set[str] = set()
                chain_names: set[str] = set()
                for _v, name, m in self._walk_committed():
                    chain_names.add(name)
                    live |= {e["path"] for e in m["entries"]}
                for fname in self._fs.list_names(self._manifest_dir):
                    if (
                        fname.startswith("v")
                        and fname.endswith(".json")
                        and "-" in fname  # unique-named only: a legacy
                        # fixed name was always a committed manifest
                        and fname not in chain_names
                    ):
                        p = self._manifest_path(fname)
                        if self._fs.mtime(p) >= acquired_at:
                            continue  # possibly a takeover writer's
                        self._fs.remove(p)
            else:
                current = self.snapshot(pointer["version"])
                live = set(current.paths())
                keep = self._resolve_manifest(pointer["version"])
                for fname in self._fs.list_names(self._manifest_dir):
                    if (
                        fname.startswith("v")
                        and fname.endswith(".json")
                        and fname != keep
                    ):
                        # mtime guard: a TTL-takeover writer staging a
                        # manifest during this sweep must not lose it
                        p = self._manifest_path(fname)
                        if self._fs.mtime(p) >= acquired_at:
                            continue
                        self._fs.remove(p)
            removed = self._sweep_unreferenced(
                live, pointer=pointer, newer_than=acquired_at
            )
            return removed
        finally:
            self._release_failed(pointer)
            # gardening: drop the CAS bookkeeping sidecar where the
            # backend keeps one (LocalControlFS's .lock file; object
            # stores keep none).  After the release CAS, so it is not
            # immediately recreated; safe mid-traffic because the sweep
            # holds the flock and CAS callers revalidate their inode.
            self._fs.sweep_cas_sidecar(self._pointer_path)

    def expire_versions(self, keep_last: int) -> list[int]:
        """Retention maintenance (the Iceberg ``expireSnapshots`` analog,
        complementing :meth:`vacuum`): drop all but the newest
        ``keep_last`` versions' manifests, then sweep data files no
        surviving manifest references.  Time travel keeps working for
        the retained window; older versions become unreadable by design.
        Returns the expired version numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        if not self.exists():
            return []
        pointer = self._acquire()
        acquired_at = time.time()
        try:
            # ONE lineage walk supplies names + entries for every
            # retained version (resolve/snapshot per version would
            # re-walk the chain each time — O(N^2) reads)
            chain = {
                v: (name, m) for v, name, m in self._walk_committed()
            }
            versions = sorted(chain)
            expired = versions[:-keep_last]
            current = pointer["version"]
            if current in expired:
                raise TableCorruptionGuard(
                    f"refusing to expire the live version v{current}"
                )
            live: set[str] = set()
            for v in versions[-keep_last:]:
                live |= {e["path"] for e in chain[v][1]["entries"]}
            for v in expired:
                self._fs.remove(self._manifest_path(chain[v][0]))
            self._sweep_unreferenced(
                live, pointer=pointer, newer_than=acquired_at
            )
            return expired
        finally:
            self._release_failed(pointer)

    def _sweep_unreferenced(
        self,
        live: set[str],
        pointer: dict[str, Any] | None = None,
        newer_than: float | None = None,
    ) -> list[str]:
        """Delete unreferenced data files.  Two guards against the
        stale-lock-takeover race (a TTL takeover during a LONG sweep
        means another writer may be staging files this sweep's ``live``
        set cannot know about):

        * files whose mtime is at or after ``newer_than`` (the sweep's
          lock-acquire time) are never deleted — any concurrent
          staging is by definition newer than our acquire, and debris
          that fresh can wait for the next vacuum;
        * ``pointer`` re-checks the fencing token immediately before
          deleting anything, aborting if the lock changed hands."""
        if pointer is not None:
            self._check_fencing(pointer)
        removed: list[str] = []
        if not self._fs.isdir(self._data_dir):
            return []
        for staging in self._fs.list_names(self._data_dir):
            sdir = os.path.join(self._data_dir, staging)
            # ONE walk per staging tree: the survivors list doubles as
            # the post-delete emptiness check (each extra walk is a
            # recursive LIST round-trip on an object store)
            survivors = 0
            for p in self._fs.walk_files(sdir):
                if not p.endswith(".parquet") or p in live:
                    survivors += 1
                    continue
                if (
                    newer_than is not None
                    and self._fs.mtime(p) >= newer_than
                ):
                    survivors += 1
                    continue  # possibly another writer's staging
                self._fs.remove(p)
                removed.append(p)
            # prune empty staging trees — but never one created/touched
            # at/after our acquire: a takeover writer's just-created
            # staging dir (or its _temporary tree) is file-less until
            # its tasks start writing, and removing it would fail that
            # writer's job commit (same race the mtime guard closes);
            # newest_mtime_under includes directory mtimes locally, so a
            # fileless-but-fresh tree reads as fresh
            if survivors == 0:
                newest = self._fs.newest_mtime_under(sdir)
                if newer_than is None or newest is None or newest < newer_than:
                    self._fs.remove_tree(sdir)
        return removed

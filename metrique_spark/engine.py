"""Engine — the proxy/container layer: named cubes + query operators.

Replaces the reference's ``SQLAlchemyProxy`` + ``MetriqueContainer``
(``metrique/sqlalchemy.py``, ``metrique/core_api.py``). Cubes are
parquet-backed tables in a warehouse directory (partitioned by a
``_current`` flag so snapshot upserts never rewrite history — see
``upsert.py``), or plain registered DataFrames/views for read-only
analysis.

Query operators mirror the reference proxy surface
(``sqlalchemy.py:641-803``): find / count / distinct / get_last_field /
deptree / dfind, all MQL + date-range aware, all returning DataFrames that
Catalyst optimizes end-to-end (MQL compiles to a plain predicate tree, so
filter pushdown and column pruning reach the parquet scan).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metrique_spark import temporal, upsert as _upsert
from metrique_spark.fs import FileSystem, LeaseHeldError, LeaseLock, LocalFS
from metrique_spark.mql import compile_mql, date_range_predicate, parse_fields
from metrique_spark.objects import stamp, validate

# default fields always appended to explicit projections
# (reference sqlalchemy.py:264-273)
DEFAULT_FIELDS = ("_start", "_end", "_oid")


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted a mutating operation on a cube whose
    advisory write lock is held. The commit protocol is crash-safe but
    single-writer: two interleaved snapshot merges could each read the
    open partition, close different version sets, and overwrite each
    other's open rewrite — silently corrupting version chains. Fail fast
    instead."""


class Engine:
    def __init__(self, spark: SparkSession, warehouse: str | None = None,
                 auto_compact_batches: int | None = None,
                 fs: FileSystem | None = None,
                 lock_ttl: float | None = None):
        self.spark = spark
        self.warehouse = warehouse
        # control-plane storage backend (catalog listings, sidecars,
        # writer leases). Data-plane parquet I/O always goes through
        # Spark's own Hadoop FileSystem on the same paths. ``lock_ttl``
        # bounds how long a crashed remote writer's lease blocks others
        # on backends where pid liveness can't be probed (object stores);
        # None = never expire (same-host pid probing still reclaims).
        self.fs = fs or LocalFS()
        self.lock_ttl = lock_ttl
        # when set, a snapshot upsert that leaves more than this many
        # __batch directories in a cube's history partition triggers
        # compact() — bounds the small-files growth of long-running
        # ingest (thousands of token-keyed batch dirs) without giving up
        # the idempotent per-batch commit. Off by default: compaction
        # rewrites all closed rows, which the caller may want to schedule.
        self.auto_compact_batches = auto_compact_batches
        self._views: dict[str, DataFrame] = {}
        # advisory index registry: cube -> [{"name", "column_names"}]
        # (underscore-prefixed sidecar files are invisible to Spark's
        # parquet discovery, so _indexes.json can live inside the cube dir)
        self._indexes: dict[str, list[dict]] = {}
        # cubes whose write lock THIS engine currently holds (reentrancy:
        # upsert's auto-compact runs inside the upsert's lock)
        self._held_locks: set[str] = set()

    # -- catalog ------------------------------------------------------------

    def _path(self, cube: str) -> str:
        if not self.warehouse:
            raise ValueError("no warehouse directory configured")
        return self.fs.join(self.warehouse, cube)

    def register(self, cube: str, df: DataFrame) -> None:
        """Register a read-only DataFrame as a cube (temp-view analog)."""
        self._views[cube] = df
        df.createOrReplaceTempView(cube)

    def _read(self, path: str) -> DataFrame:
        df = self.spark.read.parquet(path)
        if "_current" in df.columns:
            # partition-value inference yields string; restore boolean
            df = df.withColumn("_current", F.col("_current").cast("boolean"))
        if "__batch" in df.columns:  # internal commit-batch key, not data
            df = df.drop("__batch")
        return df

    def table(self, cube: str) -> DataFrame:
        """The cube as a DataFrame (reference ``get_table``)."""
        if cube in self._views:
            return self._views[cube]
        return self._read(self._path(cube))

    def ls(self) -> list[str]:
        """List cubes (reference ``sqlalchemy.py:877-888``)."""
        names = set(self._views)
        if self.warehouse:
            names.update(
                d for d in self.fs.listdir(self.warehouse)
                if self.fs.isdir(self.fs.join(self.warehouse, d))
            )
        return sorted(names)

    def exists(self, cube: str) -> bool:
        return cube in self._views or (
            self.warehouse is not None and self.fs.isdir(self._path(cube))
        )

    def columns(self, cube: str) -> list[str]:
        return self.table(cube).columns

    def drop(self, cube: str) -> None:
        """Drop a cube (reference ``sqlalchemy.py:723-747``)."""
        self._views.pop(cube, None)
        self.spark.catalog.dropTempView(cube)
        if self.warehouse and self.fs.isdir(self._path(cube)):
            with self._write_lock(cube):
                self.fs.delete_dir(self._path(cube))

    def _index_meta_path(self, cube: str) -> str:
        return self.fs.join(self._path(cube), "_indexes.json")

    def index(self, cube: str, fields, name: str | None = None) -> None:
        """Register an advisory index (reference ``index``,
        ``sqlalchemy.py:826-847``). Spark has no secondary indexes —
        file-format stats and partitioning serve that role — but the
        declaration is durably recorded per cube so ``index_list`` can
        report it (and a planner MAY use it as a sort/partition hint)."""
        import json

        if isinstance(fields, str):
            fields = [fields]
        fields = list(fields)
        name = name or f"ix_{cube}_" + "_".join(fields)
        entry = {"name": name, "column_names": fields}
        registry = self._indexes.setdefault(cube, [])
        if entry not in registry:
            registry.append(entry)
        if self.warehouse and self.fs.isdir(self._path(cube)):
            # merge the persisted sidecar first: a fresh Engine starts with
            # an empty registry, and a blind dump would drop declarations
            # recorded by prior sessions
            p = self._index_meta_path(cube)
            if self.fs.isfile(p):
                for e in json.loads(self.fs.read_text(p)):
                    if e not in registry:
                        registry.append(e)
            self.fs.write_text(p, json.dumps(registry))

    def index_list(self) -> dict[str, list[dict]]:
        """All advisory indexes per cube (reference ``index_list``,
        ``sqlalchemy.py:849-863``: dict of table → index descriptors) —
        merges this session's registrations with any persisted
        ``_indexes.json`` in the warehouse."""
        import json

        out: dict[str, list[dict]] = {c: [] for c in self.ls()}
        for cube, entries in self._indexes.items():
            out.setdefault(cube, []).extend(entries)
        if self.warehouse:
            for cube in list(out):
                p = self.fs.join(self.warehouse, cube, "_indexes.json")
                if self.fs.isfile(p):
                    for e in json.loads(self.fs.read_text(p)):
                        if e not in out[cube]:
                            out[cube].append(e)
        return out

    # -- writes -------------------------------------------------------------

    def _write_lock(self, cube: str):
        """Advisory per-cube writer lease (the parquet-warehouse analog of
        the reference's SQLite same-host guard, ``sqlalchemy.py:869-875``):
        a ``.<cube>.lock`` object holding a JSON lease record, acquired
        with a conditional PUT and reclaimed from a dead holder with a
        single compare-and-swap (see ``fs.LeaseLock`` — rename-free, so
        the same protocol runs on an object store). A second writer fails
        fast with ``ConcurrentWriteError`` instead of interleaving
        snapshot merges; a same-host holder whose (pid, start-time) no
        longer exists is reclaimed, and on backends without pid probing a
        ``lock_ttl`` bounds how long a crashed holder blocks writers."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            if not self.warehouse or cube in self._held_locks:
                yield
                return
            lease = LeaseLock(
                self.fs, self.fs.join(self.warehouse, f".{cube}.lock"),
                ttl=self.lock_ttl)
            try:
                lease.acquire()
            except LeaseHeldError as exc:
                raise ConcurrentWriteError(
                    f"cube {cube!r} is locked by writer — concurrent "
                    "upserts would interleave snapshot merges; retry "
                    f"after the other writer finishes ({exc})") from exc
            self._held_locks.add(cube)
            try:
                yield
            finally:
                self._held_locks.discard(cube)
                lease.release()

        return _cm()

    def _write_partitioned(
        self, df: DataFrame, path: str, mode: str, dynamic: bool = True
    ) -> None:
        out = df.withColumn("_current", F.col("_end").isNull())
        # second-level __batch partition key: open rows live in one fixed
        # partition; closed (history) rows land in per-upsert-batch
        # directories keyed by a content token, which is what makes the
        # snapshot upsert's closed-row write idempotent (see upsert below)
        out = out.withColumn(
            "__batch",
            F.when(F.col("_current"), F.lit("open")).otherwise(F.lit("hist")),
        )
        (
            out.write.mode(mode)
            .partitionBy("_current", "__batch")
            .option("partitionOverwriteMode", "dynamic" if dynamic else "static")
            .parquet(path)
        )

    def _write_closed_batch(self, closed: DataFrame, path: str) -> None:
        """Append newly-closed rows into a history partition keyed by a
        deterministic content token: retrying the same merge overwrites the
        SAME directory instead of appending duplicates."""
        # Order-insensitive distributed checksum: sum of per-row xxhash64
        # aggregates map-side with constant memory per task (the earlier
        # collect_list token held every closed _id in ONE aggregation
        # buffer — gigabytes at a 100 TB-scale batch). decimal(38,0) sum
        # can't overflow under ANSI until ~1e19 rows.
        tok = closed.agg(
            F.count("*").alias("n"),
            F.sum(
                F.xxhash64("_id", F.col("_end").cast("string"))
                .cast("decimal(38,0)")
            ).alias("s"),
        ).first()
        if not tok["n"]:
            return None
        token = f"n{tok['n']}x{tok['s']}"
        (
            closed.withColumn("_current", F.lit(False))
            .withColumn("__batch", F.lit(token))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_current", "__batch")
            .parquet(path)
        )
        return token

    def _write_open(self, new_open: DataFrame, path: str) -> None:
        """Dynamically overwrite the single open partition."""
        (
            new_open.withColumn("_current", F.lit(True))
            .withColumn("__batch", F.lit("open"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_current", "__batch")
            .parquet(path)
        )

    def compact(self, cube: str, target_partitions: int | None = None) -> int:
        """Consolidate the history partition's per-upsert-batch directories.

        Every snapshot upsert appends one token-keyed ``__batch``
        directory of closed rows — correct and idempotent, but after
        thousands of batches the history side is thousands of small
        parquet directories (the classic small-files problem; at cluster
        scale, NameNode/listing pressure and tiny scan tasks). ``compact``
        rewrites ALL closed rows into one consolidated batch directory and
        removes the originals. Returns the number of directories removed.

        Crash-safe under the engine's single-writer assumption: the
        consolidated directory's name is the same order-insensitive
        content checksum the upsert commit uses, and rows are deduped by
        ``_id`` on read — so a crash between write and delete leaves
        duplicates that the NEXT compact (or any retry) collapses back;
        re-running with no new data converges to the same directory."""
        with self._write_lock(cube):
            return self._compact_locked(cube, target_partitions)

    def _compact_locked(self, cube: str, target_partitions: int | None) -> int:
        path = self._path(cube)
        hist_root = self.fs.join(path, "_current=false")
        if not self.fs.isdir(hist_root):
            return 0
        batches = sorted(
            d for d in self.fs.listdir(hist_root)
            if d.startswith("__batch=")
            and self.fs.isdir(self.fs.join(hist_root, d)))
        if len(batches) <= 1:
            return 0
        closed = (
            self._read(path).where(~F.col("_current"))
            .drop("_current")
            .dropDuplicates(["_id"])      # heals a crashed prior compact
        )
        if target_partitions:
            closed = closed.repartition(target_partitions)
        # localCheckpoint: the write below rewrites the directories this
        # plan reads from
        closed = closed.localCheckpoint(eager=True)
        token = self._write_closed_batch(closed, path)
        removed = 0
        for d in batches:
            full = self.fs.join(hist_root, d)
            # the consolidated dir may reuse one of the existing tokens
            # (re-compacting identical content); never delete the one we
            # just wrote
            if d != f"__batch={token}" and self.fs.isdir(full):
                self.fs.delete_dir(full)
                removed += 1
        return removed

    def insert(self, cube: str, df: DataFrame, stamped: bool = False, **stamp_kw) -> None:
        """Plain append (reference ``insert``, ``sqlalchemy.py:865-875``)."""
        obj = df if stamped else stamp(df, **stamp_kw)
        validate(obj)
        with self._write_lock(cube):
            self._write_partitioned(obj, self._path(cube), "append")

    def upsert(self, cube: str, df: DataFrame, autosnap: bool | None = None,
               stamped: bool = False, **stamp_kw) -> None:
        """Temporal upsert (reference ``sqlalchemy.py:906-975``); see
        ``upsert.py`` for semantics and the partition-local write strategy."""
        incoming = df if stamped else stamp(df, **stamp_kw)
        validate(incoming)
        path = self._path(cube)
        with self._write_lock(cube):
            self._upsert_locked(cube, path, incoming, autosnap)

    def _upsert_locked(self, cube, path, incoming, autosnap):
        if autosnap is None:
            autosnap = _upsert.detect_autosnap(incoming)
        if autosnap:
            # last write wins within a snapshot batch (the reference's
            # container buffer is keyed by _id, core_api.py:537-540)
            incoming = _upsert.latest_per_oid(incoming)
        if not self.fs.isdir(path):
            self._write_partitioned(incoming, path, "errorifexists")
            return
        table = self._read(path)
        cols = [c for c in table.columns if c != "_current"]
        if autosnap:
            open_rows = table.where(F.col("_current")).select(*cols)
            # one join, one materialization (must happen before rewriting
            # the partition we read from), then two cheap filters
            tagged = _upsert.snapshot_merge_tagged(
                open_rows, incoming.select(*cols)
            ).localCheckpoint(eager=True)
            # commit order is load-bearing: closed rows FIRST (idempotent
            # token-keyed partition), open-partition overwrite second. A
            # crash between the two leaves the old rows open alongside
            # their closed copies — retrying the same batch recomputes the
            # identical closed set, overwrites the same token directory,
            # and converges to the crash-free state. The old order lost
            # the closed versions (a history gap) with no recovery path.
            self._write_closed_batch(
                tagged.where(F.col("__closed")).drop("__closed"), path
            )
            self._write_open(
                tagged.where(~F.col("__closed")).drop("__closed"), path
            )
            if self.auto_compact_batches:
                hist_root = self.fs.join(path, "_current=false")
                n_batches = sum(
                    1 for d in self.fs.listdir(hist_root)
                    if d.startswith("__batch="))
                if n_batches > self.auto_compact_batches:
                    self.compact(cube)
        else:
            replaced = _upsert.history_replace(
                table.select(*cols), incoming.select(*cols)
            ).localCheckpoint(eager=True)
            # static overwrite: the history import must rewrite BOTH
            # partitions (reference deletes ALL versions of the replaced
            # oids, sqlalchemy.py:955-963) — dynamic mode would leave a
            # _current partition absent from the result untouched on disk,
            # letting stale versions survive
            self._write_partitioned(replaced, path, "overwrite", dynamic=False)

    # -- queries (reference sqlalchemy.py:641-803) ---------------------------

    def _scoped(self, cube: str | DataFrame, query: str | None, date: str | None) -> DataFrame:
        df = cube if isinstance(cube, DataFrame) else self.table(cube)
        if "_current" in df.columns:
            df = df.drop("_current")
        dpred = date_range_predicate(date) if ("_end" in df.columns) else None
        if dpred is not None:
            df = df.where(dpred)
        if query:
            df = df.where(compile_mql(query, df))
        return df

    def find(
        self,
        cube: str | DataFrame,
        query: str | None = None,
        fields=None,
        date: str | None = None,
        sort: str | None = None,
        descending: bool = False,
        limit: int | None = None,
        distinct: bool = False,
        default_fields: bool = True,
    ) -> DataFrame:
        """MQL find (reference ``sqlalchemy.py:753-785``)."""
        df = self._scoped(cube, query, date)
        cols = parse_fields(fields)
        if cols is not None:
            if default_fields:
                cols = cols + [c for c in DEFAULT_FIELDS if c not in cols and c in df.columns]
            df = df.select(*cols)
        if distinct:
            df = df.distinct()
        if sort:
            df = df.orderBy(F.col(sort).desc() if descending else F.col(sort))
        if limit and limit >= 1:
            df = df.limit(limit)
        return df

    def find_one(self, cube: str | DataFrame, query: str | None = None,
                 **kw):
        """First matching row as a dict, or None (reference ``one=True``,
        ``sqlalchemy.py:769-771``)."""
        row = self.find(cube, query, **kw).first()
        return row.asDict(recursive=True) if row is not None else None

    def find_scalar(self, cube: str | DataFrame, query: str | None = None,
                    **kw):
        """First column of the first matching row (reference
        ``scalar=True``, ``sqlalchemy.py:772-774``)."""
        row = self.find(cube, query, **kw).first()
        return row[0] if row is not None else None

    def count(self, cube: str | DataFrame, query: str | None = None,
              date: str | None = None) -> int:
        """Count matches (reference ``sqlalchemy.py:641-664``)."""
        return self._scoped(cube, query, date).count()

    def distinct(self, cube: str | DataFrame, fields, query: str | None = None,
                 date: str | None = "~") -> DataFrame:
        """Unique values of field(s); array-valued fields are flattened
        (reference ``sqlalchemy.py:706-721`` reduce-adds per-field lists
        into ONE flat sorted value set). Single field keeps its name and
        type; multiple fields union into a single string-cast ``value``
        column, matching the reference's untyped flat list."""
        from pyspark.sql import types as T

        df = self._scoped(cube, query, date)
        cols = parse_fields(fields) or df.columns
        outs = []
        for c in cols:
            dtype = df.schema[c].dataType
            col = F.explode_outer(F.col(c)) if isinstance(dtype, T.ArrayType) else F.col(c)
            outs.append(df.select(col.alias(c)).where(F.col(c).isNotNull()).distinct())
        if len(outs) == 1:
            return outs[0].orderBy(cols[0])
        uni = None
        for out in outs:
            part = out.select(F.col(out.columns[0]).cast("string").alias("value"))
            uni = part if uni is None else uni.unionByName(part)
        return uni.distinct().orderBy("value")

    def get_last_field(self, cube: str | DataFrame, field: str):
        """Max value of a field across all history (reference
        ``sqlalchemy.py:787-803``) — one aggregate, no sort."""
        df = cube if isinstance(cube, DataFrame) else self.table(cube)
        return df.agg(F.max(field).alias(field)).first()[field]

    def deptree(self, cube: str | DataFrame, field: str, oids: Sequence,
                date: str | None = None, level: int | None = None) -> list:
        df = cube if isinstance(cube, DataFrame) else self.table(cube)
        return temporal.deptree(df, field, oids, level=level, date=date)

    def dfind(self, cube: str | DataFrame, fields: Iterable[str] | None = None,
              query: str | None = None, date: str | None = "~") -> DataFrame:
        """Diff-find (reference ``sqlalchemy.py:694-704``); ``fields=None``
        diffs the whole object with added/removed-key classification."""
        return temporal.dfind(self._scoped(cube, query, date), fields)

    def sql(self, query: str) -> DataFrame:
        """Raw SQL over registered cubes (reference ``execute``,
        ``sqlalchemy.py:528-547``) — full Spark SQL surface."""
        return self.spark.sql(query)

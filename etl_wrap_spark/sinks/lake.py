"""Atomic versioned parquet table — the transactional lake target that
gives the reference's transaction bracket (begin / commit / rollback,
``Wrap/DB.pm:38-68``) a concrete lake-side equivalent in an environment
without Delta/Iceberg.

Protocol (manifest swap):

- Data lives in immutable version directories ``<root>/v{N}/``; readers
  NEVER list the root — they resolve ``<root>/_manifest.json`` and read
  exactly the version it names.
- A writer stages the complete new state into a uniquely-named
  ``_staging/<uuid>`` directory, atomically ``os.rename``s it to
  ``v{N}`` (the rename doubles as the writer lock — it fails if another
  writer claimed that version number), then commits by renaming a fresh
  ``_manifest.json.tmp`` over the manifest. POSIX rename is atomic, so
  a concurrent reader sees the old manifest or the new one — never a
  torn file and never a half-written version directory (staging dirs
  are unreachable from the manifest). On HDFS the same renames are
  atomic; on S3-like stores the swap point must become a conditional
  PUT / DynamoDB-style log commit — exactly the seam Delta's LogStore
  abstracts, and the single place to port.
- Rollback = don't swap: any failure before commit leaves the manifest
  (and therefore every reader) on the old version; the orphaned staged
  directory is garbage-collected by ``vacuum()``.
- Concurrent writers: optimistic concurrency. The transaction records
  the manifest version it read; if the manifest moved by commit time,
  ``ConflictError`` — the loser retries on fresh state (multi-writer
  last-write-wins corruption is structurally impossible: committed
  version directories are immutable and never edited in place).

At 100 TB the data copy in upsert/delete is the cost of format-less
atomicity (rewriting referenced files is what Delta's MERGE does too —
its log only avoids rewriting UNTOUCHED files; partition the table and
use ``replace_where`` on the partition column for the same effect here).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wrap_spark.sinks import merge as M

MANIFEST = "_manifest.json"
STATS = "_stats.json"  # per-file zone maps; "_"-prefixed => invisible to Spark scans


class ConflictError(RuntimeError):
    """The manifest advanced between transaction start and commit."""


class AtomicTable:
    """A versioned parquet table with atomic commit + time travel."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ----------------------------------------------------------- manifest
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def current_version(self) -> int | None:
        m = self._manifest()
        try:
            return int(m["version"])
        except (KeyError, ValueError, TypeError):
            return None

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest committed transaction version for `app_id` (the Delta
        txnAppId/txnVersion idempotence ledger) — None if never seen."""
        v = self._manifest().get("txns", {}).get(app_id)
        return int(v) if v is not None else None

    def table_props(self) -> dict:
        """Persistent indexing properties (Delta table-properties
        pattern): stats_cols / cluster_by (string layouts only) /
        cluster_files / bloom_cols / bloom_bits / bloom_hashes recorded
        by the last ``write`` that set them. Every subsequent commit —
        upsert, delete_insert, transaction — re-applies them when
        staging, so a MERGE can never silently strip the table's zone
        maps or blooms."""
        return dict(self._manifest().get("table_props", {}))

    def _swap(
        self,
        version: int,
        expected: int | None,
        txn: tuple[str, int] | None = None,
        props: dict | None = None,
    ) -> None:
        if self.current_version() != expected:
            raise ConflictError(
                f"manifest moved (expected v{expected}, found v{self.current_version()})"
            )
        txns = dict(self._manifest().get("txns", {}))
        if txn is not None:
            txns[txn[0]] = int(txn[1])
        # props carry forward unless this commit explicitly sets them
        eff_props = props if props is not None else self.table_props()
        tmp = self._manifest_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "committed_at": time.time(),
                    "txns": txns,
                    "table_props": eff_props,
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._manifest_path())  # the atomic commit point

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}")

    # ------------------------------------------------------------ readers
    def read(self, version: int | None = None) -> DataFrame:
        """Current table state (or a pinned historical `version` — the
        rollback/audit path; committed versions are immutable)."""
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        return self.spark.read.parquet(self._version_dir(v))

    def file_stats(self, version: int | None = None) -> dict | None:
        """Per-file zone maps recorded at stage time (``_stats.json``
        inside the version dir — immutable with it), or None for
        versions written without ``stats_cols``."""
        v = version if version is not None else self.current_version()
        try:
            with open(os.path.join(self._version_dir(v), STATS)) as fh:
                return json.load(fh)
        except (OSError, ValueError, TypeError):
            return None

    def pruned_files(self, col: str, lo, hi, version: int | None = None) -> list[str] | None:
        """Data files whose [min, max] zone for `col` intersects
        [lo, hi]; None when no stats exist (caller falls back to a full
        read). Files lacking a zone for `col` are kept — pruning is
        fail-open, never a correctness filter."""
        v = version if version is not None else self.current_version()
        stats = self.file_stats(v)
        if stats is None:
            return None
        vd = self._version_dir(v)
        keep = []
        for fn, zones in stats.items():
            z = zones.get(col)
            if z is None or not (z[1] < lo or z[0] > hi):
                keep.append(os.path.join(vd, fn))
        return keep

    def read_pruned(self, col: str, lo, hi, version: int | None = None) -> DataFrame:
        """``read().where(col BETWEEN lo AND hi)`` that opens ONLY the
        files whose manifest zone map can match — the Delta-checkpoint-
        stats pattern: at millions of files the win is never listing or
        footer-reading the irrelevant ones, which scan-level row-group
        skipping cannot give you. The residual filter still applies
        (zones are file-granular), so the result is exactly the full
        filter regardless of pruning quality. Write with ``cluster_by``
        to make zones tight."""
        files = self.pruned_files(col, lo, hi, version)
        pred = F.col(col).between(lo, hi)
        if files is None:
            return self.read(version).where(pred)
        if not files:
            return self.read(version).where(pred).limit(0)
        return self.spark.read.parquet(*files).where(pred)

    # ------------------------------------------------------------ writers
    def _stage(
        self,
        df: DataFrame,
        stats_cols: Sequence[str] | None = None,
        cluster_by: str | Column | None = None,
        cluster_files: int | None = None,
        bloom_cols: Sequence[str] | None = None,
        bloom_bits: int = 4096,
        bloom_hashes: int = 5,
    ) -> str:
        """Write the full new state into a uniquely-named staging dir —
        never into a version dir, so a losing writer can never clobber a
        committed version's files.

        ``stats_cols``: record per-file min/max zone maps for these
        columns into ``_stats.json`` inside the staged dir, harvested
        from the parquet FOOTERS (pyarrow metadata — no data re-scan).
        ``cluster_by``: range-repartition on that column first so zones
        are tight and disjoint — a name for the 1-D layout, or any
        Column expression (pass sinks/parquet.py:zorder_key(cols) for a
        multi-column Morton layout: every file then covers a compact
        hyper-rectangle, so zone maps prune on ANY of the interleaved
        columns). The footer walk
        is a driver loop over file METADATA — manifest-scale work, the
        same class as Delta checkpoint maintenance; parallelize over an
        executor RDD if a single version ever holds millions of files.
        """
        staged = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        if cluster_by is not None:  # truthiness on a Column raises
            out = (
                df.repartitionByRange(cluster_files, cluster_by)
                if cluster_files
                else df.repartitionByRange(cluster_by)
            )
        else:
            out = df
        out.write.mode("overwrite").parquet(staged)
        if stats_cols:
            self._write_stats(staged, list(stats_cols))
        if bloom_cols:
            self._write_blooms(staged, list(bloom_cols), bloom_bits, bloom_hashes)
        return staged

    @staticmethod
    def _write_stats(staged: str, stats_cols: list[str]) -> None:
        import pyarrow.parquet as pq

        def _plain(v):
            # json-serializable plain python (footer stats may be numpy
            # scalars / bytes); fall back to None (zone dropped -> file
            # kept by the fail-open reader)
            if isinstance(v, bytes):
                try:
                    return v.decode("utf-8")
                except UnicodeDecodeError:
                    return None
            if hasattr(v, "item"):
                v = v.item()
            return v if isinstance(v, (int, float, str, bool)) else None

        stats: dict[str, dict] = {}
        for fn in sorted(os.listdir(staged)):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(staged, fn)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            zones = {}
            for col in stats_cols:
                ci = names.get(col)
                if ci is None:
                    continue
                lo = hi = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mn, mx = _plain(st.min), _plain(st.max)
                    if mn is None or mx is None:
                        ok = False
                        break
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                if ok and lo is not None:
                    zones[col] = [lo, hi]
            stats[fn] = zones
        tmp = os.path.join(staged, STATS)
        with open(tmp, "w") as fh:
            json.dump(stats, fh)

    def _write_blooms(
        self, staged: str, bloom_cols: list[str], m_bits: int, k_hashes: int
    ) -> None:
        """Per-file bloom filters for the given columns, recorded under
        the reserved ``__bloom__`` key of each file's ``_stats.json``
        entry — the point-lookup complement of the min/max zone maps
        (zones prune RANGES on clustered layouts; blooms prune EQUALITY
        probes on high-cardinality columns regardless of layout, the
        Delta/Iceberg bloom-index pattern). Bit positions are the
        engine-portable md5 double-hash of operators/sketches.py, so a
        driver-side Python probe reproduces them exactly.

        Computed DISTRIBUTED in one column-pruned pass over the staged
        files (input_file_name → explode k positions → per-(file, word)
        bit_or); only the finished words — files × m/63 bigints,
        manifest-scale — ever reach the driver. NULLs set no bits
        (point lookup is `=`, never `IS NULL`)."""
        from etl_wrap_spark.operators.sketches import _bloom_positions

        files = [f for f in sorted(os.listdir(staged)) if f.endswith(".parquet")]
        n_words = (m_bits + 62) // 63
        blooms: dict[str, dict] = {
            fn: {c: [0] * n_words for c in bloom_cols} for fn in files
        }
        src = self.spark.read.parquet(staged).select(
            F.input_file_name().alias("__f"), *[F.col(c) for c in bloom_cols]
        )
        for col in bloom_cols:
            pos = F.explode(
                F.array(*_bloom_positions(F.col(col), k_hashes, m_bits))
            ).alias("p")
            words = (
                src.where(F.col(col).isNotNull())
                .select("__f", pos)
                .select(
                    "__f",
                    (F.col("p") / 63).cast("int").alias("w"),
                    F.call_function(
                        "shiftleft", F.lit(1).cast("bigint"), (F.col("p") % 63).cast("int")
                    ).alias("b"),
                )
                .groupBy("__f", "w")
                .agg(F.bit_or("b").alias("word"))
            )
            for r in words.collect():
                fn = os.path.basename(r["__f"])
                if fn in blooms:
                    blooms[fn][col][r["w"]] = r["word"]
        path = os.path.join(staged, STATS)
        try:
            with open(path) as fh:
                stats = json.load(fh)
        except (OSError, ValueError):
            stats = {}
        for fn in files:
            entry = stats.setdefault(fn, {})
            entry["__bloom__"] = {
                c: {"m": m_bits, "k": k_hashes, "w": blooms[fn][c]}
                for c in bloom_cols
            }
        with open(path, "w") as fh:
            json.dump(stats, fh)

    @staticmethod
    def _py_bloom_hit(value, bloom: dict) -> bool:
        """Driver-side replay of operators/sketches._bloom_positions
        (md5 halves, Kirsch-Mitzenmacher h1 + i·h2): True iff every one
        of the value's k bits is set in the recorded words."""
        import hashlib

        hx = hashlib.md5(str(value).encode("utf-8")).hexdigest()
        h1, h2 = int(hx[0:7], 16), int(hx[7:14], 16)
        for i in range(int(bloom["k"])):
            p = (h1 + i * h2) % int(bloom["m"])
            if not (int(bloom["w"][p // 63]) >> (p % 63)) & 1:
                return False
        return True

    def pruned_files_eq(self, col: str, value, version: int | None = None) -> list[str] | None:
        """Data files that may contain ``col = value`` — bloom membership
        AND (when a zone exists) min/max containment; None when no stats
        were recorded (caller falls back to a full read). Fail-open like
        ``pruned_files``: a file lacking a bloom or zone for `col` is
        kept. ``value`` must be an int or string (the bloom hashed the
        column's string cast)."""
        v = version if version is not None else self.current_version()
        stats = self.file_stats(v)
        if stats is None:
            return None
        vd = self._version_dir(v)
        keep = []
        for fn, zones in stats.items():
            z = zones.get(col)
            if z is not None and (value < z[0] or value > z[1]):
                continue
            bloom = zones.get("__bloom__", {}).get(col)
            if bloom is not None and not self._py_bloom_hit(value, bloom):
                continue
            keep.append(os.path.join(vd, fn))
        return keep

    def read_point(self, col: str, value, version: int | None = None) -> DataFrame:
        """``read().where(col = value)`` that opens ONLY the files whose
        bloom (and zone, if any) can match — the needle-in-100-TB path:
        a point probe on a high-cardinality key touches k bits per file
        in the MANIFEST instead of listing/scanning the table. The
        residual equality filter still applies (blooms false-positive),
        so the result is exact regardless of pruning quality."""
        files = self.pruned_files_eq(col, value, version)
        pred = F.col(col) == F.lit(value)
        if files is None:
            return self.read(version).where(pred)
        if not files:
            return self.read(version).where(pred).limit(0)
        return self.spark.read.parquet(*files).where(pred)

    def _promote(
        self,
        staged: str,
        new_v: int,
        expected: int | None,
        txn: tuple[str, int] | None = None,
        props: dict | None = None,
    ) -> None:
        """Atomically install a staged dir as version ``new_v``. The dir
        rename is the writer lock: two writers racing for the same
        version number can't both rename onto ``v{N}`` — the loser gets
        ConflictError and its staged dir is removed, leaving the
        winner's committed files untouched."""
        if self.current_version() != expected:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConflictError(
                f"manifest moved (expected v{expected}, found v{self.current_version()})"
            )
        target = self._version_dir(new_v)
        try:
            os.rename(staged, target)
        except OSError as e:
            shutil.rmtree(staged, ignore_errors=True)
            raise ConflictError(f"version dir v{new_v} already claimed") from e
        self._swap(new_v, expected, txn, props)

    def _commit_df(
        self,
        df: DataFrame,
        expected: int | None,
        stats_cols: Sequence[str] | None = None,
        cluster_by: str | Column | None = None,
        cluster_files: int | None = None,
        txn: tuple[str, int] | None = None,
        bloom_cols: Sequence[str] | None = None,
        bloom_bits: int = 4096,
        bloom_hashes: int = 5,
        props: dict | None = None,
    ) -> int:
        if txn is not None:
            last = self.last_txn_version(txn[0])
            if last is not None and last >= int(txn[1]):
                # idempotent replay: this transaction already committed —
                # skip without staging (the exactly-once contract)
                return self.current_version() or 0
        new_v = (expected or 0) + 1
        staged = self._stage(
            df, stats_cols, cluster_by, cluster_files, bloom_cols,
            bloom_bits, bloom_hashes,
        )
        self._promote(staged, new_v, expected, txn, props)
        return new_v

    def _stored_staging(self) -> dict:
        """Staging kwargs from the persisted table properties — what
        upsert/delete_insert/transaction re-apply so incremental
        commits keep the table's index (zone maps, clustering, blooms)
        instead of silently stripping it."""
        p = self.table_props()
        return dict(
            stats_cols=p.get("stats_cols"),
            cluster_by=p.get("cluster_by"),
            cluster_files=p.get("cluster_files"),
            bloom_cols=p.get("bloom_cols"),
            bloom_bits=p.get("bloom_bits", 4096),
            bloom_hashes=p.get("bloom_hashes", 5),
        )

    def write(
        self,
        df: DataFrame,
        stats_cols: Sequence[str] | None = None,
        cluster_by: str | Column | None = None,
        cluster_files: int | None = None,
        txn: tuple[str, int] | None = None,
        bloom_cols: Sequence[str] | None = None,
        bloom_bits: int = 4096,
        bloom_hashes: int = 5,
    ) -> int:
        """Full refresh (reference K5) as one atomic version bump; see
        ``_stage`` for the zone-map / clustering options
        (``cluster_files`` pins the range-partition count — zone
        granularity — where AQE would otherwise coalesce small tables
        into one file) and the per-file ``bloom_cols`` point-lookup
        index (read back via ``read_point``). ``txn`` as in ``upsert``.

        Indexing options PERSIST as table properties (Delta pattern):
        pass None to inherit the table's recorded configuration, an
        explicit value to change it, or an empty sequence (e.g.
        ``bloom_cols=()``) to clear that index. Column-expression
        ``cluster_by`` layouts apply to THIS commit only (a Column
        can't be serialized into the manifest — pass the string form,
        or re-supply the expression per write)."""
        stored = self.table_props()
        eff_stats = list(stats_cols) if stats_cols is not None else stored.get("stats_cols")
        eff_cluster = cluster_by if cluster_by is not None else stored.get("cluster_by")
        eff_cf = cluster_files if cluster_files is not None else stored.get("cluster_files")
        if bloom_cols is not None:
            eff_bloom, eff_bits, eff_hashes = list(bloom_cols), bloom_bits, bloom_hashes
        else:
            eff_bloom = stored.get("bloom_cols")
            eff_bits = stored.get("bloom_bits", bloom_bits)
            eff_hashes = stored.get("bloom_hashes", bloom_hashes)
        props = {}
        if eff_stats:
            props["stats_cols"] = list(eff_stats)
        if isinstance(eff_cluster, str):
            props["cluster_by"] = eff_cluster
        elif eff_cluster is not None and isinstance(stored.get("cluster_by"), str):
            # Column-expression layout applies to THIS commit only; the
            # persisted string property must survive so a later
            # compact() keeps the clustered layout (round-5 ADVICE —
            # previously the property was silently cleared here).
            props["cluster_by"] = stored["cluster_by"]
        if eff_cf:
            props["cluster_files"] = int(eff_cf)
        if eff_bloom:
            props["bloom_cols"] = list(eff_bloom)
            props["bloom_bits"] = int(eff_bits)
            props["bloom_hashes"] = int(eff_hashes)
        return self._commit_df(
            df, self.current_version(), eff_stats, eff_cluster, eff_cf,
            txn=txn, bloom_cols=eff_bloom, bloom_bits=eff_bits,
            bloom_hashes=eff_hashes, props=props,
        )

    def upsert(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """MERGE semantics (reference K2/K3) with old-or-new visibility.
        ``txn=(app_id, txn_version)`` makes the commit IDEMPOTENT: a
        replay whose txn_version the manifest has already recorded is
        skipped — the Delta txnAppId pattern that turns foreachBatch
        retries into exactly-once sink semantics."""
        v = self.current_version()
        if txn is not None:
            last = self.last_txn_version(txn[0])
            if last is not None and last >= int(txn[1]):
                return v or 0
        out = M.upsert(self.read(v), updates, keys) if v else updates
        return self._commit_df(out, v, txn=txn, **self._stored_staging())

    def delete_insert(self, replacement: DataFrame, selector: Column) -> int:
        """Delete-before-insert (reference K4) as one atomic commit."""
        v = self.current_version()
        out = (
            M.delete_before_insert(self.read(v), replacement, selector)
            if v
            else replacement
        )
        return self._commit_df(out, v, **self._stored_staging())

    def replace_where(self, replacement: DataFrame, predicate: str) -> int:
        """Delta-style replaceWhere: rows matching `predicate` are
        replaced by `replacement`, everything else carried over."""
        return self.delete_insert(replacement, F.expr(predicate))

    def transaction(self) -> "LakeTransaction":
        """Multi-operation bracket: all ops land in ONE staged version,
        committed by a single swap (the reference's begin_work/commit)."""
        return LakeTransaction(self)

    # -------------------------------------------------------- maintenance
    def compact(self, target_files: int) -> int:
        """Small-file compaction as ONE atomic version: rewrite the
        current state into ~``target_files`` files. Table properties
        re-apply, so zone maps and blooms are REBUILT on the compacted
        layout (tighter zones, fewer manifest entries) rather than
        lost — the Delta OPTIMIZE posture. With a persisted string
        ``cluster_by`` the rewrite range-partitions on it (zones stay
        disjoint); otherwise a plain repartition sets the file count."""
        cur = self.read()
        if self.table_props().get("cluster_by"):
            return self.write(cur, cluster_files=int(target_files))
        return self.write(cur.repartition(int(target_files)))

    def rollback(self, to_version: int) -> None:
        """Point the manifest back at an earlier immutable version."""
        if not os.path.isdir(self._version_dir(to_version)):
            raise FileNotFoundError(f"no version dir v{to_version}")
        self._swap(to_version, self.current_version())

    def vacuum(self, keep: int = 2) -> list[int]:
        """Remove version dirs older than the newest `keep` (never the
        current one) plus any orphaned staging dirs; returns removed
        version ids."""
        cur = self.current_version()
        versions = sorted(
            int(d[1:])
            for d in os.listdir(self.root)
            if d.startswith("v") and d[1:].isdigit()
        )
        removable = [v for v in versions if v != cur][: max(0, len(versions) - keep)]
        for v in removable:
            shutil.rmtree(self._version_dir(v), ignore_errors=True)
        shutil.rmtree(os.path.join(self.root, "_staging"), ignore_errors=True)
        return removable


class LakeTransaction:
    """Accumulates merge-algebra steps against a snapshot, stages the
    final state once, commits with one swap. Any exception inside the
    ``with`` block = rollback (manifest untouched, staged dir removed).
    """

    def __init__(self, table: AtomicTable):
        self.table = table
        self.base_version: int | None = None
        self.state: DataFrame | None = None

    def __enter__(self) -> "LakeTransaction":
        self.base_version = self.table.current_version()
        self.state = self.table.read(self.base_version) if self.base_version else None
        return self

    def write(self, df: DataFrame) -> None:
        self.state = df

    def upsert(self, updates: DataFrame, keys: Sequence[str]) -> None:
        self.state = M.upsert(self.state, updates, keys) if self.state is not None else updates

    def delete_insert(self, replacement: DataFrame, selector: Column) -> None:
        self.state = (
            M.delete_before_insert(self.state, replacement, selector)
            if self.state is not None
            else replacement
        )

    def delete_keys(self, delete_df: DataFrame, keys: Sequence[str]) -> None:
        self.state = M.delete_keys(self.state, delete_df, keys)

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is not None:
            return False  # rollback: nothing staged/committed yet
        if self.state is None:
            return False
        new_v = (self.base_version or 0) + 1
        staged = self.table._stage(self.state, **self.table._stored_staging())
        try:
            self.table._promote(staged, new_v, self.base_version)
        except BaseException:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        return False


class PartitionedAtomicTable:
    """Partition-granular atomic table — the piece that makes MERGE
    economics work at 100 TB, where AtomicTable's full-state staging
    (correct, but a whole-table copy per commit) is the wrong cost
    model: here the manifest maps each PARTITION VALUE to an immutable
    data directory, a commit rewrites ONLY the partitions its delta
    touches, and every untouched partition is carried into the new
    version BY REFERENCE (same directory name in the new manifest —
    zero data movement, the Delta/Iceberg file-reuse behavior).

    Layout: ``<root>/p_<uuid>/`` immutable partition dirs;
    ``<root>/_versions/<N>.json`` immutable per-version manifests
    ({partition value -> dir, plus the partition column name/type});
    ``<root>/_manifest.json`` the current-version pointer, swapped with
    the same atomic-rename + optimistic-concurrency protocol as
    AtomicTable (ConflictError when a racer advanced the pointer).

    Readers resolve the pointer, then the manifest, then read exactly
    the referenced dirs — old-or-new visibility, never partial. The
    partition column is re-attached from the manifest (dirs store only
    payload columns). vacuum() drops partition dirs unreferenced by any
    retained manifest (ref-counted, never the current one).
    """

    def __init__(self, spark: SparkSession, root: str, partition_col: str):
        self.spark = spark
        self.root = root
        self.pcol = partition_col
        os.makedirs(os.path.join(root, "_versions"), exist_ok=True)

    # ----------------------------------------------------------- pointers
    def _pointer_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _pointer(self) -> dict:
        try:
            with open(self._pointer_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def current_version(self) -> int | None:
        try:
            return int(self._pointer()["version"])
        except (KeyError, ValueError, TypeError):
            return None

    def last_txn_version(self, app_id: str) -> int | None:
        """Transaction ledger, as in AtomicTable.last_txn_version."""
        v = self._pointer().get("txns", {}).get(app_id)
        return int(v) if v is not None else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self.root, "_versions", f"{version}.json")) as fh:
            return json.load(fh)

    def _swap(
        self, version: int, expected: int | None, txn: tuple[str, int] | None = None
    ) -> None:
        if self.current_version() != expected:
            raise ConflictError(
                f"pointer moved (expected v{expected}, found v{self.current_version()})"
            )
        txns = dict(self._pointer().get("txns", {}))
        if txn is not None:
            txns[txn[0]] = int(txn[1])
        tmp = self._pointer_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "committed_at": time.time(), "txns": txns}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._pointer_path())

    def table_props(self) -> dict:
        """Persistent indexing properties (as AtomicTable.table_props,
        stored in the version manifest): currently ``stats_cols`` —
        per-file zone maps INSIDE each partition dir, the second level
        of the partition-prune → file-prune → row-group-prune chain."""
        v = self.current_version()
        if v is None:
            return {}
        return dict(self._manifest(v).get("table_props", {}))

    def _commit_manifest(
        self,
        parts: dict,
        ptype: str,
        expected: int | None,
        txn: tuple[str, int] | None = None,
        props: dict | None = None,
    ) -> int:
        eff_props = props if props is not None else self.table_props()
        new_v = (expected or 0) + 1
        mpath = os.path.join(self.root, "_versions", f"{new_v}.json")
        tmp = mpath + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "pcol": self.pcol,
                    "ptype": ptype,
                    "partitions": parts,
                    "table_props": eff_props,
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # exclusive-create semantics: losing a version-number race
            # must not clobber the winner's manifest
            os.link(tmp, mpath)
        except OSError as e:
            os.unlink(tmp)
            raise ConflictError(f"manifest v{new_v} already claimed") from e
        os.unlink(tmp)
        self._swap(new_v, expected, txn)
        return new_v

    # ------------------------------------------------------------ writers
    def _write_partitions(self, df: DataFrame) -> tuple[dict, str]:
        """Stage df's partitions as fresh immutable dirs; returns
        ({value -> dirname}, partition dtype). One partitioned write
        job; dirs move into place with renames (no data copy)."""
        ptype = dict(df.dtypes)[self.pcol]
        staged = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        df.write.mode("overwrite").partitionBy(self.pcol).parquet(staged)
        parts: dict[str, str] = {}
        for d in os.listdir(staged):
            if not d.startswith(f"{self.pcol}="):
                continue
            val = d.split("=", 1)[1]
            new_name = f"p_{uuid.uuid4().hex}"
            os.rename(os.path.join(staged, d), os.path.join(self.root, new_name))
            parts[val] = new_name
        shutil.rmtree(staged, ignore_errors=True)
        return parts, ptype

    def _write_dir_stats(self, parts: dict, stats_cols) -> None:
        """Per-file zone maps for each freshly-written partition dir —
        the AtomicTable footer walk, immutable with the dir."""
        if not stats_cols:
            return
        for dirname in parts.values():
            AtomicTable._write_stats(os.path.join(self.root, dirname), list(stats_cols))

    def write(
        self,
        df: DataFrame,
        txn: tuple[str, int] | None = None,
        stats_cols: Sequence[str] | None = None,
    ) -> int:
        """Full refresh: every partition rewritten, one atomic pointer
        swap. ``txn`` as in ``upsert``. ``stats_cols`` records per-file
        zone maps INSIDE every partition dir and persists as a table
        property (None inherits, empty sequence clears) — partition
        pruning narrows to dirs, these narrow to files within them
        (pre-shape the frame, e.g. repartitionByRange on (partition,
        col), for tight per-file zones)."""
        expected = self.current_version()
        if txn is not None:
            last = self.last_txn_version(txn[0])
            if last is not None and last >= int(txn[1]):
                return expected or 0
        eff_stats = list(stats_cols) if stats_cols is not None else self.table_props().get("stats_cols")
        props = {"stats_cols": list(eff_stats)} if eff_stats else {}
        parts, ptype = self._write_partitions(df)
        self._write_dir_stats(parts, eff_stats)
        return self._commit_manifest(parts, ptype, expected, txn, props=props)

    def _read_dirs(self, manifest: dict, values: Sequence[str] | None = None) -> DataFrame:
        parts = manifest["partitions"]
        vals = list(parts) if values is None else [v for v in values if v in parts]
        if not vals:
            # empty selection with the right schema: zero-row frame from
            # any referenced dir, or a truly empty table is an error
            if not parts:
                raise FileNotFoundError(f"empty table at {self.root}")
            any_dir = next(iter(parts.values()))
            base = self.spark.read.parquet(os.path.join(self.root, any_dir)).limit(0)
            vals, dirs = [], []
        else:
            dirs = [os.path.join(self.root, parts[v]) for v in vals]
            base = self.spark.read.parquet(*dirs)
        # re-attach the partition column from the manifest mapping: each
        # dir holds ONE value, so derive it from the dir NAME in the
        # file path (input_file_name carries a file:// scheme prefix, so
        # match the unique p_<hex> segment rather than the full path)
        if vals:
            mapping = F.create_map(
                *[x for v in vals for x in (F.lit(parts[v]), F.lit(v))]
            )
            dirname = F.regexp_extract(F.input_file_name(), r"/(p_[0-9a-f]{32})/", 1)
            out = base.withColumn(self.pcol, mapping[dirname].cast(manifest["ptype"]))
        else:
            out = base.withColumn(self.pcol, F.lit(None).cast(manifest["ptype"]))
        return out

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed version at {self.root}")
        return self._read_dirs(self._manifest(v))

    def partition_dirs(self, version: int | None = None) -> dict:
        """{partition value -> dir name} — the identity-reuse audit
        surface (untouched partitions keep their dir across versions)."""
        v = version if version is not None else self.current_version()
        return dict(self._manifest(v)["partitions"])

    def read_pruned(
        self,
        col: str,
        lo,
        hi,
        values: Sequence[str] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """The full pruning chain in one read: partition pruning
        (``values``) narrows to dirs, per-file zone maps narrow to
        files WITHIN each dir, the residual ``col BETWEEN lo AND hi``
        keeps the result exact regardless of pruning quality. Fail-open
        at every level: a dir without ``_stats.json`` (written before
        stats_cols was set, or carried from such a version) contributes
        all its files."""
        v = version if version is not None else self.current_version()
        manifest = self._manifest(v)
        parts = manifest["partitions"]
        vals = list(parts) if values is None else [x for x in values if x in parts]
        pred = F.col(col).between(lo, hi)
        keep: list[str] = []
        for val in vals:
            dpath = os.path.join(self.root, parts[val])
            try:
                with open(os.path.join(dpath, STATS)) as fh:
                    stats = json.load(fh)
            except (OSError, ValueError):
                stats = None
            for fn in sorted(os.listdir(dpath)):
                if not fn.endswith(".parquet"):
                    continue
                if stats is not None:
                    z = stats.get(fn, {}).get(col)
                    if z is not None and (z[1] < lo or z[0] > hi):
                        continue
                keep.append(os.path.join(dpath, fn))
        if not keep:
            return self._read_dirs(manifest, []).where(pred)
        base = self.spark.read.parquet(*keep)
        mapping = F.create_map(
            *[x for val in vals for x in (F.lit(parts[val]), F.lit(val))]
        )
        dirname = F.regexp_extract(F.input_file_name(), r"/(p_[0-9a-f]{32})/", 1)
        return base.withColumn(
            self.pcol, mapping[dirname].cast(manifest["ptype"])
        ).where(pred)

    def upsert(
        self,
        updates: DataFrame,
        keys: Sequence[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """MERGE that rewrites ONLY the partitions present in
        ``updates``; every other partition rides into the new manifest
        by reference. The touched-value collect is partition-count
        scale (driver-safe); the merge job reads just the touched dirs.
        ``txn=(app_id, txn_version)`` makes the commit idempotent via
        the pointer's transaction ledger (see AtomicTable.upsert)."""
        expected = self.current_version()
        if txn is not None:
            last = self.last_txn_version(txn[0])
            if last is not None and last >= int(txn[1]):
                return expected or 0
        if expected is None:
            return self.write(updates, txn=txn)
        manifest = self._manifest(expected)
        touched = [
            str(r[0])
            for r in updates.select(F.col(self.pcol).cast("string")).distinct().collect()
        ]
        old_touched = self._read_dirs(manifest, touched)
        merged = M.upsert(old_touched, updates, keys)
        # schema-stability contract (the Delta posture): the merge can
        # silently widen types (e.g. DECIMAL(18,2)+5 -> 19,2), which
        # would leave THIS commit's dirs schema-divergent from the
        # carried-by-reference ones and break multi-dir reads — cast
        # back to the standing table schema
        merged = merged.select(
            *[F.col(f.name).cast(f.dataType) for f in old_touched.schema.fields]
        )
        new_parts, ptype = self._write_partitions(merged)
        # re-apply the persisted zone-map property to the REWRITTEN dirs
        # only — carried-by-reference dirs keep their immutable stats
        self._write_dir_stats(new_parts, self.table_props().get("stats_cols"))
        parts = dict(manifest["partitions"])
        parts.update(new_parts)
        return self._commit_manifest(parts, ptype, expected, txn)

    def delete_partitions(self, values: Sequence[str]) -> int:
        """Drop whole partitions — a manifest-only commit, no data job."""
        expected = self.current_version()
        manifest = self._manifest(expected)
        parts = {v: d for v, d in manifest["partitions"].items() if v not in set(values)}
        return self._commit_manifest(parts, manifest["ptype"], expected)

    def vacuum(self, keep: int = 2) -> list[str]:
        """Remove partition dirs referenced by NO retained manifest
        (retains the newest ``keep`` manifests, always including the
        current one) plus orphaned staging dirs; returns removed dirs."""
        cur = self.current_version() or 0
        vdir = os.path.join(self.root, "_versions")
        versions = sorted(int(f[:-5]) for f in os.listdir(vdir) if f.endswith(".json"))
        retained = set(versions[-keep:]) | {cur}
        for v in versions:
            if v not in retained:
                os.unlink(os.path.join(vdir, f"{v}.json"))
        live = set()
        for v in retained:
            if v in versions:
                live.update(self._manifest(v)["partitions"].values())
        removed = []
        for d in os.listdir(self.root):
            if d.startswith("p_") and d not in live:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
                removed.append(d)
        shutil.rmtree(os.path.join(self.root, "_staging"), ignore_errors=True)
        return removed


def compact_partition(
    table: PartitionedAtomicTable, value: str, n_files: int = 1
) -> int:
    """Layout maintenance for one partition of a PartitionedAtomicTable:
    rewrite that partition's (possibly many small) files into
    ``n_files``, commit as a new version — every OTHER partition rides
    along by reference, so compaction cost is one partition's data, and
    readers see old-or-new atomically (the streaming-ingest small-file
    problem, solved per partition)."""
    expected = table.current_version()
    manifest = table._manifest(expected)
    if value not in manifest["partitions"]:
        raise KeyError(f"no partition {value!r}")
    part_df = table._read_dirs(manifest, [value]).coalesce(n_files)
    new_parts, ptype = table._write_partitions(part_df)
    parts = dict(manifest["partitions"])
    parts.update(new_parts)
    return table._commit_manifest(parts, manifest["ptype"], expected)


def table_changes(
    table, v_from: int, v_to: int, keys: Sequence[str]
) -> DataFrame:
    """Change Data Feed between two committed versions of an
    AtomicTable or PartitionedAtomicTable — Delta's ``table_changes``
    on the manifest-swap protocol: because versions are IMMUTABLE, the
    feed is derivable exactly, after the fact, for any retained version
    pair (no change capture at write time needed).  Emits every row
    with ``change_type`` in insert/update/delete (updates carry the NEW
    image; deletes the old — sinks/merge.py:snapshot_diff semantics).
    One keyed full-outer join between the two snapshots; downstream
    consumers feed it straight into incremental_agg.merge_delta /
    incremental_join.merge_join_delta (update = delete+insert pair
    after the standard CDC re-encoding)."""
    return M.snapshot_diff(table.read(v_from), table.read(v_to), keys)

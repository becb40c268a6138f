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

    def current_version(self) -> int | None:
        try:
            with open(self._manifest_path()) as fh:
                return int(json.load(fh)["version"])
        except (OSError, ValueError, KeyError):
            return None

    def _swap(self, version: int, expected: int | None) -> None:
        if self.current_version() != expected:
            raise ConflictError(
                f"manifest moved (expected v{expected}, found v{self.current_version()})"
            )
        tmp = self._manifest_path() + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "committed_at": time.time()}, fh)
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

    # ------------------------------------------------------------ writers
    def _stage(self, df: DataFrame) -> str:
        """Write the full new state into a uniquely-named staging dir —
        never into a version dir, so a losing writer can never clobber a
        committed version's files."""
        staged = os.path.join(self.root, "_staging", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(staged)
        return staged

    def _promote(self, staged: str, new_v: int, expected: int | None) -> None:
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
        self._swap(new_v, expected)

    def _commit_df(self, df: DataFrame, expected: int | None) -> int:
        new_v = (expected or 0) + 1
        self._promote(self._stage(df), new_v, expected)
        return new_v

    def write(self, df: DataFrame) -> int:
        """Full refresh (reference K5) as one atomic version bump."""
        return self._commit_df(df, self.current_version())

    def upsert(self, updates: DataFrame, keys: Sequence[str]) -> int:
        """MERGE semantics (reference K2/K3) with old-or-new visibility."""
        v = self.current_version()
        out = M.upsert(self.read(v), updates, keys) if v else updates
        return self._commit_df(out, v)

    def delete_insert(self, replacement: DataFrame, selector: Column) -> int:
        """Delete-before-insert (reference K4) as one atomic commit."""
        v = self.current_version()
        out = (
            M.delete_before_insert(self.read(v), replacement, selector)
            if v
            else replacement
        )
        return self._commit_df(out, v)

    def replace_where(self, replacement: DataFrame, predicate: str) -> int:
        """Delta-style replaceWhere: rows matching `predicate` are
        replaced by `replacement`, everything else carried over."""
        return self.delete_insert(replacement, F.expr(predicate))

    def transaction(self) -> "LakeTransaction":
        """Multi-operation bracket: all ops land in ONE staged version,
        committed by a single swap (the reference's begin_work/commit)."""
        return LakeTransaction(self)

    # -------------------------------------------------------- maintenance
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
        staged = self.table._stage(self.state)
        try:
            self.table._promote(staged, new_v, self.base_version)
        except BaseException:
            shutil.rmtree(staged, ignore_errors=True)
            raise
        return False

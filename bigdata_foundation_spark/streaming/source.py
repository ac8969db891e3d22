"""Snapshot tables as a STRUCTURED STREAMING SOURCE (r14).

The r13 snapshot layer made the versioned table the engine's sink
surface (append / merge / CDC-apply); this module closes the loop —
the table is also a streaming SOURCE, the Delta-style "table tail":
a query reads every row committed so far and then keeps emitting the
rows each new append commit lands, exactly once across restarts
(the manifest version IS the offset, checkpointed by Spark).

Built on Spark 4's Python DataSource API (SPARK-44076) — the
idiomatic way to hand Spark a custom streaming source without JVM
code. Offsets are manifest versions; batch planning is pure METADATA
(the driver diffs two manifests' file lists — no listing, no data
read, v2 group refs resolved driver-side); each new file becomes one
``InputPartition`` whose executor-side read yields Arrow record
batches (``pyarrow.parquet`` → zero row-at-a-time Python).

Semantics:

- the stream emits APPENDED ROWS. A merge/delete/overwrite commit
  inside a batch range makes "new files" stop meaning "appended rows"
  (same contract as ``io.read_version_delta``): the stream FAILS by
  default, naming the version; ``ignoreChanges=true`` instead skips
  rewrite commits' files (their rewritten rows are NOT re-emitted —
  Delta's ignoreChanges, minus the double-emit);
- additive schema evolution along the lineage is fine: files are
  projected to the STREAM's schema (fixed at start, from the
  ``startingVersion``'s manifest — later-added columns are absent
  from it; pass a fresh stream to pick up the widened schema), with
  missing columns null-filled by name;
- options: ``path`` (table dir, required), ``startingVersion``
  (default 1 — emit the whole table from its first commit; pass a
  later version to tail only new commits). A catch-up batch spans
  every version since the checkpoint — one micro-batch per trigger,
  partitioned one task per new file (rate limiting, if needed, is
  the trigger interval's job).

Register per-session with :func:`register_snapshot_source`, then::

    spark.readStream.format("snapshot_table").option("path", tdir).load()
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SNAPSHOT_SOURCE_NAME = "snapshot_table"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _manifest(table_dir: str, version: int) -> dict:
    from bigdata_foundation_spark import io as bio

    return bio._read_manifest(table_dir, version)


def _files_of(table_dir: str, man: dict) -> list:
    from bigdata_foundation_spark import io as bio

    return bio._manifest_file_sets(table_dir, man)[0]


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._table_dir = options["path"]
        self._start_version = int(options.get("startingversion", 1))
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )

    # -- offsets: the committed manifest version is the offset --------
    def initialOffset(self) -> dict:
        return {"version": self._start_version - 1}

    def latestOffset(self) -> dict:
        from bigdata_foundation_spark import io as bio

        versions = bio.snapshot_versions(self._table_dir)
        head = versions[-1] if versions else self._start_version - 1
        return {"version": head}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        from bigdata_foundation_spark import io as bio

        versions = bio.snapshot_versions(self._table_dir)
        if lo > 0 and lo not in versions:
            # the checkpointed base version's manifest is gone
            # (vacuumed) — the file diff would silently re-emit the
            # whole table
            raise ValueError(
                f"snapshot_table stream: offset version {lo} of "
                f"{self._table_dir} no longer exists (vacuumed?); "
                "cannot compute the append delta — restart the stream "
                "with a fresh checkpoint"
            )
        prev_files = (
            set(_files_of(self._table_dir, _manifest(self._table_dir, lo)))
            if lo in versions
            else set()
        )
        import os

        ddir, _ = bio._snapshot_paths(self._table_dir)
        parts: list[_FilePartition] = []
        baseline = lo not in versions  # fresh start: no base manifest
        for v in versions:
            if not (lo < v <= hi):
                continue
            man = _manifest(self._table_dir, v)
            files = _files_of(self._table_dir, man)
            if baseline:
                # the first version a fresh stream sees IS the initial
                # snapshot — emit its full file set whatever its mode
                # (a table's v1 is an overwrite by construction)
                baseline = False
            elif man.get("mode") != "append":
                if not self._ignore_changes:
                    raise ValueError(
                        f"snapshot_table stream: version {v} of "
                        f"{self._table_dir} is a {man.get('mode')!r} commit — "
                        "the file delta is not an append set. Restart from a "
                        "later startingVersion, or set ignoreChanges=true to "
                        "skip rewrite commits (their rows are not re-emitted)."
                    )
                prev_files = set(files)
                continue
            new = [f for f in files if f not in prev_files]
            parts.extend(_FilePartition(os.path.join(ddir, f)) for f in new)
            prev_files = set(files)
        return parts

    def read(self, partition: _FilePartition):
        # executor-side: one parquet file → Arrow batches projected to
        # the STREAM schema (null-fill columns the file predates,
        # drop columns added after the stream started) — zero
        # row-at-a-time Python
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        cols = []
        for f in self._schema.fields:
            if f.name in tbl.column_names:
                cols.append(tbl.column(f.name))
            else:
                # file predates this column (additive evolution):
                # typed nulls, so Arrow→Spark conversion stays exact
                cols.append(pa.nulls(n, type=to_arrow_type(f.dataType)))
        out = pa.table(dict(zip([f.name for f in self._schema.fields], cols)))
        for batch in out.to_batches(max_chunksize=1 << 16):
            yield batch

    def commit(self, end: dict) -> None:
        pass


class SnapshotDataSource(DataSource):
    """``spark.readStream.format("snapshot_table")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return SNAPSHOT_SOURCE_NAME

    def schema(self) -> StructType:
        from bigdata_foundation_spark import io as bio

        table_dir = self.options["path"]
        start = int(self.options.get("startingversion", 1))
        versions = bio.snapshot_versions(table_dir)
        if not versions:
            raise FileNotFoundError(f"no snapshot versions in {table_dir}")
        anchor = max(v for v in versions if v <= start) if start >= versions[0] else versions[0]
        return StructType.fromJson(_manifest(table_dir, anchor)["schema"])

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(schema, dict(self.options))


def register_snapshot_source(spark) -> None:
    """Register the snapshot streaming source with this session (idempotent)."""
    spark.dataSource.register(SnapshotDataSource)

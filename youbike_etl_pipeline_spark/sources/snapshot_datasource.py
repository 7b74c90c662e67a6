"""Spark 4 Python Data Source for the station-snapshot feed (SURVEY §2.1 S1).

The reference ingests a city-API JSON snapshot with a driver-side requests
loop (``etl_job.py:64-80``) and flattens it with pandas (``etl_job.py:88``).
``sources/http.py`` keeps that driver-side shape for the one-small-payload
case; THIS module is the Spark-4-native realization for when the feed is big
enough to matter: a custom ``DataSource`` (``format("youbike_snapshot")``)
whose reads are

- **partitioned** — the snapshot splits into N input partitions read by N
  tasks (``numPartitions`` option; a production endpoint with per-district
  or paginated URLs would fetch one page per partition), and
- **filter-pushing** — ``EqualTo("sarea", ...)`` / ``IsNotNull("sarea")``
  are absorbed by the reader and applied before rows ever reach Spark, so a
  district-filtered query moves only that district's bytes; every other
  predicate is returned to Spark untouched.

A ``SimpleDataSourceStreamReader`` twin replays a DIRECTORY of snapshot
files in filename order, one file per micro-batch — the reference's
10-minute cron tick as a first-class Structured Streaming source with
exactly-once offsets (the committed offset is the number of files consumed),
instead of a cron job bolted onto a batch job.

Offline-by-design: both readers take a ``path`` (file or directory of JSON
snapshot lists). The HTTP fetch itself stays in ``sources/http.py`` behind
its retry policy; tests exercise the partitioning/pushdown/offset logic on
local fixtures, which is exactly what the contract needs.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..schemas import RAW_STATION_SNAPSHOT

#: Fields of the raw snapshot, in schema order (tuples yielded by readers
#: must match this order exactly).
_FIELDS = [f.name for f in RAW_STATION_SNAPSHOT.fields]


def _load_records(path: str) -> list[dict]:
    with open(path, encoding="utf-8") as fh:
        data = json.load(fh)
    if not isinstance(data, list):
        raise ValueError(f"expected a JSON list of station records in {path}")
    return data


def _to_row(rec: dict) -> tuple:
    return tuple(rec.get(name) for name in _FIELDS)


class SnapshotDataSource(DataSource):
    """``spark.read.format("youbike_snapshot").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "youbike_snapshot"

    def schema(self) -> StructType:
        return RAW_STATION_SNAPSHOT

    def reader(self, schema: StructType) -> "SnapshotReader":
        return SnapshotReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> "SnapshotStreamReader":
        return SnapshotStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "SnapshotWriter":
        return SnapshotWriter(self.options, overwrite)


class SnapshotPartition(InputPartition):
    def __init__(self, index: int, num_partitions: int, path: str):
        self.index = index
        self.num_partitions = num_partitions
        self.path = path


class SnapshotReader(DataSourceReader):
    """Partitioned batch read with district-equality pushdown."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("youbike_snapshot requires a 'path' option")
        # Spark lower-cases option keys
        self.num_partitions = int(options.get("numpartitions", 4))
        if self.num_partitions < 1:
            raise ValueError("numPartitions must be >= 1")
        self.sarea_filter: str | None = None
        self.require_sarea = False

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb ``sarea = 'X'`` and ``sarea IS NOT NULL``; everything else
        goes back to Spark (the list is an AND — dropping a supported
        conjunct from the returned iterable is safe, weakening isn't)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("sarea",):
                self.sarea_filter = f.value
            elif isinstance(f, IsNotNull) and f.attribute == ("sarea",):
                self.require_sarea = True
            else:
                yield f

    def partitions(self) -> Sequence[SnapshotPartition]:
        return [
            SnapshotPartition(i, self.num_partitions, self.path)
            for i in range(self.num_partitions)
        ]

    def read(self, partition: SnapshotPartition) -> Iterator[tuple]:
        # Each task reads its round-robin slice; a paginated production
        # endpoint would fetch page `partition.index` here instead.
        records = _load_records(partition.path)
        for rec in records[partition.index :: partition.num_partitions]:
            sarea = rec.get("sarea")
            if self.require_sarea and sarea is None:
                continue
            if self.sarea_filter is not None and sarea != self.sarea_filter:
                continue
            yield _to_row(rec)


class SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Replays ``*.json`` snapshot files from a directory in filename order,
    one file per micro-batch. Offset = number of files consumed, so restart
    resumes exactly after the last committed file (the cron tick as a real
    streaming source)."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("youbike_snapshot stream requires a 'path' option")

    def _files(self) -> list[str]:
        return sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".json")
        )

    def initialOffset(self) -> dict:
        return {"files_consumed": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = self._files()
        consumed = start["files_consumed"]
        batch = files[consumed : consumed + 1]  # one snapshot per tick
        rows = iter(
            [_to_row(rec) for path in batch for rec in _load_records(path)]
        )
        return rows, {"files_consumed": consumed + len(batch)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = self._files()
        for path in files[start["files_consumed"] : end["files_consumed"]]:
            for rec in _load_records(path):
                yield _to_row(rec)


@dataclass
class SnapshotCommit(WriterCommitMessage):
    """Per-task commit message: the temp file the task wrote + row count."""

    temp_file: str
    rows: int


class SnapshotWriter(DataSourceWriter):
    """JSON snapshot sink with an all-or-nothing commit protocol.

    Each task writes its partition to ``_tmp_<uuid>.json`` and returns the
    path in its commit message; the driver-side ``commit`` renames every
    temp file into place and writes a ``_MANIFEST.json`` naming the visible
    files + total rows — readers that honor the manifest never observe a
    half-written dataset. ``abort`` deletes the temp files, so a failed
    write leaves nothing visible. (The same protocol a JDBC/warehouse sink
    runs with BEGIN/COMMIT; here made explicit on files.)
    """

    def __init__(self, options: dict, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("youbike_snapshot write requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator) -> SnapshotCommit:
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp_{uuid.uuid4().hex}.json")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("[")
            for row in iterator:
                if n:
                    fh.write(",")
                json.dump(dict(zip(_FIELDS, row)), fh)
                n += 1
            fh.write("]")
        return SnapshotCommit(temp_file=tmp, rows=n)

    def commit(self, messages) -> None:
        visible, total = [], 0
        for i, msg in enumerate(m for m in messages if m is not None):
            final = os.path.join(self.dir, f"part-{i:05d}.json")
            os.replace(msg.temp_file, final)
            visible.append(os.path.basename(final))
            total += msg.rows
        manifest = os.path.join(self.dir, "_MANIFEST.json")
        with open(manifest, "w", encoding="utf-8") as fh:
            json.dump({"files": visible, "rows": total}, fh)

    def abort(self, messages) -> None:
        for msg in messages:
            if msg is not None and os.path.exists(msg.temp_file):
                os.remove(msg.temp_file)


def register(spark) -> None:
    """Make ``format("youbike_snapshot")`` available on this session."""
    spark.dataSource.register(SnapshotDataSource)

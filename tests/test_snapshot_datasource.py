"""Spark 4 Python Data Source tests (sources/snapshot_datasource.py).

The batch reader must split the snapshot across N input partitions and
absorb the sarea equality pushdown; the streaming reader must replay one
snapshot file per micro-batch with resumable offsets. All offline on local
JSON fixtures — the HTTP fetch lives separately behind sources/http.py.
"""

from __future__ import annotations

import json
import os

import pytest

from youbike_etl_pipeline_spark.schemas import RAW_STATION_SNAPSHOT
from youbike_etl_pipeline_spark.sources.snapshot_datasource import (
    SnapshotDataSource,
    SnapshotReader,
    SnapshotStreamReader,
    register,
)

SNAP = [
    {
        "sno": f"50011{i:02d}",
        "sna": f"Station {i}",
        "sarea": "Daan" if i % 3 == 0 else "Xinyi",
        "latitude": 25.02 + i * 0.001,
        "longitude": 121.54 + i * 0.001,
        "Quantity": 20 + i,
        "available_rent_bikes": i,
        "available_return_bikes": 20 - i,
        "srcUpdateTime": f"2024-01-01 00:{i:02d}:00",
    }
    for i in range(10)
]


@pytest.fixture(scope="module")
def snap_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("snap")
    p = os.path.join(d, "snapshot.json")
    with open(p, "w", encoding="utf-8") as fh:
        json.dump(SNAP, fh)
    return p


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


def test_batch_read_round_trip(registered, snap_file):
    df = (
        registered.read.format("youbike_snapshot")
        .option("path", snap_file)
        .option("numPartitions", 3)
        .load()
    )
    assert df.schema == RAW_STATION_SNAPSHOT
    rows = {r.sno: r for r in df.collect()}
    assert len(rows) == 10
    assert rows["5001100"].sarea == "Daan"
    assert rows["5001101"].Quantity == 21


def test_partitions_split_the_snapshot(registered, snap_file):
    df = (
        registered.read.format("youbike_snapshot")
        .option("path", snap_file)
        .option("numPartitions", 5)
        .load()
    )
    # 5 input partitions -> 5 tasks; the union of slices is the full set
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 10


def test_sarea_pushdown_prunes_before_spark(registered, snap_file):
    from pyspark.sql import functions as F

    df = (
        registered.read.format("youbike_snapshot")
        .option("path", snap_file)
        .load()
        .filter(F.col("sarea") == "Daan")
    )
    got = sorted(r.sno for r in df.collect())
    want = sorted(r["sno"] for r in SNAP if r["sarea"] == "Daan")
    assert got == want


def test_push_filters_returns_only_unsupported():
    from pyspark.sql.datasource import EqualTo, GreaterThan, IsNotNull

    reader = SnapshotReader({"path": "/dev/null"})
    unsupported = list(
        reader.pushFilters(
            [
                EqualTo(("sarea",), "Daan"),
                IsNotNull(("sarea",)),
                GreaterThan(("Quantity",), 5),
            ]
        )
    )
    # the two sarea filters are absorbed; the Quantity one goes back to Spark
    assert len(unsupported) == 1
    assert unsupported[0].attribute == ("Quantity",)
    assert reader.sarea_filter == "Daan"
    assert reader.require_sarea is True


def test_missing_path_fails_loudly():
    with pytest.raises(ValueError, match="path"):
        SnapshotReader({})
    with pytest.raises(ValueError, match="path"):
        SnapshotStreamReader({})


def test_stream_replays_one_file_per_batch(registered, tmp_path):
    d = tmp_path / "ticks"
    d.mkdir()
    for tick in range(3):
        recs = [dict(r, srcUpdateTime=f"2024-01-01 0{tick}:00:00") for r in SNAP[:4]]
        (d / f"tick_{tick:03d}.json").write_text(json.dumps(recs))

    stream = (
        registered.readStream.format("youbike_snapshot")
        .option("path", str(d))
        .load()
    )
    # NB: Python micro-batch streams don't support Trigger.AvailableNow
    # (Spark falls back to ONE batch, which would read a single tick);
    # the default trigger + processAllAvailable drains every tick.
    q = (
        stream.writeStream.format("memory")
        .queryName("snap_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = registered.table("snap_stream")
    assert out.count() == 12  # 3 ticks x 4 stations
    assert out.select("srcUpdateTime").distinct().count() == 3


def test_stream_offsets_resume_after_commit(tmp_path):
    d = tmp_path / "ticks2"
    d.mkdir()
    for tick in range(2):
        (d / f"tick_{tick}.json").write_text(json.dumps(SNAP[:2]))

    reader = SnapshotStreamReader({"path": str(d)})
    start = reader.initialOffset()
    rows1, off1 = reader.read(start)
    assert len(list(rows1)) == 2 and off1 == {"files_consumed": 1}
    rows2, off2 = reader.read(off1)
    assert len(list(rows2)) == 2 and off2 == {"files_consumed": 2}
    # drained: no more files, offset stable
    rows3, off3 = reader.read(off2)
    assert list(rows3) == [] and off3 == {"files_consumed": 2}
    # replay between committed offsets is exact
    replay = list(reader.readBetweenOffsets(start, off1))
    assert len(replay) == 2


def test_datasource_name_and_schema():
    assert SnapshotDataSource.name() == "youbike_snapshot"
    ds = SnapshotDataSource(options={"path": "/dev/null"})
    assert ds.schema() == RAW_STATION_SNAPSHOT


def test_write_commit_protocol_round_trip(registered, snap_file, tmp_path):
    out = str(tmp_path / "sink")
    src = (
        registered.read.format("youbike_snapshot")
        .option("path", snap_file)
        .option("numPartitions", 3)
        .load()
    )
    src.write.format("youbike_snapshot").option("path", out).mode("append").save()

    manifest = json.loads(open(os.path.join(out, "_MANIFEST.json")).read())
    assert manifest["rows"] == 10
    # every manifest file exists; no temp files survive the commit
    names = sorted(os.listdir(out))
    assert all(f in names for f in manifest["files"])
    assert not any(n.startswith("_tmp_") for n in names)
    # round-trip: the written files reread to the same snapshot
    back = []
    for f in manifest["files"]:
        back.extend(json.load(open(os.path.join(out, f))))
    assert sorted(r["sno"] for r in back) == sorted(r["sno"] for r in SNAP)


def test_write_abort_leaves_nothing_visible(tmp_path):
    from youbike_etl_pipeline_spark.sources.snapshot_datasource import SnapshotWriter

    out = str(tmp_path / "aborted")
    w = SnapshotWriter({"path": out}, overwrite=False)
    msg = w.write(iter([tuple(r.values()) for r in SNAP[:3]]))
    assert os.path.exists(msg.temp_file) and msg.rows == 3
    w.abort([msg, None])
    assert os.listdir(out) == []  # temp cleaned, no manifest written

"""Custom Python data source (Spark 4 API): format("tle") must agree
row-for-row with the Catalyst assembly path on the same landing files,
parallelize per file, and feed the full parse pipeline unchanged."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

NOW = dt.datetime(2026, 8, 1)


def _payload(norad: int) -> str:
    doy = (NOW - dt.datetime(NOW.year, 1, 1)).days + 1
    epoch = f"{NOW.year % 100:02d}{doy:03d}.25000000"
    return (
        f"SAT-{norad}\n"
        f"1 {norad:05d}U 20001A   {epoch}  .00001234  00000+0  13717-3 0  9995\n"
        f"2 {norad:05d}  53.0537 205.1100 0001450  90.1234 270.0123 15.06402843350061\n"
    )


def _register(spark):
    from celestrak_tle_data_pipeline_spark.sources.pysource import (
        TLEDataSource,
    )

    spark.dataSource.register(TLEDataSource)


def test_tle_format_matches_catalyst_assembly(spark, tmp_path):
    from celestrak_tle_data_pipeline_spark.operators.assembly import (
        assemble_from_payloads,
        read_payloads,
    )

    land = tmp_path / "land"
    land.mkdir()
    # two files; second carries two sats, messy whitespace, and a
    # trailing partial triple that must drop
    (land / "a.txt").write_text(_payload(41001))
    (land / "b.txt").write_text(
        "  " + _payload(41002) + _payload(41003) + "DANGLING-NAME\n1 droppp"
    )

    _register(spark)
    via_source = (
        spark.read.format("tle")
        .option("path", str(land))
        .load()
        .select("sat_name_raw", "line1", "line2")
    )
    via_catalyst = assemble_from_payloads(
        read_payloads(spark, str(land))
    ).select("sat_name_raw", "line1", "line2")
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, via_catalyst.collect())
    )
    assert via_source.count() == 3

    # file-grain parallelism: one input partition per landing file
    assert via_source.rdd.getNumPartitions() == 2


def test_tle_format_feeds_parse_pipeline(spark, tmp_path):
    from celestrak_tle_data_pipeline_spark.functions.tle import (
        parse_tle_triples,
        valid_record,
    )

    land = tmp_path / "pland"
    land.mkdir()
    (land / "a.txt").write_text(_payload(42001))
    _register(spark)
    triples = spark.read.format("tle").option("path", str(land)).load()
    parsed = parse_tle_triples(triples, fetched_at=NOW).where(valid_record())
    rows = parsed.select("norad_id", "epoch_utc").collect()
    assert [r.norad_id for r in rows] == [42001]
    assert rows[0].epoch_utc == dt.datetime(2026, 8, 1, 6, 0, 0)


def test_tle_stream_reader_incremental_and_batch_parity(spark, tmp_path):
    """Streaming half of the pluggable format: the landing-dir tail is
    exactly-once across drains of one checkpoint (offset = consumed
    file set), a restart with no new files is a no-op, and the union
    of streamed batches equals the BATCH read of the same directory
    row-for-row (shared split_triples contract)."""
    land = tmp_path / "sland"
    land.mkdir()
    ckpt = str(tmp_path / "sck")
    _register(spark)

    got: list = []

    def drain():
        src = (
            spark.readStream.format("tle")
            .option("path", str(land))
            .load()
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, _id: got.extend(map(tuple, df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    (land / "a.txt").write_text(_payload(43001))
    drain()
    assert len(got) == 1 and got[0][3] == "a.txt"

    # second file lands; same checkpoint consumes ONLY the new file
    (land / "b.txt").write_text(_payload(43002) + _payload(43003))
    drain()
    assert len(got) == 3

    # restart with nothing new: no duplicates
    drain()
    assert len(got) == 3

    batch = (
        spark.read.format("tle").option("path", str(land)).load()
    )
    assert sorted(got) == sorted(map(tuple, batch.collect()))


def test_stream_reader_settle_window_defers_fresh_files(tmp_path):
    """settleSeconds > 0: a file whose mtime is inside the settle
    window is absent from BOTH the batch rows and the committed end
    offset, then consumed whole once quiescent — the loss-free mode
    for producers that append in place instead of atomic-renaming."""
    import os
    import time

    from celestrak_tle_data_pipeline_spark.sources.pysource import (
        TLESimpleStreamReader,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "old.tle").write_text(_payload(11111))
    (land / "fresh.tle").write_text(_payload(22222))
    past = time.time() - 3600
    os.utime(land / "old.tle", (past, past))  # long settled

    rdr = TLESimpleStreamReader(
        {"path": str(land), "settleSeconds": "30"}
    )
    rows, end = rdr.read(rdr.initialOffset())
    assert [r[3] for r in rows] == ["old.tle"]
    assert end == {"files": ["old.tle"]}  # fresh file NOT committed

    # once the file settles, the next batch picks it up whole
    os.utime(land / "fresh.tle", (past, past))
    rows2, end2 = rdr.read(end)
    assert [r[3] for r in rows2] == ["fresh.tle"]
    assert end2 == {"files": ["fresh.tle", "old.tle"]}

    # settle off (default): everything visible immediately
    rdr0 = TLESimpleStreamReader({"path": str(land)})
    rows0, _ = rdr0.read(rdr0.initialOffset())
    assert sorted(r[3] for r in rows0) == ["fresh.tle", "old.tle"]


def test_firehose_stream_partition_planned_parity(spark, tmp_path):
    """The partition-planned firehose reader: same offset algebra as
    the simple reader, but every landed file is read on EXECUTORS as
    its own InputPartition. Pins: exactly-once across drains of one
    checkpoint, restart no-op, stream union == batch read, and
    file-grain partition planning (partitions(start, end) = one per
    new file, derived purely from the offsets)."""
    from celestrak_tle_data_pipeline_spark.sources.pysource import (
        TLEFirehoseDataSource,
        TLEPartitionedStreamReader,
    )

    spark.dataSource.register(TLEFirehoseDataSource)
    land = tmp_path / "fland"
    land.mkdir()
    ckpt = str(tmp_path / "fck")

    got: list = []

    def drain():
        src = (
            spark.readStream.format("tle_firehose")
            .option("path", str(land))
            .load()
        )
        q = (
            src.writeStream.foreachBatch(
                lambda df, _id: got.extend(map(tuple, df.collect()))
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    (land / "a.txt").write_text(_payload(45001))
    drain()
    assert len(got) == 1 and got[0][3] == "a.txt"

    # two more files in one batch; same checkpoint reads ONLY them
    (land / "b.txt").write_text(_payload(45002) + _payload(45003))
    (land / "c.txt").write_text(_payload(45004))
    drain()
    assert len(got) == 4

    # restart with nothing new: no duplicates
    drain()
    assert len(got) == 4

    batch = (
        spark.read.format("tle_firehose")
        .option("path", str(land))
        .load()
    )
    assert sorted(got) == sorted(map(tuple, batch.collect()))

    # partition planning is pure offset algebra: end − start, one
    # partition per NEW file, independent of disk state ordering
    r = TLEPartitionedStreamReader({"path": str(land)})
    parts = r.partitions(
        {"files": ["a.txt"]}, {"files": ["a.txt", "b.txt", "c.txt"]}
    )
    assert sorted(p.path.split("/")[-1] for p in parts) == [
        "b.txt",
        "c.txt",
    ]
    assert r.partitions({"files": []}, {"files": []}) == []

    # replay determinism: the same (start, end) pair plans the same
    # partitions and re-reading them yields the same rows
    again = r.partitions(
        {"files": ["a.txt"]}, {"files": ["a.txt", "b.txt", "c.txt"]}
    )
    rows1 = sorted(row for p in parts for row in r.read(p))
    rows2 = sorted(row for p in again for row in r.read(p))
    assert rows1 == rows2 and len(rows1) == 3

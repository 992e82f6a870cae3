"""Contract tests for the `cells` Python DataSource — the engine's
equivalent of the reference scifio reader's option surface
(main.py:17-19, test.py:10): row identity with the mapInPandas
generator, channel-projection pushdown, row-limit pushdown, masked
schema switch, partition planning, and image_id predicate pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_science_project_spark.sources import cells_datasource as CD
from big_data_science_project_spark.sources.cells import load_cells, select_channels


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    CD.register(spark)


def _fmt(spark):
    return spark.read.format("cells")


def test_rows_match_mapinpandas_source(spark):
    a = sorted(map(tuple, _fmt(spark).option("n_images", 12).load().collect()))
    b = sorted(map(tuple, load_cells(spark, n_images=12).collect()))
    assert a == b


def test_imagelimit_pushdown(spark):
    df = _fmt(spark).option("n_images", 240).option("imagelimit", 7).load()
    assert df.count() == 7


def test_channel_projection_pushdown(spark):
    full = load_cells(spark, n_images=6)
    expected = sorted(map(tuple, select_channels(full, [0, 2]).collect()))
    got = sorted(map(tuple, _fmt(spark).option("n_images", 6)
                 .option("channels", "0,2").load().collect()))
    assert got == expected
    # pruned data length is 2 channels, not 3
    row = _fmt(spark).option("n_images", 1).option("channels", "1").load().first()
    assert len(row["data"]) == row["width"] * row["height"]
    assert row["n_channels"] == 1


def test_masked_false_drops_mask_column(spark):
    df = _fmt(spark).option("n_images", 2).option("masked", "false").load()
    assert "mask" not in df.columns
    assert df.count() == 2


def test_numpartitions_planning(spark):
    df = _fmt(spark).option("n_images", 40).option("numpartitions", 5).load()
    assert df.rdd.getNumPartitions() == 5


def test_image_id_predicate_pushdown(spark):
    df = (_fmt(spark).option("n_images", 240).option("numpartitions", 4).load()
          .filter((F.col("image_id") >= 100) & (F.col("image_id") < 104)))
    rows = df.select("image_id").collect()
    assert sorted(r["image_id"] for r in rows) == [100, 101, 102, 103]
    # the filter was consumed by the reader: partitions cover only the range
    dsrc = CD.CellsDataSource({"n_images": "240", "numpartitions": "4"})
    reader = dsrc.reader(dsrc.schema())
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan
    left = reader.pushFilters([GreaterThanOrEqual(("image_id",), 100),
                               LessThan(("image_id",), 104)])
    assert left == []
    parts = reader.partitions()
    assert min(p.start for p in parts) == 100
    assert max(p.end for p in parts) == 104


def test_stream_scan_matches_batch_scan(spark):
    """The streaming reader (offset-log micro-batches) must be
    row-identical to the batch reader on the same options — same
    synthesis core, different admission bookkeeping."""
    from big_data_science_project_spark.sources.cells_datasource import (
        cells_source_scan, cells_stream_scan)

    got = sorted(tuple(r) for r in cells_stream_scan(spark).collect())
    want = sorted(tuple(r) for r in cells_source_scan(spark).collect())
    assert got == want and len(got) == 2


def test_stream_reader_offsets_and_partitions():
    """Offset admission: latestOffset advances streambatch per call,
    clamps at the row limit; partitions cover [start, end) exactly."""
    from big_data_science_project_spark.sources import cells_datasource as CD

    dsrc = CD.CellsDataSource({"n_images": "100", "streambatch": "40",
                               "numpartitions": "3"})
    r = dsrc.streamReader(dsrc.schema())
    assert r.initialOffset() == {"next": 0}
    assert [r.latestOffset()["next"] for _ in range(4)] == [40, 80, 100, 100]
    parts = r.partitions({"next": 40}, {"next": 80})
    covered = sorted((p.start, p.end) for p in parts)
    assert covered[0][0] == 40 and covered[-1][1] == 80
    assert all(a < b for a, b in covered)
    assert r.partitions({"next": 100}, {"next": 100}) == []


def test_writer_roundtrip_row_identity(spark):
    """df.write.format("cells") → .npz containers + manifest →
    binaryFile decode returns the EXACT source rows (every pixel and
    mask bit), and the manifest covers all containers/rows."""
    import json
    import os
    import tempfile

    from big_data_science_project_spark.sources.cells_binary import (
        CELLS_SCHEMA, _decode_npz)

    CD.register(spark)
    out = tempfile.mkdtemp(prefix="cells_dsw_test_")
    src = (spark.read.format("cells")
           .option("n_images", 20).option("numpartitions", 3).load())
    src.write.format("cells").option("path", out).mode("append").save()

    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        man = json.load(fh)
    assert man["n_rows"] == 20
    on_disk = sorted(os.path.join(out, f) for f in os.listdir(out)
                     if f.endswith(".npz"))
    assert sorted(man["containers"]) == on_disk
    assert len(on_disk) == 3  # one container per non-empty task

    back = (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.npz").load(out)
            .select("content").mapInPandas(_decode_npz, CELLS_SCHEMA))
    want = sorted(tuple(r) for r in src.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_writer_overwrite_replaces_previous_containers(spark):
    """mode("overwrite") clears prior containers; a second write leaves
    exactly the new file set, not an accumulation."""
    import os
    import tempfile

    CD.register(spark)
    out = tempfile.mkdtemp(prefix="cells_dsw_ovw_")
    src = (spark.read.format("cells")
           .option("n_images", 12).option("numpartitions", 2).load())
    src.write.format("cells").option("path", out).mode("append").save()
    first = set(os.listdir(out))
    src.write.format("cells").option("path", out).mode("overwrite").save()
    second = {f for f in os.listdir(out) if f.endswith(".npz")}
    assert len(second) == 2
    assert not (first & second), "overwrite must not retain old containers"


def test_stream_sink_roundtrip_and_epoch_manifests(spark):
    """readStream("cells") → writeStream.format("cells"): 3 epoch
    manifests (one per 40-image micro-batch), manifest rows cover all
    images exactly once, and decoding the manifest-listed containers
    reproduces the batch source rows exactly."""
    import glob
    import json
    import os

    from big_data_science_project_spark.sources import cells_datasource as CD2
    from big_data_science_project_spark.sources.cells_binary import (
        CELLS_SCHEMA, _decode_npz)

    df = CD2.QUERIES["cells_stream_sink"][0](spark)
    rollup = {r["channel"]: (r["total_area"], r["n_images"])
              for r in df.collect()}
    assert set(rollup) == {0, 1, 2}
    assert all(n == 120 for _, n in rollup.values())

    # strongest check: decoded rows == batch DataSource rows
    out = CD2.LAST_STREAM_SINK_DIR
    assert out is not None
    manifests = sorted(glob.glob(os.path.join(out, "_batch-*.json")))
    assert len(manifests) == 3
    ids = []
    for mp in manifests:
        with open(mp) as fh:
            m = json.load(fh)
        assert m["containers"], mp
        ids.append(m["n_rows"])
    assert sum(ids) == 120

    back = (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.npz").load(out)
            .select("content").mapInPandas(_decode_npz, CELLS_SCHEMA))
    CD2.register(spark)
    src = (spark.read.format("cells")
           .option("imagelimit", 120).option("numpartitions", 4).load())
    assert sorted(tuple(r) for r in back.collect()) == \
        sorted(tuple(r) for r in src.collect())


def test_writer_abort_removes_orphans_and_skips_manifest(spark):
    """Two-phase commit, unhappy path: if any task fails, the driver
    must NOT publish a manifest and abort() must remove the containers
    successful tasks already wrote."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    CD.register(spark)
    out = tempfile.mkdtemp(prefix="cells_dsw_abort_")
    src = (spark.read.format("cells")
           .option("n_images", 20).option("numpartitions", 4).load())

    @F.udf("long")
    def boom(i):
        if i >= 15:  # fails only the last partition's rows
            raise ValueError("synthetic task failure")
        return i

    bad = src.withColumn("image_id", boom("image_id"))
    import pytest as _pytest
    with _pytest.raises(Exception):
        bad.write.format("cells").option("path", out).mode("append").save()

    assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))
    leftover = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert leftover == [], f"abort left orphans: {leftover}"


def test_writer_append_merges_manifest(spark):
    """Two mode("append") jobs into the same path: the manifest must list
    BOTH jobs' containers and the summed row count — append may not
    silently drop the first job from the read contract."""
    import json
    import os
    import tempfile

    CD.register(spark)
    out = tempfile.mkdtemp(prefix="cells_dsw_app_")
    src = (spark.read.format("cells")
           .option("n_images", 10).option("numpartitions", 2).load())
    src.write.format("cells").option("path", out).mode("append").save()
    src.write.format("cells").option("path", out).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        man = json.load(fh)
    on_disk = {os.path.join(out, f) for f in os.listdir(out)
               if f.endswith(".npz")}
    assert man["n_rows"] == 20
    assert set(man["containers"]) == on_disk
    assert len(on_disk) == 4


def test_snapshot_time_travel_reads_exact_versions(spark):
    """Snapshot v1 returns exactly the first append's rows; v2 and the
    current manifest return both; row content is identical to the
    sources."""
    import tempfile

    from big_data_science_project_spark.sources.cells_datasource import (
        read_snapshot)

    CD.register(spark)
    out = tempfile.mkdtemp(prefix="cells_tt_test_")
    first = (spark.read.format("cells")
             .option("imagelimit", 8).option("numpartitions", 2).load())
    second = (spark.read.format("cells")
              .option("imagelimit", 16).option("numpartitions", 2).load()
              .filter(F.col("image_id") >= 8))
    first.write.format("cells").option("path", out).mode("append").save()
    second.write.format("cells").option("path", out).mode("append").save()

    v1 = sorted(tuple(r) for r in read_snapshot(spark, out, 1).collect())
    v2 = sorted(tuple(r) for r in read_snapshot(spark, out, 2).collect())
    cur = sorted(tuple(r) for r in read_snapshot(spark, out).collect())
    want1 = sorted(tuple(r) for r in first.collect())
    want2 = sorted(want1 + [tuple(r) for r in second.collect()])
    assert v1 == want1
    assert v2 == want2 == cur


def test_stream_sink_epoch_bounded_read(spark):
    """read_stream_epochs(up_to_batch=0) returns exactly the first
    epoch's rows (40 images); unbounded returns all 120 — read-committed
    tailing over the epoch manifests."""
    import glob
    import os
    import tempfile

    from big_data_science_project_spark.sources import cells_datasource as CD2
    from big_data_science_project_spark.sources.cells_datasource import (
        read_stream_epochs)

    # drive the stream sink once via the registry query; the query
    # records its own output dir — no racy tempdir scanning
    CD2.QUERIES["cells_stream_sink"][0](spark).collect()
    out = CD2.LAST_STREAM_SINK_DIR
    assert out and glob.glob(os.path.join(out, "_batch-*.json"))

    first = read_stream_epochs(spark, out, up_to_batch=0)
    ids0 = sorted(r["image_id"] for r in first.collect())
    assert len(ids0) == 40 and max(ids0) < 40  # offsets admit in id order
    all_rows = read_stream_epochs(spark, out)
    assert all_rows.count() == 120


def test_snapshot_read_after_overwrite_fails_loudly(spark):
    """A snapshot whose containers a later overwrite reclaimed must
    raise, not return a silently-empty DataFrame."""
    import tempfile

    import pytest as _pytest

    from big_data_science_project_spark.sources.cells_datasource import (
        read_snapshot)

    CD.register(spark)
    out = tempfile.mkdtemp(prefix="cells_tt_ovw_")
    src = (spark.read.format("cells")
           .option("imagelimit", 6).option("numpartitions", 2).load())
    src.write.format("cells").option("path", out).mode("append").save()
    src.write.format("cells").option("path", out).mode("overwrite").save()
    with _pytest.raises(FileNotFoundError, match="no longer exist"):
        read_snapshot(spark, out, version=1)
    # the post-overwrite snapshot still reads fine
    assert read_snapshot(spark, out).count() == 6

"""``spark.read.format("cells")`` — a Python DataSource (Spark 4
``pyspark.sql.datasource``) reproducing the reference scifio reader's
contract and pushdown surface (``/root/reference/main.py:17-19``,
``test.py:10``):

| reference option        | here            | pushdown effect                  |
|-------------------------|-----------------|----------------------------------|
| ``channels`` "1,2,3"    | same (0-based)  | only those channel slices are
|                         |                 | generated/decoded — projection
|                         |                 | pushdown into the reader         |
| ``imagelimit``          | same            | row-limit pushdown (id range cut)|
| ``filelimit``           | ``n_images``    | dataset-size bound               |
| ``numpartitionsperfile``| ``numpartitions``| reader-side split planning      |
| ``masked``              | same            | schema excludes ``mask`` when
|                         |                 | false — column never materialized|

Additionally ``pushFilters`` accepts ``image_id`` comparisons
(``EqualTo``/``LessThan``/``GreaterThan``...) and cuts them into the
per-partition id ranges — predicate pushdown the reference reader never
had. Batches are emitted as Arrow ``RecordBatch``es (the vectorized
reader path), not per-row tuples.

The actual pixel synthesis is shared with :mod:`.cells` (`_gen_image`),
so DataFrames from either path are row-identical — asserted in
tests/test_cells_datasource.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    DataSourceStreamWriter, DataSourceWriter,
                                    EqualTo, Filter, GreaterThan,
                                    GreaterThanOrEqual, InputPartition,
                                    LessThan, LessThanOrEqual,
                                    WriterCommitMessage)
from pyspark.sql.types import (ArrayType, BooleanType, DoubleType,
                               IntegerType, LongType, StructField, StructType)

from .cells import DEFAULT_C, DEFAULT_H, DEFAULT_N, DEFAULT_W, _gen_image


@dataclass
class _IdRange(InputPartition):
    start: int
    end: int


class CellsDataSource(DataSource):
    """Register with ``spark.dataSource.register(CellsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "cells"

    def _opts(self):
        o = self.options
        channels = o.get("channels")
        n_channels = int(o.get("n_channels", DEFAULT_C))
        sel = ([int(c) for c in str(channels).split(",")]
               if channels else list(range(n_channels)))
        bad = [c for c in sel if not 0 <= c < n_channels]
        if bad:
            raise ValueError(
                f"channels option out of range {bad}: image has "
                f"{n_channels} channels (0..{n_channels - 1})")
        return {
            "n_images": int(o.get("n_images", DEFAULT_N)),
            "imagelimit": int(o["imagelimit"]) if "imagelimit" in o else None,
            "numpartitions": int(o.get("numpartitions", 8)),
            "n_channels": n_channels,
            "width": int(o.get("width", DEFAULT_W)),
            "height": int(o.get("height", DEFAULT_H)),
            "channels": sel,
            "masked": str(o.get("masked", "true")).lower() == "true",
            # streaming only: images admitted per latestOffset() advance
            "streambatch": int(o.get("streambatch", 40)),
        }

    def schema(self) -> StructType:
        masked = self._opts()["masked"]
        fields = [
            StructField("image_id", LongType(), False),
            StructField("n_channels", IntegerType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("data", ArrayType(DoubleType()), False),
        ]
        if masked:
            fields.append(StructField("mask", ArrayType(BooleanType()), False))
        return StructType(fields)

    def reader(self, schema: StructType) -> "CellsReader":
        return CellsReader(self._opts(), schema)

    def streamReader(self, schema: StructType) -> "CellsStreamReader":
        return CellsStreamReader(self._opts(), schema)

    def writer(self, schema: StructType, overwrite: bool) -> "CellsWriter":
        return CellsWriter(dict(self.options), schema, overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> "CellsStreamWriter":
        return CellsStreamWriter(dict(self.options), schema, overwrite)


class CellsReader(DataSourceReader):
    def __init__(self, opts: dict, schema: StructType):
        self.o = opts
        self.read_cols = [f.name for f in schema.fields]
        self.lo = 0
        n = self.o["n_images"]
        if self.o["imagelimit"] is not None:
            n = min(n, self.o["imagelimit"])  # row-limit pushdown
        self.hi = n

    # -- predicate pushdown on image_id ------------------------------------
    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        unsupported = []
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col != "image_id":
                unsupported.append(f)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            else:
                unsupported.append(f)
        return unsupported

    def partitions(self) -> list[_IdRange]:
        n = max(0, self.hi - self.lo)
        k = max(1, min(self.o["numpartitions"], n or 1))
        step = -(-n // k) if n else 1
        return [_IdRange(self.lo + i * step, min(self.lo + (i + 1) * step, self.hi))
                for i in range(k)] or [_IdRange(0, 0)]

    def read(self, partition: _IdRange):
        yield _arrow_batch_for_range(self.o, self.read_cols,
                                     partition.start, partition.end)


def _arrow_batch_for_range(o: dict, read_cols: list, start: int, end: int):
    """Shared generation core for the batch and streaming readers: one
    Arrow RecordBatch of cell rows for an id range, with channel
    projection pushdown applied at synthesis time."""
    import numpy as np

    sel = o["channels"]
    cols: dict[str, list] = {c: [] for c in read_cols}
    for image_id in range(start, end):
        data, mask = _gen_image(image_id, o["n_channels"],
                                o["width"], o["height"])
        wh = o["width"] * o["height"]
        # channel projection pushdown: slice only requested channels
        if "image_id" in cols:
            cols["image_id"].append(image_id)
        if "n_channels" in cols:
            cols["n_channels"].append(len(sel))
        if "width" in cols:
            cols["width"].append(o["width"])
        if "height" in cols:
            cols["height"].append(o["height"])
        if "data" in cols:
            cols["data"].append(np.concatenate(
                [data[c * wh:(c + 1) * wh] for c in sel]))
        if "mask" in cols:
            cols["mask"].append(np.concatenate(
                [mask[c * wh:(c + 1) * wh] for c in sel]))
    arrays, names = [], []
    pa_types = {"image_id": pa.int64(), "n_channels": pa.int32(),
                "width": pa.int32(), "height": pa.int32(),
                "data": pa.list_(pa.float64()),
                "mask": pa.list_(pa.bool_())}
    for name in read_cols:
        arrays.append(pa.array(cols[name], type=pa_types[name]))
        names.append(name)
    return pa.RecordBatch.from_arrays(arrays, names=names)


class CellsStreamReader(DataSourceStreamReader):
    """Streaming twin of :class:`CellsReader` (Spark 4 Python streaming
    data source): offsets are image-id watermarks, ``latestOffset``
    admits ``streambatch`` new images per micro-batch, and each batch's
    id range is split into executor-side partitions that emit the SAME
    Arrow batches as the batch reader. This is the scifio-source shape a
    live acquisition feed would use — the instrument keeps appending
    images; offset bookkeeping (not the data path) is the only
    difference from the batch scan. Exactly-once comes from the offset
    log: a replayed range regenerates identical rows because synthesis
    is a pure function of image_id."""

    def __init__(self, opts: dict, schema: StructType):
        self.o = opts
        self.read_cols = [f.name for f in schema.fields]
        n = opts["n_images"]
        if opts["imagelimit"] is not None:
            n = min(n, opts["imagelimit"])
        self.n = n
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self.n, self._latest + self.o["streambatch"])
        return {"next": self._latest}

    def partitions(self, start: dict, end: dict) -> list:
        lo, hi = start["next"], end["next"]
        n = max(0, hi - lo)
        if n == 0:
            return []
        k = max(1, min(self.o["numpartitions"], n))
        step = -(-n // k)
        return [_IdRange(lo + i * step, min(lo + (i + 1) * step, hi))
                for i in range(k)]

    def read(self, partition: _IdRange):
        yield _arrow_batch_for_range(self.o, self.read_cols,
                                     partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _WroteContainer(WriterCommitMessage):
    path: str
    n_rows: int


def _write_rows_container(path: str, cols: list, rows,
                          tag: str) -> _WroteContainer:
    """One task → one uniquely-named .npz container (job tag + task id +
    uuid, so retried/speculative attempts can't collide and the job's
    files are identifiable for abort cleanup), atomic rename."""
    import os
    import uuid

    import numpy as np
    from pyspark import TaskContext

    ids, data, mask = [], [], []
    for r in rows:
        c, w, h = int(r.n_channels), int(r.width), int(r.height)
        ids.append(int(r.image_id))
        data.append(np.asarray(r.data, dtype=np.float64).reshape(c, w, h))
        mask.append(np.asarray(
            r.mask if "mask" in cols else
            np.zeros(c * w * h, dtype=bool), dtype=bool).reshape(c, w, h))
    if not ids:
        return _WroteContainer("", 0)
    pid = TaskContext.get().partitionId() if TaskContext.get() else 0
    final = os.path.join(
        path, f"cells-{tag}-{pid:05d}-{uuid.uuid4().hex[:12]}.npz")
    tmp = final + ".inprogress"
    with open(tmp, "wb") as fh:
        np.savez(fh, image_ids=np.asarray(ids, dtype=np.int64),
                 data=np.stack(data), mask=np.stack(mask))
    os.replace(tmp, final)
    return _WroteContainer(final, len(ids))


class CellsWriter(DataSourceWriter):
    """``df.write.format("cells")`` — the sink half of the custom source
    (Spark 4 Python DataSourceWriter), the engine's answer to the
    reference's image sink (S5, ``feature extraction.py:89-91``) done
    RIGHT: the reference's ``cv.imwrite`` inside a distributed map wrote
    every task to the same relative path (Pitfall 9); here each task
    writes its own uniquely-named ``.npz`` container (task id + uuid, so
    speculative/retried attempts can't collide), and the two-phase
    commit protocol is real — ``write`` returns a commit message per
    task, the driver's ``commit`` publishes the manifest only when every
    task succeeded, and ``abort`` removes the orphans. Spark's Python
    write path hands ``abort`` only ``None`` messages (successful tasks'
    messages are dropped on job failure — verified empirically), so
    cleanup uses the standard job-staging pattern instead: the driver
    mints a job tag at writer construction, every container name carries
    it, and abort sweeps the tag's files (finished and .inprogress).
    Overwrite is two-phase too: new containers stage alongside the old
    data and the swap (delete-old + publish-manifest) happens only in
    ``commit`` — a failed overwrite leaves the previous dataset and its
    manifest untouched. Append merges the prior manifest, so a second
    append lists BOTH jobs' containers. The manifest is the read
    contract: readers take ``containers`` from it, never a bare glob.
    Containers use the same layout as :mod:`.cells_binary`, so anything
    written here is readable by the binaryFile→decode scan path."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cells writer requires .option('path', dir)")
        self.cols = [f.name for f in schema.fields]
        for need in ("image_id", "n_channels", "width", "height", "data"):
            if need not in self.cols:
                raise ValueError(f"cells writer: missing column {need}")
        import os
        import uuid
        self.overwrite = overwrite
        self.tag = uuid.uuid4().hex[:8]  # this job's staging identity
        os.makedirs(self.path, exist_ok=True)

    def write(self, rows) -> _WroteContainer:
        return _write_rows_container(self.path, self.cols, rows, self.tag)

    def commit(self, messages) -> None:
        import glob
        import json
        import os
        files = sorted((m.path, m.n_rows) for m in messages if m.n_rows)
        containers = [p for p, _ in files]
        n_rows = sum(n for _, n in files)
        manifest_path = os.path.join(self.path, "_MANIFEST.json")
        if self.overwrite:
            # the swap half of two-phase overwrite: old containers go
            # only now, after every task succeeded. Overwrite reclaims
            # immediately, so snapshots before it become unreadable
            # (documented; retention would defer this delete).
            for f in glob.glob(os.path.join(self.path, "cells-*.npz")):
                if f"cells-{self.tag}-" not in f:
                    os.remove(f)
        # snapshot layer (time travel): every commit publishes a
        # SELF-CONTAINED _snapshot-<v>.json with the full listing as of
        # that commit (the Iceberg snapshot-manifest model); _MANIFEST
        # mirrors the latest one as the "current" pointer. Version
        # allocation assumes a single concurrent writer per path (as do
        # file sinks without a locking catalog); appends merge lineage
        # from the MAX-VERSION SNAPSHOT, not _MANIFEST, so a crash
        # between the two publishes below cannot drop a committed
        # snapshot's containers from subsequent history.
        snaps = {int(f.rsplit("-", 1)[1].split(".")[0]): f
                 for f in glob.glob(os.path.join(self.path,
                                                 "_snapshot-*.json"))}
        if not self.overwrite and snaps:
            with open(snaps[max(snaps)]) as fh:
                prev = json.load(fh)
            containers = sorted(set(prev["containers"]) | set(containers))
            n_rows += prev["n_rows"]
        v = max(snaps, default=0) + 1
        body = {"version": v, "containers": containers, "n_rows": n_rows}
        for dest in (os.path.join(self.path, f"_snapshot-{v}.json"),
                     manifest_path):
            tmp = dest + ".inprogress"
            with open(tmp, "w") as fh:  # atomic publish
                json.dump(body, fh)
            os.replace(tmp, dest)

    def abort(self, messages) -> None:
        # messages are all None here (see class docstring) — sweep by tag,
        # including temp files from tasks killed mid-write
        import glob
        import os
        for pat in (f"cells-{self.tag}-*.npz",
                    f"cells-{self.tag}-*.npz.inprogress"):
            for f in glob.glob(os.path.join(self.path, pat)):
                os.remove(f)


class CellsStreamWriter(DataSourceStreamWriter):
    """``writeStream.format("cells")`` — the streaming half of the sink
    (Spark 4 Python DataSourceStreamWriter). Same per-task container
    write as the batch sink; the epoch boundary is the commit unit: each
    micro-batch publishes ``_batch-<id>.json`` naming its containers —
    idempotent by filename, so a retried epoch REPLACES its manifest and
    orphans from the failed attempt stay unlisted (readers consume the
    manifest union, the log-structured commit pattern file sinks use).
    ``abort`` deletes the failed epoch's containers eagerly."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cells stream writer requires .option('path')")
        self.cols = [f.name for f in schema.fields]
        import os
        import uuid
        self.tag = uuid.uuid4().hex[:8]
        os.makedirs(self.path, exist_ok=True)

    def write(self, rows) -> _WroteContainer:
        return _write_rows_container(self.path, self.cols, rows, self.tag)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os
        files = sorted((m.path, m.n_rows) for m in messages
                       if m and m.n_rows)
        final = os.path.join(self.path, f"_batch-{batchId}.json")
        tmp = final + ".inprogress"
        # atomic publish: concurrent manifest readers must never observe
        # a half-written epoch (caught live: a drain poller hit an empty
        # file mid-json.dump under a slow 3-thread session)
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batchId,
                       "containers": [p for p, _ in files],
                       "n_rows": sum(n for _, n in files)}, fh)
        os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        # task messages may be None on failure; sweep this writer's tag
        # (finished and mid-write temp files), sparing anything an
        # already-committed epoch manifest lists
        import glob
        import json
        import os
        committed = set()
        for mp in glob.glob(os.path.join(self.path, "_batch-*.json")):
            with open(mp) as fh:
                committed.update(json.load(fh)["containers"])
        for pat in (f"cells-{self.tag}-*.npz",
                    f"cells-{self.tag}-*.npz.inprogress"):
            for f in glob.glob(os.path.join(self.path, pat)):
                if f not in committed:
                    os.remove(f)


QUERIES: dict = {}

LAST_STREAM_SINK_DIR: str | None = None


def _decode_listed(spark, path: str, listed: list, require_all: bool = True):
    """Decode exactly the manifest-listed containers under ``path``.
    The ``file:`` prefix matches binaryFile's Hadoop-URI path form; with
    ``require_all`` a listed-but-missing container raises instead of
    silently shrinking the dataset (e.g. a snapshot whose files a later
    overwrite reclaimed)."""
    import os

    from pyspark.sql import functions as F

    from .cells_binary import CELLS_SCHEMA, _decode_npz

    if require_all:
        missing = [p for p in listed if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} listed container(s) no longer exist "
                f"(reclaimed by a later overwrite?): {missing[:3]}")
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.npz").load(path)
            .filter(F.col("path").isin([f"file:{p}" for p in listed]
                                       + listed))
            .select("content").mapInPandas(_decode_npz, CELLS_SCHEMA))



def cells_stream_sink(spark, sf_dir: str = ""):
    """Registry query: stream→sink round trip across the full custom
    matrix — readStream from the cells SOURCE (3 micro-batches of 40
    images through the offset log) into the cells STREAM SINK, then read
    only the manifest-listed containers back through the npz decoder and
    roll up per channel. Exactly-once is checked structurally: 3 epoch
    manifests, 120 manifest rows, decoded rows == source rows."""
    import contextlib
    import glob
    import json
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..streaming.events import _scratch_checkpoint
    from .cells import per_channel_mask_rollup
    from .cells_binary import CELLS_SCHEMA, _decode_npz

    register(spark)
    n_images = 120
    out = tempfile.mkdtemp(prefix="cells_ssink_")
    stream = (spark.readStream.format("cells")
              .option("imagelimit", n_images)
              .option("numpartitions", 4).option("streambatch", 40).load())
    def manifest_rows():
        listed, total = [], 0
        for mp in sorted(glob.glob(os.path.join(out, "_batch-*.json"))):
            try:
                with open(mp) as fh:
                    m = json.load(fh)
            except (json.JSONDecodeError, OSError):
                continue  # epoch publish in flight; next poll sees it
            listed += m["containers"]
            total += m["n_rows"]
        return listed, total

    # the custom source admits streambatch images per trigger, so the
    # stream needs repeated triggers (availableNow would bound itself to
    # the first latestOffset) — same drain pattern as cells_stream_scan
    import shutil
    import time
    with contextlib.ExitStack() as stack:
        ckpt = stack.enter_context(_scratch_checkpoint())
        if not ckpt:  # no /dev/shm: own the fallback dir's cleanup too
            ckpt = tempfile.mkdtemp(prefix="ck_")
            stack.callback(shutil.rmtree, ckpt, True)
        writer = (stream.writeStream.format("cells").option("path", out)
                  .option("checkpointLocation", ckpt))
        q = writer.trigger(processingTime="0 seconds").start()
        stack.callback(q.awaitTermination)
        stack.callback(q.stop)
        deadline = time.time() + 120
        while time.time() < deadline:
            if manifest_rows()[1] >= n_images:
                break
            time.sleep(0.05)
    listed, total = manifest_rows()
    if total != n_images:
        raise AssertionError(f"manifests cover {total}/{n_images} rows")
    global LAST_STREAM_SINK_DIR
    LAST_STREAM_SINK_DIR = out  # deterministic handle for tests/consumers
    back = _decode_listed(spark, out, listed)
    return per_channel_mask_rollup(back)


QUERIES["cells_stream_sink"] = (cells_stream_sink, None)  # rows-only


def cells_datasource_write(spark, sf_dir: str = ""):
    """Registry query: full write→read round trip through the custom
    sink — scan 48 synthetic cells from the DataSource reader, write
    them through the DataSource writer (4 containers + manifest), read
    the bytes back via binaryFile + the shared npz decoder, and return
    the per-channel rollup of the DECODED rows. Identity with the
    source rows is asserted in tests/test_cells_datasource.py."""
    import json
    import os
    import tempfile

    from pyspark.sql import functions as F

    from .cells import per_channel_mask_rollup
    from .cells_binary import CELLS_SCHEMA, _decode_npz

    register(spark)
    out = tempfile.mkdtemp(prefix="cells_dsw_")
    src = (spark.read.format("cells")
           .option("n_images", 48).option("numpartitions", 4).load())
    (src.write.format("cells").option("path", out).mode("append").save())
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        man = json.load(fh)
    if man["n_rows"] != 48:
        raise AssertionError(f"manifest rows {man['n_rows']} != 48")
    # the manifest IS the read contract: only committed containers are
    # decoded (a retried task's orphan would otherwise double-count)
    back = _decode_listed(spark, out, man["containers"])
    return per_channel_mask_rollup(back)


from .cells import rollup_oracle_sql as _rollup_sql48  # noqa: E402

QUERIES["cells_datasource_write"] = (cells_datasource_write,
                                     _rollup_sql48(48, [0, 1, 2]))


def read_snapshot(spark, path: str, version: int | None = None):
    """Time-travel read of a cells sink directory: decode exactly the
    containers the requested snapshot (default: latest) lists."""
    import json
    import os

    from pyspark.sql import functions as F

    from .cells_binary import CELLS_SCHEMA, _decode_npz

    name = ("_MANIFEST.json" if version is None
            else f"_snapshot-{version}.json")
    with open(os.path.join(path, name)) as fh:
        man = json.load(fh)
    # require_all: a snapshot whose containers a later overwrite
    # reclaimed must FAIL loudly, not return a silently-empty frame
    return _decode_listed(spark, path, man["containers"])


def cells_snapshot_timetravel(spark, sf_dir: str = ""):
    """Registry query: snapshot isolation / time travel on the custom
    sink — two append jobs create snapshots v1 (images 0-9) and v2
    (0-19); reading AS OF v1 must return only the first job's rows while
    the latest read sees both. Output: one row per snapshot with its
    row count and id bounds."""
    import tempfile

    from pyspark.sql import functions as F

    register(spark)
    out = tempfile.mkdtemp(prefix="cells_tt_")
    first = (spark.read.format("cells")
             .option("imagelimit", 10).option("numpartitions", 2).load())
    second = (spark.read.format("cells")
              .option("imagelimit", 20).option("numpartitions", 2).load()
              .filter(F.col("image_id") >= 10))
    first.write.format("cells").option("path", out).mode("append").save()
    second.write.format("cells").option("path", out).mode("append").save()
    outs = []
    for v in (1, 2):
        outs.append(
            read_snapshot(spark, out, version=v)
            .agg(F.lit(v).alias("snapshot"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.min("image_id").alias("min_id"),
                 F.max("image_id").alias("max_id")))
    return outs[0].unionByName(outs[1]).orderBy("snapshot")


QUERIES["cells_snapshot_timetravel"] = (cells_snapshot_timetravel, None)


def read_stream_epochs(spark, path: str, up_to_batch: int | None = None):
    """Epoch-bounded read of a cells STREAM sink: decode the containers
    listed by epoch manifests with batch_id ≤ up_to_batch (default: all
    committed epochs) — the streaming analogue of snapshot time travel,
    and exactly how a downstream batch consumer tails the sink with
    read-committed semantics."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from .cells_binary import CELLS_SCHEMA, _decode_npz

    listed = []
    for mp in sorted(glob.glob(os.path.join(path, "_batch-*.json"))):
        with open(mp) as fh:
            m = json.load(fh)
        if up_to_batch is None or m["batch_id"] <= up_to_batch:
            listed += m["containers"]
    return _decode_listed(spark, path, listed)


def cells_source_scan(spark, sf_dir: str = ""):
    """Registry query: the reference smoke path (test.py:10 — load with
    imagelimit + channel subset, then inspect) through the DataSource,
    ending in per-channel area totals."""
    from .cells import per_channel_mask_rollup

    register(spark)
    df = (spark.read.format("cells")
          .option("imagelimit", 120).option("channels", "0,1")
          .option("numpartitions", 4).load())
    return per_channel_mask_rollup(df)


from .cells import rollup_oracle_sql as _rollup_sql  # noqa: E402

QUERIES["cells_source_scan"] = (cells_source_scan,
                                _rollup_sql(120, [0, 1]))


def cells_stream_scan(spark, sf_dir: str = ""):
    """The cells source as a LIVE stream: 120 images arrive 40 per
    micro-batch (3 real batches through the offset log), per-image
    per-channel areas append to the sink as they arrive, and the final
    per-channel rollup runs batch-side over the drained sink — identical
    output shape to ``cells_source_scan``, so the two paths are directly
    comparable. The drain loop polls the sink row count: the expected
    total is known (images × channels) because synthesis is
    deterministic, and a stop-guard bounds the wait."""
    import contextlib
    import time

    from pyspark.sql import functions as F

    from ..functions import image_kernels as K

    register(spark)
    n_images, n_ch = 120, 2
    stream = (spark.readStream.format("cells")
              .option("imagelimit", n_images).option("channels", "0,1")
              .option("numpartitions", 4).option("streambatch", 40).load())
    wh = F.col("width") * F.col("height")
    per_ch = stream.select(
        "image_id",
        F.explode(F.sequence(F.lit(0), F.col("n_channels") - 1)).alias("channel"),
        K.channel_slice(F.col("mask"), F.col("channel"), wh).alias("mask_ch")
    ).select("image_id", "channel", K.area(F.col("mask_ch")).alias("area"))

    from ..streaming.events import _scratch_checkpoint

    name = "stream_result_cells_scan"
    spark.catalog.dropTempView(name)
    expected = n_images * n_ch
    # ExitStack so the /dev/shm checkpoint dir is removed even when
    # writer construction or start() raises, and the query is always
    # stopped before the checkpoint teardown
    with contextlib.ExitStack() as stack:
        ckpt = stack.enter_context(_scratch_checkpoint())
        writer = (per_ch.writeStream.format("memory").queryName(name)
                  .outputMode("append"))
        if ckpt:
            writer = writer.option("checkpointLocation", ckpt)
        q = writer.trigger(processingTime="0 seconds").start()
        stack.callback(q.awaitTermination)
        stack.callback(q.stop)
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= expected:
                break
            time.sleep(0.05)
    got = spark.table(name).count()
    if got < expected:
        raise TimeoutError(
            f"cells stream drained {got}/{expected} rows within deadline")
    return (spark.table(name).groupBy("channel")
            .agg(F.sum("area").alias("total_area"),
                 F.count(F.lit(1)).alias("n_images")))


QUERIES["cells_stream_scan"] = (cells_stream_scan,
                                _rollup_sql(120, [0, 1]))


def register(spark) -> None:
    # pushFilters requires the (default-off) Python pushdown flag; runtime-
    # settable, so the driver's own session works too
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CellsDataSource)

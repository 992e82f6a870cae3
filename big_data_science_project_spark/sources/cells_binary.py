"""Real binary-file ingestion for the cells table — the missing S1 piece.

The reference reads actual ``.cif`` container bytes from disk through its
scifio source (``/root/reference/main.py:19``: ``option("path", ...)``
over a 105 MB LFS file, several images per container).  The env has no
``.cif`` fixture or codec, so this module closes the gap with the same
*shape* of pipeline over a format we can both write and decode with
what's baked in (numpy): multi-image ``.npz`` containers on disk, read
back as raw bytes via Spark's built-in ``binaryFile`` source and decoded
executor-side in ``mapInPandas`` to the exact ``CELLS_SCHEMA`` rows the
generator path produces.

Scale notes (the part that transfers to real 100 TB ingestion):

- The **write** is distributed: one task per container file, each task
  synthesizes only its id slice and writes to a unique path (the
  reference's per-task image sink pattern, fixes its Pitfall 9 of
  colliding task outputs). Driver only collects the bounded per-file
  manifest (n_files rows).
- The **read** is ``spark.read.format("binaryFile")`` — Spark plans one
  input split per file (binary files don't split), so parallelism = file
  count; at scale you size ``images_per_file`` so containers land in the
  0.1–1 GB range and the file count ≫ executor count.  Column pruning
  applies: selecting only ``content`` before the decode drops the
  path/mtime columns from the scan.
- The **decode** is Arrow-batched ``mapInPandas`` — per-partition,
  zero driver involvement, identical to how a real codec (scifio,
  pillow, pyav) would slot in; only ``np.load`` would change.
"""

from __future__ import annotations

import io
import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .cells import CELLS_SCHEMA, _gen_image, select_channels

QUERIES: dict = {}

_COLS = [f.name for f in CELLS_SCHEMA.fields]


def _fixture_dir(n_images: int, images_per_file: int,
                 c: int, w: int, h: int) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"bdsp_cells_npz_v1_n{n_images}_f{images_per_file}_{c}x{w}x{h}")


def write_cells_binary(spark: SparkSession, out_dir: str, n_images: int,
                       images_per_file: int, c: int, w: int, h: int) -> int:
    """Distributed container write: one task per .npz file, unique paths,
    atomic rename so a concurrent reader never sees partial bytes."""
    n_files = (n_images + images_per_file - 1) // images_per_file
    os.makedirs(out_dir, exist_ok=True)

    def write_one(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fid in pdf["id"]:
                fid = int(fid)
                lo = fid * images_per_file
                hi = min(lo + images_per_file, n_images)
                ids = np.arange(lo, hi, dtype=np.int64)
                data = np.empty((len(ids), c, w, h), dtype=np.float64)
                mask = np.empty((len(ids), c, w, h), dtype=bool)
                for i, img in enumerate(ids):
                    d, m = _gen_image(int(img), c, w, h)
                    data[i] = d.reshape(c, w, h)
                    mask[i] = m.reshape(c, w, h)
                final = os.path.join(out_dir, f"part-{fid:05d}.npz")
                tmp = final + f".tmp-{os.getpid()}"
                with open(tmp, "wb") as fh:
                    np.savez(fh, image_ids=ids, data=data, mask=mask)
                os.replace(tmp, final)
                out.append((fid, len(ids)))
            yield pd.DataFrame(out, columns=["file_id", "n_images"])

    manifest = (spark.range(0, n_files, 1, min(n_files, 8))
                .mapInPandas(write_one, "file_id long, n_images long")
                .collect())  # bounded: one row per container file
    assert sum(r["n_images"] for r in manifest) == n_images
    return n_files


def ensure_fixture(spark: SparkSession, n_images: int = 120,
                   images_per_file: int = 30, c: int = 3,
                   w: int = 16, h: int = 16) -> str:
    """Write-once fixture keyed by its parameters (_SUCCESS marker)."""
    out_dir = _fixture_dir(n_images, images_per_file, c, w, h)
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        write_cells_binary(spark, out_dir, n_images, images_per_file, c, w, h)
        with open(marker, "w"):
            pass
    return out_dir


def _decode_npz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Container decoder (shared by the batch and streaming scans): npz
    bytes → cells rows. A real codec (scifio/pillow/pyav) slots in here
    by replacing only np.load."""
    for pdf in batches:
        rows = []
        for content in pdf["content"]:
            with np.load(io.BytesIO(bytes(content))) as z:
                ids, data, mask = z["image_ids"], z["data"], z["mask"]
            nc, wd, ht = data.shape[1], data.shape[2], data.shape[3]
            for i, img_id in enumerate(ids):
                rows.append((int(img_id), nc, wd, ht,
                             data[i].reshape(-1).tolist(),
                             mask[i].reshape(-1).tolist()))
        yield pd.DataFrame(rows, columns=_COLS)


def load_cells_binary(spark: SparkSession, n_images: int = 120,
                      images_per_file: int = 30, c: int = 3,
                      w: int = 16, h: int = 16) -> DataFrame:
    """binaryFile scan → executor-side container decode → cells rows.

    Row-identical to ``load_cells(spark, n_images=n_images)`` (asserted
    in tests/test_cells_binary.py) — proving the S1 contract holds over
    real bytes on disk, not just the synthesizer.
    """
    path = ensure_fixture(spark, n_images, images_per_file, c, w, h)
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.npz").load(path)
           .select("content"))  # prune path/mtime/length from the scan
    return raw.mapInPandas(_decode_npz, CELLS_SCHEMA)


def cells_binary_scan(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Registry query: same output shape as ``cells_source_scan`` (per-
    channel area rollup over 120 images, channels 0-1) but fed from real
    container bytes through binaryFile — the two paths are directly
    comparable."""
    from .cells import per_channel_mask_rollup

    cells = select_channels(load_cells_binary(spark, n_images=120), [0, 1])
    return per_channel_mask_rollup(cells)


from .cells import rollup_oracle_sql as _rollup_sql  # noqa: E402

QUERIES["cells_binary_scan"] = (cells_binary_scan,
                                _rollup_sql(120, [0, 1]))


def cells_binary_stream_scan(spark: SparkSession, sf_dir: str = "") -> DataFrame:
    """Streaming twin of ``cells_binary_scan`` — the production "files
    land in a bucket, decode on arrival" ingestion: ``readStream.format
    ("binaryFile")`` tails the container directory (here drained with
    availableNow), ``maxFilesPerTrigger`` bounds each micro-batch, and
    the same mapInPandas decoder runs per batch. Output = the identical
    per-channel rollup, so batch/stream parity is directly assertable.
    At scale this is how image corpora ingest incrementally: checkpoint
    tracks which files are done, late files just form new batches."""
    import contextlib

    from pyspark.sql import functions as F

    from ..functions import image_kernels as K
    from ..streaming.events import _scratch_checkpoint
    from .cells import select_channels

    path = ensure_fixture(spark, n_images=120, images_per_file=30)
    raw = (spark.readStream.format("binaryFile")
           .option("pathGlobFilter", "*.npz")
           .option("maxFilesPerTrigger", 2)   # 2 containers per micro-batch
           .schema("path string, modificationTime timestamp, "
                   "length long, content binary")
           .load(path)
           .select("content"))
    cells = select_channels(raw.mapInPandas(_decode_npz, CELLS_SCHEMA), [0, 1])
    wh = F.col("width") * F.col("height")
    per_ch = cells.select(
        "image_id",
        F.explode(F.sequence(F.lit(0), F.col("n_channels") - 1)).alias("channel"),
        K.area(K.channel_slice(F.col("mask"), F.col("channel"), wh))
        .alias("area"))

    name = "stream_result_cells_binary"
    spark.catalog.dropTempView(name)
    with contextlib.ExitStack() as stack:
        ckpt = stack.enter_context(_scratch_checkpoint())
        writer = (per_ch.writeStream.format("memory").queryName(name)
                  .outputMode("append"))
        if ckpt:
            writer = writer.option("checkpointLocation", ckpt)
        q = writer.trigger(availableNow=True).start()
        stack.callback(q.awaitTermination)
    got = spark.table(name).count()
    expected = 120 * 2
    if got < expected:
        raise TimeoutError(
            f"binary stream drained {got}/{expected} rows")
    return (spark.table(name).groupBy("channel")
            .agg(F.sum("area").alias("total_area"),
                 F.count(F.lit(1)).alias("n_images")))


QUERIES["cells_binary_stream_scan"] = (cells_binary_stream_scan,
                                       _rollup_sql(120, [0, 1]))

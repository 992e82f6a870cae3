"""Binary-container ingestion (S1's real-bytes path): the binaryFile →
mapInPandas-decode pipeline must be row-identical to the mapInPandas
generator — mirror of tests/test_cells_datasource.py's identity test,
but over actual .npz bytes on disk (reference main.py:19 reads real
.cif container bytes the same way)."""

from __future__ import annotations

import glob
import os

from big_data_science_project_spark.sources.cells import load_cells
from big_data_science_project_spark.sources.cells_binary import (
    cells_binary_scan,
    ensure_fixture,
    load_cells_binary,
)
from big_data_science_project_spark.sources.cells_datasource import (
    cells_source_scan,
)


def test_binary_decode_rows_match_generator(spark):
    a = sorted(map(tuple, load_cells_binary(spark, n_images=60,
                                            images_per_file=16).collect()))
    b = sorted(map(tuple, load_cells(spark, n_images=60).collect()))
    assert a == b


def test_fixture_is_real_files_and_write_once(spark):
    d = ensure_fixture(spark, n_images=60, images_per_file=16)
    files = sorted(glob.glob(os.path.join(d, "*.npz")))
    assert len(files) == 4  # ceil(60/16)
    assert all(os.path.getsize(f) > 0 for f in files)
    mtimes = [os.path.getmtime(f) for f in files]
    ensure_fixture(spark, n_images=60, images_per_file=16)  # no rewrite
    assert [os.path.getmtime(f) for f in files] == mtimes


def test_binary_scan_rollup_matches_datasource_scan(spark):
    """Same 120-image / 2-channel rollup through three ingestion paths:
    binary containers on disk vs the custom DataSource."""
    a = sorted(map(tuple, cells_binary_scan(spark).collect()))
    b = sorted(map(tuple, cells_source_scan(spark).collect()))
    assert a == b


def test_binary_stream_scan_matches_batch_scan(spark):
    """availableNow binaryFile stream (2 containers per micro-batch) must
    produce the identical rollup as the batch binaryFile scan."""
    from big_data_science_project_spark.sources.cells_binary import (
        cells_binary_stream_scan,
    )

    a = sorted(map(tuple, cells_binary_stream_scan(spark).collect()))
    b = sorted(map(tuple, cells_binary_scan(spark).collect()))
    assert a == b

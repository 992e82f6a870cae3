"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference (``elpoelma/big-data-science-project``), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, Arrow-vectorized
pandas UDFs only where built-ins cannot express the semantics.

Layout
------
- ``sources``    : parquet/CSV/JSON table loading + the synthetic ``cells``
                   multimodal fixture mirroring the reference's scifio row
                   contract (reference ``main.py:19``).
- ``functions``  : scalar/array kernel library (area/perimeter/circularity/
                   masked-mean, confusion metrics) as higher-order column
                   expressions and pandas UDFs.
- ``operators``  : query library (relational core, outlier model, dedup,
                   similarity search, text analysis, grid search).
- ``streaming``  : Structured Streaming surface over the ``events`` table.
- ``plans``      : plan inspection helpers (explain / pushdown checks).
"""

__version__ = "0.1.0"

# The driver supplies its own SparkSession and may launch Python workers
# with a cwd/PYTHONPATH that cannot import this package. Register the whole
# package for pickle-by-value so pandas-UDF closures are self-contained in
# the serialized task instead of re-imported by name on the worker.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

"""resotodatalink_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of someengineering/resotodatalink.

The reference (studied at /root/reference/, cited as ``file:line`` in
docstrings throughout this package) is a graph->relational ETL library
that delegates its entire query surface to a target SQL database
(collect_plugins.py:220-228).  This package owns both halves natively on
Spark:

* the graph->relational pipeline (kind model -> StructType compiler,
  node flattening, link tables, sinks with atomic swap), and
* the full relational query surface (projection/filter/join/agg/window/
  set-op/subquery/streaming) via DataFrame + Spark SQL, plus the
  large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) that a 100 TB pipeline needs.

Everything is expressed declaratively so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only where built-in
functions genuinely cannot express the semantics (multimodal decode).
"""

__version__ = "0.1.0"

from resotodatalink_spark.session import get_spark  # noqa: F401

"""econdatapipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the ``jibarix/econdatapipeline`` reference (a single-process pandas ETL
pipeline over Azure Table Storage), re-expressed as an idiomatic Spark
engine:

- Config-registry-driven ingestion (``registry``) of wide fiscal-year
  Excel grids, FRED REST JSON, and NYU ERP workbooks into a partitioned
  Parquet warehouse (``sources``).
- A declarative upsert-with-revision-audit operator (``operators.merge``)
  replacing the reference's row-at-a-time hash-map diff
  (reference: core_local/azure_data_tracker.py:54-165).
- A read-side query surface (``plans``) for dataset reads, revision
  history, and date-aligned multi-dataset export.
- Large-scale training-data operators (``operators.dedup``,
  ``operators.similarity``, ``functions.text``, ``operators.multimodal``)
  and Structured Streaming windows (``streaming``).

Everything is DataFrame/SQL-first: no RDDs, no row-at-a-time Python UDFs
in hot paths; Python only at Arrow-vectorized boundaries where built-in
expressions genuinely cannot express the semantics.
"""

from econdatapipeline_spark.registry import ALL_SPECS, DatasetSpec
from econdatapipeline_spark.session import get_spark
from econdatapipeline_spark.sources.warehouse import Warehouse

__all__ = ["ALL_SPECS", "DatasetSpec", "Warehouse", "get_spark"]
__version__ = "0.1.0"

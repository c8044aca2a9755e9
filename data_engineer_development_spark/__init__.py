"""data_engineer_development_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``brenocezardias/data-engineer-development``
(a GCP medallion ELT pipeline: typed CSV ingest, sentinel-null cleansing,
dimension decode builds, zone materialization, KV store, message channel),
extended with the operators a large-scale LLM training-data pipeline needs
(dedup, similarity search, text analysis, multimodal column plumbing).

Everything here is declarative DataFrame / Spark SQL so Catalyst + Tungsten
pick the physical strategy; Python UDFs only where built-ins genuinely can't
express the semantics (and then Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from data_engineer_development_spark.session import get_spark  # noqa: F401

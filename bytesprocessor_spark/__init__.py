"""bytesprocessor_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL pipeline (``Master-Sorcerer/BytesProcessor``: a chunked
pcap -> labeled-Parquet feature pipeline) plus a general relational /
windowed / streaming query surface and LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Design rules (see SURVEY.md §7):
  * DataFrame/SQL first — declare the logical plan, let Catalyst pick
    the physical strategy.
  * UDFs only where built-ins genuinely can't express the semantics
    (pcap byte surgery); always Arrow-vectorized, never row-at-a-time.
  * Every operator is designed for a 1000-executor / 100 TB cluster:
    broadcast the small side, keep filters pushable, avoid collect().
"""

from bytesprocessor_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

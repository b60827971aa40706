"""streamsurfer_spark — a PySpark-native analytics engine.

A from-scratch engine with the event-ingestion semantics of the reference
client library (AcordoCertoBR/streamsurfer, see /root/reference/main.go)
re-expressed on Spark Structured Streaming, plus a full relational and
LLM-data-pipeline operator surface designed for 100 TB scale.

Everything here is idiomatic PySpark: logical plans are declared through the
DataFrame/SQL API and optimized by Catalyst; Python touches data only through
Arrow-batched pandas UDFs, never row-at-a-time, and never via collect().
"""

from streamsurfer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

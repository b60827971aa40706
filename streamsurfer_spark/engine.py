"""Engine facade: the one-object API a reference user migrates to.

The reference's public surface is the three-method KinesisQueue interface
(/root/reference/main.go:19-24: Enqueue / Flush / Send) plus constructors.
This facade exposes (a) those exact semantics on Spark, and (b) the full
query surface around them — so "a user of the reference can switch and run
every query they run today" through one entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamsurfer_spark.session import DEFAULT_SF_DIR, get_spark, load_tables, table
from streamsurfer_spark.sink.config import KinesisSinkConfig


class Engine:
    """Session + catalog + sink wiring in one handle.

    >>> eng = Engine(sf_dir="/root/testdata/sf0.001")
    >>> eng.sql("SELECT count(*) AS n FROM lineitem").first().n
    6000
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = DEFAULT_SF_DIR,
        app_name: str = "streamsurfer-engine",
    ) -> None:
        self.spark = spark or get_spark(app_name)
        self.sf_dir = sf_dir
        self._views_loaded = False

    # --- catalog -------------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        return table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        """Run SQL against the fixture tables (views registered lazily)."""
        if not self._views_loaded:
            load_tables(self.spark, self.sf_dir)
            self._views_loaded = True
        return self.spark.sql(query)

    # --- declared queries ----------------------------------------------------

    def query(self, name: str) -> DataFrame:
        """Run a registry query by name (see queries/__init__.registry)."""
        from streamsurfer_spark.queries import registry

        return registry()[name].spark(self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        from streamsurfer_spark.queries import registry

        return sorted(registry())

    # --- reference-parity sink surface (Enqueue/Send/Flush ≈ R9/R10/R11) -----

    def kinesis_writer(
        self,
        config: KinesisSinkConfig,
        stream_df: DataFrame,
        client_factory=None,
        checkpoint_dir: str | None = None,
    ):
        """writeStream handle shipping the envelope through the byte-bounded
        chunker (the reference's Enqueue path, distributed)."""
        from streamsurfer_spark.sink.kinesis import (
            boto3_client_factory,
            envelope_payload,
            kinesis_stream_writer,
        )

        payloads = envelope_payload(stream_df, ts_col=None, origin=config.origin)
        return kinesis_stream_writer(
            payloads,
            config,
            client_factory=client_factory or boto3_client_factory,
            checkpoint_dir=checkpoint_dir,
        )

"""Thin engine facade: the user-facing API surface (SURVEY §7 M1).

One object wraps session + table registration + SQL/DataFrame entry +
lakehouse access, so a reference user's workflow maps one-to-one:

    eng = Engine.local(sf_dir="/root/testdata/sf0.1")
    eng.sql("SELECT COUNT(*) FROM lineitem").show()
    eng.table("orders").groupBy(...).agg(...)
    eng.catalog.get_or_create_table("out", df.schema).append(df)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crest_spark.lakehouse import LakehouseCatalog
from crest_spark.registry import ensure_session_confs
from crest_spark.session import get_spark
from crest_spark.sources.tables import TABLE_NAMES, load_table


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        warehouse: str | None = None,
    ):
        self.spark = spark
        ensure_session_confs(spark)
        self._sf_dir = sf_dir
        self.catalog = LakehouseCatalog(warehouse) if warehouse else None
        if sf_dir:
            for name in TABLE_NAMES:
                load_table(spark, sf_dir, name).createOrReplaceTempView(name)

    @classmethod
    def local(
        cls, sf_dir: str | None = None, warehouse: str | None = None, **conf
    ) -> "Engine":
        return cls(get_spark("crest-engine", extra_conf=conf or None), sf_dir, warehouse)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        if self._sf_dir is not None and name in TABLE_NAMES:
            return load_table(self.spark, self._sf_dir, name)
        return self.spark.table(name)

    def explain(self, query: str) -> str:
        from crest_spark.plans.checks import formatted_plan

        return formatted_plan(self.sql(query))

    def stream_table(
        self,
        name: str,
        namespace: str = "default",
        change_feed: bool = False,
    ) -> DataFrame:
        """Tail a lakehouse table as a stream (crest_table data source):
        commit versions are the offsets, each micro-batch delivers the
        newly appended files. ``change_feed=True`` streams the CDF form
        instead (rows carry ``_change_type``; merges/deletes made with
        ``change_feed=True`` contribute retractions rather than failing
        the stream). Requires a warehouse-backed engine."""
        if self.catalog is None:
            raise ValueError("stream_table requires an engine with a warehouse")
        from crest_spark.sources.table_stream import register_table_stream

        register_table_stream(self.spark)
        reader = (
            self.spark.readStream.format("crest_table")
            .option("warehouse", self.catalog.warehouse)
            .option("namespace", namespace)
            .option("table", name)
        )
        if change_feed:
            reader = reader.option("readChangeFeed", "true")
        return reader.load()

    def read_changes(
        self,
        name: str,
        after: int,
        upto: int | None = None,
        namespace: str | None = None,
        cdf: bool = False,
    ) -> DataFrame:
        """Incremental read of a lakehouse table's commits in
        ``(after, upto]``; ``cdf=True`` returns the change-data-feed
        form (``_change_type`` + ``_commit_version`` columns, merges/
        deletes staged with ``change_feed=True`` included as
        retractions). Requires a warehouse-backed engine."""
        if self.catalog is None:
            raise ValueError("read_changes requires an engine with a warehouse")
        return self.catalog.table(name, namespace).read_changes(
            self.spark, after=after, upto=upto, cdf=cdf
        )

    def incremental_view(
        self,
        source: str,
        name: str,
        group_by: list[str],
        aggs: dict,
        namespace: str | None = None,
        derived_cols: dict[str, str] | None = None,
    ):
        """An incrementally-maintained aggregate view over a lakehouse
        table (``lakehouse.matview.IncrementalAggView``): ``refresh()``
        folds only new commits; retractable views (sum/count/avg/
        histogram-percentile) also fold upserts/deletes through the
        change feed. Requires a warehouse-backed engine."""
        if self.catalog is None:
            raise ValueError(
                "incremental_view requires an engine with a warehouse"
            )
        from crest_spark.lakehouse.matview import IncrementalAggView

        return IncrementalAggView(
            self.catalog,
            source=source,
            name=name,
            group_by=group_by,
            aggs=aggs,
            namespace=namespace,
            derived_cols=derived_cols,
        )

    def _flight_reader(self, reader, location: str, prefix: str):
        from crest_spark.sources.flight_source import register_flight_source

        register_flight_source(self.spark)
        reader = reader.format("crest_flight").option("location", location)
        if prefix:
            reader = reader.option("prefix", prefix)
        return reader.load()

    def flight_table(self, location: str, prefix: str = "") -> DataFrame:
        """One-shot read of every flight currently listed at ``location``
        (the reference's ReadBatches pass over a Flight server)."""
        return self._flight_reader(self.spark.read, location, prefix)

    def stream_flight(self, location: str, prefix: str = "") -> DataFrame:
        """Continuously consume new flights from ``location`` — the
        reference's Flight ingress as a checkpointed streaming source."""
        return self._flight_reader(self.spark.readStream, location, prefix)

    def profile(
        self,
        name: str,
        numeric_cols: list[str],
        string_cols: list[str] = (),
        approx_distinct: bool = False,
    ) -> DataFrame:
        """Column-profile a registered table in one scan (see
        ``operators.stats.profile_columns``); pass
        ``approx_distinct=True`` at scale for HLL NDV."""
        from crest_spark.operators.stats import profile_columns

        return profile_columns(
            self.table(name), numeric_cols, string_cols, approx_distinct
        )

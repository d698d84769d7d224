"""Central query/operator registry.

Every implemented operator from SURVEY.md §2 registers here with:
  - ``fn(spark, sf_dir) -> DataFrame``  — the Spark-native implementation
  - ``oracle``                          — equivalent DuckDB-runnable ANSI SQL
                                          (None => non-SQL-expressible; the
                                          driver then records a rows-only
                                          check)

``__spark_entry__.py`` exposes this registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""
    module: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Session confs every query needs regardless of who built the session (the
# driver constructs its own SparkSession without our factory): nanosecond
# parquet timestamps are unreadable in Spark 4 without nanosAsLong, and
# epoch outputs / timestamp literals require a UTC session to match the
# (naive-timestamp) DuckDB oracle.
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # perf (all runtime-settable): AQE coalesces the vanilla 200-partition
    # shuffles down to the data's real size at any scale factor
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Ship crest_spark to Python workers via addPyFile.

    Driver processes that bootstrap with ``sys.path.insert`` (rather than
    PYTHONPATH) don't propagate the package to worker processes, so any
    closure referencing module-level helpers dies with
    ModuleNotFoundError. A one-time zip + addPyFile makes every worker
    able to import the package regardless of how the driver found it.
    """
    if getattr(spark, "_crest_pkg_shipped", False):
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"crest_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zip_path)
    except Exception:
        pass  # e.g. Connect sessions; closures are self-contained anyway
    spark._crest_pkg_shipped = True


def ensure_session_confs(spark: SparkSession) -> None:
    _ensure_package_shipped(spark)
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    # Stateful streaming ops can't use AQE coalescing; if the session still
    # has the untouched Spark default (200), right-size for local runs.
    # A deliberately configured value is left alone.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set("spark.sql.shuffle.partitions", "32")


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            tags=tags,
            doc=(fn.__doc__ or "").strip(),
            module=fn.__module__,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so registrations run, then return REGISTRY."""
    import crest_spark.operators.curation  # noqa: F401
    import crest_spark.operators.dedup  # noqa: F401
    import crest_spark.operators.multimodal  # noqa: F401
    import crest_spark.operators.relational  # noqa: F401
    import crest_spark.operators.similarity  # noqa: F401
    import crest_spark.operators.skew  # noqa: F401
    import crest_spark.operators.stats  # noqa: F401
    import crest_spark.operators.subqueries  # noqa: F401
    import crest_spark.operators.text  # noqa: F401
    import crest_spark.operators.timeseries  # noqa: F401
    import crest_spark.operators.tpch_shapes  # noqa: F401
    import crest_spark.operators.tpch_shapes2  # noqa: F401
    import crest_spark.operators.udf  # noqa: F401
    import crest_spark.streaming.queries  # noqa: F401

    return REGISTRY


def ordered_registry() -> dict[str, QuerySpec]:
    """The registry re-ordered so that ANY prefix spans the operator
    categories: round-robin one query per defining module, oracle-bearing
    entries first within each module (registration order otherwise
    preserved).

    Why: the correctness driver checks a fixed-size prefix of ``queries()``
    in iteration order. A module-sequential order front-loads two modules
    and leaves whole categories (tpch shapes, subqueries, text, stats,
    similarity, udf, streaming parity) with zero driver-side coverage;
    interleaving puts ≥3 queries from every category inside the first 50.
    """
    specs = load_all()
    by_module: dict[str, list[QuerySpec]] = {}
    for spec in specs.values():
        by_module.setdefault(spec.module, []).append(spec)
    for queue in by_module.values():
        queue.sort(key=lambda s: s.oracle is None)  # stable: oracles first
    ordered: dict[str, QuerySpec] = {}
    queues = list(by_module.values())
    i = 0
    while any(queues):
        for queue in queues:
            if i < len(queue):
                ordered[queue[i].name] = queue[i]
        i += 1
        if all(i >= len(q) for q in queues):
            break
    return ordered

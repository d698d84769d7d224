"""Schema-conversion matrix tests (SURVEY §1.4 / §5.2): PyArrow <->
StructType round-trip over the full supported surface incl. nested
list/struct/map, decimal, tz/no-tz timestamps, and the fail-fast path."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pyspark.sql import types as T

from crest_spark.functions.schema_convert import (
    arrow_schema_to_spark,
    arrow_type_to_spark,
    schema_to_string,
    spark_schema_to_arrow,
    spark_type_to_arrow,
)

MATRIX = [
    (pa.bool_(), T.BooleanType()),
    (pa.int8(), T.ByteType()),
    (pa.int16(), T.ShortType()),
    (pa.int32(), T.IntegerType()),
    (pa.int64(), T.LongType()),
    (pa.float32(), T.FloatType()),
    (pa.float64(), T.DoubleType()),
    (pa.string(), T.StringType()),
    (pa.binary(), T.BinaryType()),
    (pa.date32(), T.DateType()),
    (pa.timestamp("us"), T.TimestampNTZType()),
    (pa.timestamp("us", tz="UTC"), T.TimestampType()),
    (pa.decimal128(12, 4), T.DecimalType(12, 4)),
]


@pytest.mark.parametrize("arrow_t,spark_t", MATRIX)
def test_scalar_matrix(arrow_t, spark_t):
    assert arrow_type_to_spark(arrow_t) == spark_t
    # inverse holds for every canonical pair
    assert arrow_type_to_spark(spark_type_to_arrow(spark_t)) == spark_t


def test_widening_and_lossy_cases():
    # fixed-size binary collapses to plain binary (no fixed-width in Spark)
    assert arrow_type_to_spark(pa.binary(16)) == T.BinaryType()
    # time types -> long micros (documented gap; reference maps to Iceberg
    # time, Spark has no equivalent)
    assert arrow_type_to_spark(pa.time64("us")) == T.LongType()
    assert arrow_type_to_spark(pa.large_string()) == T.StringType()
    assert arrow_type_to_spark(pa.date64()) == T.DateType()


def test_nested_roundtrip():
    schema = pa.schema(
        [
            pa.field("tags", pa.list_(pa.field("element", pa.string(), True))),
            pa.field(
                "point",
                pa.struct(
                    [pa.field("x", pa.float64(), False), pa.field("y", pa.float64())]
                ),
            ),
            pa.field("attrs", pa.map_(pa.string(), pa.field("value", pa.int64()))),
            pa.field(
                "matrix",
                pa.list_(pa.field("element", pa.list_(pa.field("element", pa.float32())))),
            ),
        ]
    )
    spark_schema = arrow_schema_to_spark(schema)
    assert spark_schema["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert spark_schema["point"].dataType == T.StructType(
        [
            T.StructField("x", T.DoubleType(), False),
            T.StructField("y", T.DoubleType(), True),
        ]
    )
    assert spark_schema["attrs"].dataType == T.MapType(
        T.StringType(), T.LongType(), True
    )
    back = spark_schema_to_arrow(spark_schema)
    assert arrow_schema_to_spark(back) == spark_schema


def test_unsupported_fails_fast():
    with pytest.raises(ValueError, match="unsupported arrow type"):
        arrow_type_to_spark(pa.duration("s"))
    with pytest.raises(ValueError, match="unsupported spark type"):
        spark_type_to_arrow(T.CalendarIntervalType())


def test_roundtrip_through_spark_dataframe(spark):
    """End-to-end: arrow table -> spark df (converted schema) -> arrow."""
    table = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "v": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())),
            "s": pa.array([{"a": 1}, {"a": 2}], pa.struct([pa.field("a", pa.int64())])),
        }
    )
    spark_schema = arrow_schema_to_spark(table.schema)
    df = spark.createDataFrame(table.to_pylist(), spark_schema)
    assert df.count() == 2
    assert df.schema == spark_schema
    assert "id: bigint" in schema_to_string(spark_schema)

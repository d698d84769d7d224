"""PyArrow <-> Spark StructType schema conversion (SURVEY §1.4).

The reference's whole supported type surface is defined by its two
converters (``/root/reference/pkg/utils/schema_conversion.go:67-147`` and
``:183-254``, Arrow<->Iceberg). In the Spark-native engine the storage
side is handled by parquet/lakehouse, so the converters live at the
Arrow <-> Spark boundary (pandas-UDF interchange, Arrow IPC source/sink,
test fixtures), with the same matrix semantics:

- narrow ints map through their Spark equivalents (Byte/Short/Integer);
- fixed-size binary collapses to binary (no fixed-width type in Spark);
- time32/time64 have no Spark type -> micros-as-long (documented gap,
  mirrors the reference's lossy time handling);
- timestamps: tz-less -> TimestampNTZType, tz-aware -> TimestampType
  (reference: timestamp vs timestamptz, ``schema_conversion.go:90-95``);
- decimal128(p,s) -> DecimalType(p,s); list/struct/map recurse;
- anything else raises ValueError, matching the reference's fail-fast
  "unsupported arrow type" (``schema_conversion.go:144-146``).
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import types as T


def arrow_field_to_spark(field: pa.Field) -> T.StructField:
    return T.StructField(field.name, arrow_type_to_spark(field.type), field.nullable)


def arrow_type_to_spark(t: pa.DataType) -> T.DataType:
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_int8(t):
        return T.ByteType()
    if pa.types.is_int16(t):
        return T.ShortType()
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if pa.types.is_fixed_size_binary(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_timestamp(t):
        return T.TimestampType() if t.tz is not None else T.TimestampNTZType()
    if pa.types.is_time(t):
        return T.LongType()  # micros-as-long: Spark has no TIME type
    if pa.types.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.ArrayType(
            arrow_type_to_spark(t.value_type), t.value_field.nullable
        )
    if pa.types.is_struct(t):
        return T.StructType([arrow_field_to_spark(t.field(i)) for i in range(t.num_fields)])
    if pa.types.is_map(t):
        return T.MapType(
            arrow_type_to_spark(t.key_type),
            arrow_type_to_spark(t.item_type),
            t.item_field.nullable,
        )
    raise ValueError(f"unsupported arrow type: {t}")


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    return T.StructType([arrow_field_to_spark(f) for f in schema])


def spark_type_to_arrow(t: T.DataType) -> pa.DataType:
    if isinstance(t, T.BooleanType):
        return pa.bool_()
    if isinstance(t, T.ByteType):
        return pa.int8()
    if isinstance(t, T.ShortType):
        return pa.int16()
    if isinstance(t, T.IntegerType):
        return pa.int32()
    if isinstance(t, T.LongType):
        return pa.int64()
    if isinstance(t, T.FloatType):
        return pa.float32()
    if isinstance(t, T.DoubleType):
        return pa.float64()
    if isinstance(t, T.StringType):
        return pa.string()
    if isinstance(t, T.BinaryType):
        return pa.binary()
    if isinstance(t, T.DateType):
        return pa.date32()
    if isinstance(t, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(t, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(t, T.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    if isinstance(t, T.ArrayType):
        return pa.list_(
            pa.field("element", spark_type_to_arrow(t.elementType), t.containsNull)
        )
    if isinstance(t, T.StructType):
        return pa.struct(
            [
                pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable)
                for f in t.fields
            ]
        )
    if isinstance(t, T.MapType):
        return pa.map_(
            spark_type_to_arrow(t.keyType),
            pa.field("value", spark_type_to_arrow(t.valueType), t.valueContainsNull),
        )
    raise ValueError(f"unsupported spark type: {t}")


def spark_schema_to_arrow(schema: T.StructType) -> pa.Schema:
    return pa.schema(
        [
            pa.field(f.name, spark_type_to_arrow(f.dataType), f.nullable)
            for f in schema.fields
        ]
    )


def schema_to_string(schema: T.StructType) -> str:
    """Debug pretty-printer (reference ``SchemaToString``,
    ``schema_conversion.go:37-49``)."""
    lines = [
        f"  {f.name}: {f.dataType.simpleString()}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    ]
    return "schema:\n" + "\n".join(lines)


# ---------------------------------------------------------------------------
# Iceberg REST schema JSON (the wire format of the REST catalog spec)
# ---------------------------------------------------------------------------

def spark_schema_to_iceberg(schema: T.StructType) -> dict:
    """Spark StructType -> Iceberg schema JSON (apache/iceberg OpenAPI
    spec; the shape ``iceberg-go`` sends in createTable —
    ``/root/reference/pkg/ingestor/iceberg_committer.go:104-118``).
    Field IDs are assigned depth-first starting at 1, as the spec
    requires unique IDs across the whole schema tree."""
    counter = {"id": 0}

    def next_id() -> int:
        counter["id"] += 1
        return counter["id"]

    def conv(dt: T.DataType) -> object:
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision}, {dt.scale})"
        if isinstance(dt, T.DateType):
            return "date"
        if isinstance(dt, T.TimestampNTZType):
            return "timestamp"
        if isinstance(dt, T.TimestampType):
            return "timestamptz"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "binary"
        if isinstance(dt, T.ArrayType):
            return {
                "type": "list",
                "element-id": next_id(),
                "element": conv(dt.elementType),
                "element-required": not dt.containsNull,
            }
        if isinstance(dt, T.MapType):
            return {
                "type": "map",
                "key-id": next_id(),
                "key": conv(dt.keyType),
                "value-id": next_id(),
                "value": conv(dt.valueType),
                "value-required": not dt.valueContainsNull,
            }
        if isinstance(dt, T.StructType):
            return {
                "type": "struct",
                "fields": [
                    {
                        "id": next_id(),
                        "name": f.name,
                        "required": not f.nullable,
                        "type": conv(f.dataType),
                    }
                    for f in dt.fields
                ],
            }
        raise TypeError(f"no Iceberg mapping for Spark type {dt}")

    out = conv(schema)
    assert isinstance(out, dict)
    return {"schema-id": 0, **out}


def iceberg_to_spark_schema(schema: dict) -> T.StructType:
    """Iceberg schema JSON -> Spark StructType (inverse of
    ``spark_schema_to_iceberg``; field IDs are dropped — Spark tracks
    columns by name)."""
    prims = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
        "string": T.StringType(),
        "uuid": T.StringType(),
        "binary": T.BinaryType(),
    }

    def conv(t: object) -> T.DataType:
        if isinstance(t, str):
            if t in prims:
                return prims[t]
            if t.startswith("decimal"):
                p, s = t[t.index("(") + 1 : t.index(")")].split(",")
                return T.DecimalType(int(p), int(s))
            if t.startswith("fixed"):
                return T.BinaryType()
            raise TypeError(f"no Spark mapping for Iceberg type {t!r}")
        assert isinstance(t, dict)
        kind = t["type"]
        if kind == "list":
            return T.ArrayType(conv(t["element"]), not t.get("element-required", False))
        if kind == "map":
            return T.MapType(
                conv(t["key"]), conv(t["value"]), not t.get("value-required", False)
            )
        if kind == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"], conv(f["type"]), not f.get("required", False)
                    )
                    for f in t["fields"]
                ]
            )
        raise TypeError(f"no Spark mapping for Iceberg type {kind!r}")

    out = conv({k: v for k, v in schema.items() if k != "schema-id"})
    assert isinstance(out, T.StructType)
    return out

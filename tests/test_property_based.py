"""Property-based tests (hypothesis): invariants that hold for ALL inputs,
not just the fixtures — schema-conversion round-trips over random nested
types, and order-independence of the decimal-stable aggregation."""

from __future__ import annotations

from decimal import Decimal

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from crest_spark.functions.schema_convert import (
    arrow_schema_to_spark,
    arrow_type_to_spark,
    spark_schema_to_arrow,
)

_scalars = st.sampled_from(
    [
        pa.bool_(),
        pa.int8(),
        pa.int16(),
        pa.int32(),
        pa.int64(),
        pa.float32(),
        pa.float64(),
        pa.string(),
        pa.binary(),
        pa.date32(),
        pa.timestamp("us"),
        pa.timestamp("us", tz="UTC"),
        pa.decimal128(20, 4),
    ]
)


def _nested(children):
    return st.one_of(
        children.map(lambda t: pa.list_(pa.field("element", t, True))),
        st.lists(children, min_size=1, max_size=3).map(
            lambda ts: pa.struct(
                [pa.field(f"f{i}", t, True) for i, t in enumerate(ts)]
            )
        ),
        children.map(lambda t: pa.map_(pa.string(), pa.field("value", t, True))),
    )


_types = st.recursive(_scalars, _nested, max_leaves=6)


@settings(max_examples=200, deadline=None)
@given(_types)
def test_arrow_spark_arrow_roundtrip_preserves_spark_type(arrow_t):
    """arrow -> spark -> arrow -> spark is a fixed point (the first hop
    may canonicalize — large_string -> string — but after that the
    mapping must be stable)."""
    spark_t = arrow_type_to_spark(arrow_t)
    schema = pa.schema([pa.field("c", arrow_t, True)])
    spark_schema = arrow_schema_to_spark(schema)
    back = spark_schema_to_arrow(spark_schema)
    assert arrow_schema_to_spark(back) == spark_schema
    assert spark_schema["c"].dataType == spark_t


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    ),
    st.randoms(),
)
def test_decimal_sum_is_order_independent(values, rng):
    """The stable-aggregation invariant: decimal(30,8) sums are identical
    for ANY permutation of the inputs (this is what makes the Spark
    result match the DuckDB oracle regardless of partitioning)."""

    def decimal_sum(vals):
        return sum(
            (Decimal(repr(v)).quantize(Decimal("1.00000000")) for v in vals),
            Decimal(0),
        )

    shuffled = list(values)
    rng.shuffle(shuffled)
    assert decimal_sum(values) == decimal_sum(shuffled)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(-1000, 1000),
    st.integers(0, 500),
    st.one_of(st.none(), st.integers(-1200, 1200)),
    st.one_of(st.none(), st.integers(-1200, 1200)),
    st.booleans(),
)
def test_stats_admit_never_prunes_an_intersecting_file(mn, width, lo, hi, has_stats):
    """File-skipping safety: a file whose [min, max] intersects the
    requested [lo, hi] must ALWAYS be admitted; pruning may only drop
    provably-disjoint files, and missing stats must admit."""
    from crest_spark.lakehouse.table import _stats_admit

    mx = mn + width
    fstats = {"c": [mn, mx]} if has_stats else {}
    admitted = _stats_admit(fstats, {"c": (lo, hi)})
    intersects = (lo is None or mx >= lo) and (hi is None or mn <= hi)
    if not has_stats:
        assert admitted
    elif intersects:
        assert admitted  # the one-sided safety property
    else:
        assert not admitted  # and pruning is exact for known stats


_spark_prims = st.sampled_from(
    [
        T.BooleanType(),
        T.IntegerType(),
        T.LongType(),
        T.FloatType(),
        T.DoubleType(),
        T.StringType(),
        T.BinaryType(),
        T.DateType(),
        T.TimestampType(),
        T.TimestampNTZType(),
        T.DecimalType(30, 8),
    ]
)
_spark_types = st.recursive(
    _spark_prims,
    lambda inner: st.one_of(
        st.builds(T.ArrayType, inner, st.booleans()),
        st.builds(T.MapType, _spark_prims, inner, st.booleans()),
    ),
    max_leaves=4,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_spark_types, min_size=1, max_size=4), st.data())
def test_iceberg_schema_json_roundtrip(types, data):
    """Spark -> Iceberg REST schema JSON -> Spark is the identity for the
    full supported type matrix, including nullability at every level."""
    from crest_spark.functions.schema_convert import (
        iceberg_to_spark_schema,
        spark_schema_to_iceberg,
    )

    schema = T.StructType(
        [
            T.StructField(f"c{i}", t, data.draw(st.booleans()))
            for i, t in enumerate(types)
        ]
    )
    assert iceberg_to_spark_schema(spark_schema_to_iceberg(schema)) == schema


# ---------------------------------------------------------------------------
# _stats_admit: pruning is a pure optimization (one-sided safety)
# ---------------------------------------------------------------------------

_stat_values = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
    st.booleans(),
)
_bounds = st.one_of(st.none(), _stat_values)


@given(
    mn=_stat_values,
    mx=_stat_values,
    lo=_bounds,
    hi=_bounds,
)
@settings(max_examples=300, deadline=None)
def test_stats_admit_never_raises_and_never_wrongly_prunes(mn, mx, lo, hi):
    """For ANY recorded [min,max] and ANY requested (lo,hi) — including
    type-mismatched combinations — _stats_admit must (a) never raise and
    (b) only exclude a file when the recorded range PROVABLY misses the
    request. Pruning errs open: a kept file costs a read, a wrongly
    dropped file is a wrong query result."""
    from crest_spark.lakehouse.table import _stats_admit

    if isinstance(mn, type(mx)) and not isinstance(mn, bool) or (
        isinstance(mn, (int, float)) and isinstance(mx, (int, float))
    ):
        lo_, hi_ = (mn, mx) if mn <= mx else (mx, mn)
    else:
        lo_, hi_ = mn, mn  # mixed-type stat: degenerate single-value range
    admitted = _stats_admit({"c": [lo_, hi_]}, {"c": (lo, hi)})
    # (b): if everything is comparable and the ranges intersect, the file
    # MUST be admitted (the one-sided contract)
    try:
        intersects = (lo is None or hi_ >= lo) and (hi is None or lo_ <= hi)
    except TypeError:
        return  # incomparable: (a) already proven by the call above
    if intersects:
        assert admitted


# --------------------------------------------------------------- avro_io
_avro_values = st.recursive(
    st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.booleans(),
        st.text(max_size=20),
        st.binary(max_size=20),
        st.floats(allow_nan=False, width=64),
    ),
    lambda children: st.lists(children, max_size=4),
    max_leaves=10,
)


def _schema_for(value):
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "long"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return "string"
    if isinstance(value, bytes):
        return "bytes"
    if isinstance(value, list):
        inner = _schema_for(value[0]) if value else "long"
        return {"type": "array", "items": inner}
    raise AssertionError(type(value))


@given(st.lists(_avro_values, min_size=0, max_size=8), st.sampled_from(["null", "deflate"]))
@settings(max_examples=60, deadline=None)
def test_avro_container_roundtrips_arbitrary_records(values, codec):
    """Write/read inverse property for the stdlib Avro implementation:
    any schema-consistent record batch survives the container format
    bit-exactly under both codecs (homogeneous lists only: Avro arrays
    are monomorphic)."""
    import tempfile

    from crest_spark.lakehouse import avro_io

    # make lists monomorphic at every depth (Avro arrays are single-typed):
    # keep only elements whose full inferred schema matches the head's
    def mono(v):
        if isinstance(v, list):
            if not v:
                return []
            kept = [mono(x) for x in v]
            head_schema = _schema_for(kept[0])
            return [x for x in kept if _schema_for(x) == head_schema]
        return v

    values = [mono(v) for v in values]
    schema = {
        "type": "record",
        "name": "prop",
        "fields": [
            {"name": f"f{i}", "type": _schema_for(v)}
            for i, v in enumerate(values)
        ],
    }
    record = {f"f{i}": v for i, v in enumerate(values)}
    with tempfile.TemporaryDirectory() as d:
        import os as _os

        p = _os.path.join(d, "prop.avro")
        avro_io.write_container(p, schema, [record], codec=codec)
        rschema, _, out = avro_io.read_container(p)
        assert rschema == schema
        assert out == [record]


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_avro_zigzag_varint_roundtrip(n):
    import io as _io

    from crest_spark.lakehouse.avro_io import _zigzag_decode, _zigzag_encode

    assert _zigzag_decode(_io.BytesIO(_zigzag_encode(n))) == n

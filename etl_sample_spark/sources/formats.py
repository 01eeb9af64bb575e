"""Tabular source formats beyond parquet/JSON: CSV with corrupt-record
quarantine, ORC, and schema-evolution reads.

[EXT] surface: the reference ingests only JSON blobs
(Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:769-805), but an
engine replacing it ingests whatever lands in the lake. Same principles
as the JSON reader (sources/documents.py::read_form): explicit schema,
PERMISSIVE mode, malformed rows quarantined — never silently dropped,
never inferred-schema surprises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_csv_quarantined(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Schema'd CSV scan returning ``(good, quarantine, raw)``: rows
    that fail the schema (wrong arity, uncastable values) surface in
    the quarantine frame with the raw line preserved — the CSV twin of
    the JSON corrupt-record path. PERMISSIVE + explicit schema keeps the
    scan a single pass (no inference job).

    ``raw`` is the CACHED underlying scan: Spark disallows queries that
    reference only the corrupt column of a raw CSV scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — which a pruned
    ``quarantine.count()`` becomes), and caching is the documented
    workaround. It is returned so the caller owns the lifecycle:
    ``raw.unpersist()`` after sinking both splits.
    """
    # A NEW StructType: StructType.add MUTATES the receiver in place, so
    # building on the caller's schema would append the corrupt column to
    # their object on every call (duplicate columns on reuse).
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
        .cache()
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull())
    return good, quarantine, df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (native Spark support, no extra packages): the other
    columnar lake format; same predicate-pushdown + column-pruning
    behavior as parquet, verified in tests/test_formats.py."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet_evolved(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under EVOLVING schemas (columns added over
    time) as one frame: ``mergeSchema`` unions the footers' schemas and
    fills missing columns with nulls — the append-only schema-evolution
    contract a long-lived lake table needs (no rewrite of old files)."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


class SchemaContractError(ValueError):
    """Raised when a frame violates its declared schema contract."""


def validate_schema_contract(df: DataFrame, contract: StructType) -> None:
    """Data-contract gate: the frame must carry EXACTLY the contract's
    columns with the contract's types (order-insensitive; nullability
    is advisory in Spark and ignored here). Raises
    :class:`SchemaContractError` naming every missing / unexpected /
    mistyped column at once — the precise diff an on-call engineer
    needs, not the first mismatch.

    Run it at pipeline boundaries (after ingest, before publish): at
    100 TB a schema drift caught at the boundary costs an error
    message; caught downstream it costs a backfill.
    """
    # Duplicate column names would collapse in the name-keyed dicts
    # below and let a non-conforming frame (e.g. a post-join frame with
    # two 'id' columns) slide through the exactness gate (r11 review).
    names = [f.name for f in df.schema.fields]
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        raise SchemaContractError(
            f"schema contract violated — duplicate column name(s): {dupes}"
        )

    def _denull(dt):
        """Canonicalize nullability RECURSIVELY: the docstring's
        'nullability is ignored' must hold for nested flags too
        (ArrayType.containsNull, MapType.valueContainsNull, struct
        field nullable) — a containsNull=false array produced by
        F.array over non-null inputs satisfies a containsNull=true
        contract (r11 review: plain DataType equality rejected it)."""
        from pyspark.sql.types import ArrayType, MapType, StructField
        from pyspark.sql.types import StructType as _ST

        if isinstance(dt, ArrayType):
            return ArrayType(_denull(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(_denull(dt.keyType), _denull(dt.valueType), True)
        if isinstance(dt, _ST):
            return _ST([StructField(f.name, _denull(f.dataType), True) for f in dt.fields])
        return dt

    actual = {f.name: _denull(f.dataType) for f in df.schema.fields}
    expected = {f.name: _denull(f.dataType) for f in contract.fields}
    missing = sorted(set(expected) - set(actual))
    unexpected = sorted(set(actual) - set(expected))
    mistyped = sorted(
        f"{name}: expected {expected[name].simpleString()}, got {actual[name].simpleString()}"
        for name in set(expected) & set(actual)
        if expected[name] != actual[name]
    )
    if missing or unexpected or mistyped:
        raise SchemaContractError(
            "schema contract violated — "
            f"missing: {missing or 'none'}; unexpected: {unexpected or 'none'}; "
            f"mistyped: {mistyped or 'none'}"
        )

"""Document sources and table sinks (SURVEY §2.1 S1-S7)."""

from etl_sample_spark.sources.documents import (
    ROUTE_PATTERNS,
    read_form,
    route_column,
    sf_id_column,
)
from etl_sample_spark.sources.sinks import (
    idempotent_append,
    stringify_complex_columns,
    write_jdbc_tables,
    write_parquet_tables,
)

__all__ = [
    "ROUTE_PATTERNS",
    "read_form",
    "route_column",
    "sf_id_column",
    "idempotent_append",
    "stringify_complex_columns",
    "write_jdbc_tables",
    "write_parquet_tables",
]

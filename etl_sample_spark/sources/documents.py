"""JSON document corpus reader (SURVEY §2.1 S1-S3, §2.2 R1-R2).

The reference lists blobs, downloads each to local disk, then dispatches
per-file by filename-suffix regex
(``Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:769-805``). Spark
reads object-store paths directly, so the whole loop collapses to one
(or four, one per form) schema'd multiLine JSON scans; per-file identity
survives as ``input_file_name()`` and the Salesforce-ID prefix is a
regex over it (the declarative form of ``str(json_file)[:-17]`` at :35
and ``[:-19]`` at :156).

Scale: a directory of millions of JSON documents becomes a partitioned
file scan — no driver-side listing loop, no local staging hop; schema
enforcement (PERMISSIVE) replaces per-document inference.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Route → filename regex, in the reference's dispatch order (:798-805).
ROUTE_PATTERNS = (
    ("bank_scrape", r"_bank_scrape\.json$"),
    ("credit_report", r"_credit_report\.json$"),
    ("action", r"_action\.json$"),
    ("combined", r"\.json$"),  # fallthrough: everything else → jsonpipe
)

_SF_ID_RE = r"([^/]+?)(?:_bank_scrape|_credit_report|_action)?\.json$"


def sf_id_column() -> Column:
    """Salesforce id = filename minus route suffix (R2, :35,:156).

    input_file_name() returns a percent-ENCODED URI, so a filename with
    a space would otherwise yield '001A%207xyz' (r11 review); try_url_-
    decode restores the raw name and null-falls-back to the undecoded
    match on a malformed %-sequence instead of throwing under ANSI.
    url_decode uses x-www-form-urlencoded semantics, so a literal '+'
    in a filename — which input_file_name leaves unencoded in the URI —
    would decode to a space and silently corrupt the id (r11 ADVICE);
    r12 pre-escapes '+' as '%2B' so the decode restores it verbatim
    while still decoding real %XX sequences in the same name."""
    raw = F.regexp_extract(F.input_file_name(), _SF_ID_RE, 1)
    esc = F.replace(raw, F.lit("+"), F.lit("%2B"))
    return F.coalesce(F.try_url_decode(esc), raw)


def route_column() -> Column:
    """4-way dispatch as a column (R1, :798-805) — useful when all forms
    land in one directory and downstream filters per route."""
    col = None
    fname = F.input_file_name()
    for name, pattern in ROUTE_PATTERNS[:-1]:
        branch = F.when(fname.rlike(pattern), F.lit(name))
        col = branch if col is None else col.when(fname.rlike(pattern), F.lit(name))
    return col.otherwise(F.lit(ROUTE_PATTERNS[-1][0])).alias("route")


# Scheme-qualified URI (s3a://, abfss://, hdfs://, gs://, file://...).
# Python's glob/os.path treat these as literal relative paths — probing
# them locally would silently report a NON-EMPTY remote directory as
# empty. S2 of the reference lists Azure blobs explicitly
# (Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py:769-793); Spark
# reads object stores directly, so the emptiness probe must go through
# the same Hadoop FileSystem the scan itself will use.
_URI_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def is_remote_uri(path: str) -> bool:
    """True for any scheme-qualified URI that must NOT be probed with
    local-filesystem calls (glob/os.path)."""
    return bool(_URI_SCHEME_RE.match(path))


def _matched_paths(spark: SparkSession, path: str | list[str]) -> list[str] | None:
    """Paths matched by ``path`` (literal, glob, or a list of either),
    empty list if none, ``None`` when the probe CANNOT run.

    Every path resolves through Hadoop's FileSystem when py4j is
    available — the identical resolution the parquet/JSON scan performs,
    so whatever connector serves the scan (s3a, abfss, gs, hdfs, file —
    and for SCHEMELESS paths, fs.defaultFS, which on a real cluster is
    usually NOT the driver's local disk) serves the probe, and Hadoop's
    glob grammar applies (including ``{a,b}`` braces, which Python's
    glob treats as literals — r11 review: both cases used to be probed
    locally and wrongly reported empty).

    Under Spark Connect the session has no ``_jvm``/``_jsc`` (py4j is
    classic-Spark only): remote URIs return ``None`` so the caller
    attempts the scan directly and maps Spark's own PATH_NOT_FOUND to
    the empty frame (r10 ADVICE); bare paths fall back to the local
    filesystem (best effort — correct wherever Connect's server shares
    the client's view of local files)."""
    if isinstance(path, (list, tuple)):
        out: list[str] = []
        for p in path:
            m = _matched_paths(spark, p)
            if m is None:
                return None
            out.extend(m)
        return out
    has_py4j = hasattr(spark, "_jvm") and spark._jvm is not None
    if has_py4j:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        # globStatus handles literal paths too (None/[] when nothing
        # matches; a plain existing path returns its own status).
        matched = fs.globStatus(hpath)
        return [] if matched is None else [str(m.getPath()) for m in matched]
    if is_remote_uri(path):
        return None
    import glob as _glob

    if any(ch in path for ch in "*?[{"):
        return _glob.glob(path)
    return [path] if os.path.exists(path) else []


def read_form(
    spark: SparkSession,
    path: str,
    schema: StructType,
    with_sf_id: bool = True,
    corrupt_col: str | None = None,
    allow_empty: bool = False,
) -> DataFrame:
    """Scan one document form: multiLine JSON (one document per file,
    S1) with an explicit schema — missing sections become nulls, which
    downstream specs treat as 'skip this table for this doc'.

    ``corrupt_col``: when set, malformed documents surface as rows whose
    ``corrupt_col`` holds the raw text (all other fields null) instead
    of being dropped — the principled version of the reference's bare
    ``try/except`` swallow (pipeline.py:12,29-30): failures are
    *quarantinable*, not silent. Split with ``quarantine_corrupt``.

    Shape invariant: the returned schema is a function of the FLAGS
    only, never of whether the path had data — an empty arrival dir
    yields a typed-empty frame with the same columns (incl.
    ``corrupt_col``/``source_file``/``sf_id`` when enabled) the
    non-empty scan would produce, so downstream unions and
    ``quarantine_corrupt`` never hit data-dependent UNRESOLVED_COLUMN.
    """

    def _typed_empty() -> DataFrame:
        from pyspark.sql.types import StringType

        s = StructType(schema.fields[:])
        if corrupt_col is not None:
            s = s.add(corrupt_col, StringType())
        empty = spark.createDataFrame([], s)
        if corrupt_col is not None:
            empty = empty.withColumn("source_file", F.lit(None).cast("string"))
        if with_sf_id:
            empty = empty.withColumn("sf_id", F.lit(None).cast("string"))
        return empty

    probe_unavailable = False
    if allow_empty:
        # A glob matching zero files raises PATH_NOT_FOUND; an arrival
        # directory that's currently empty is a normal state for the
        # ingest loop, not an error — return an empty typed DataFrame.
        # (None = the probe cannot run here, e.g. Spark Connect with a
        # remote URI: attempt the scan and catch PATH_NOT_FOUND below.)
        matched = _matched_paths(spark, path)
        probe_unavailable = matched is None
        if matched == []:
            return _typed_empty()
    reader = spark.read.option("multiLine", "true").option("mode", "PERMISSIVE")
    scan_schema = schema
    if corrupt_col is not None:
        from pyspark.sql.types import StringType

        scan_schema = StructType(schema.fields[:]).add(corrupt_col, StringType())
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    try:
        df = reader.schema(scan_schema).json(path)
        if probe_unavailable:
            # Classic Spark resolves the path inside .json() above, but
            # Spark Connect builds a lazy proto plan and raises nothing
            # until the first server round-trip — touching df.schema
            # forces an AnalyzePlan RPC NOW, so a missing path lands in
            # this except block instead of escaping to the caller's
            # first action.
            df.schema
    except Exception as ex:
        # allow_empty covers the probe-to-scan race too (a concurrent
        # archiver can delete the matched file before the reader
        # resolves it — r11 review), not just the no-probe Connect case.
        if allow_empty and "PATH_NOT_FOUND" in str(ex):
            return _typed_empty()
        raise
    if corrupt_col is not None:
        # Stamped at scan time: input_file_name() is only defined while
        # the file scan runs — evaluated later over a cached relation
        # (as quarantine_corrupt does) it returns ''.
        df = df.withColumn("source_file", F.input_file_name())
    if with_sf_id:
        df = df.withColumn("sf_id", sf_id_column())
    return df


def quarantine_corrupt(df: DataFrame, corrupt_col: str = "_corrupt_record") -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows lose the corrupt column; the
    quarantine keeps raw text + source file for replay after a fix.

    The parse result is cached first: Spark disallows queries that
    reference only the internal corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and both
    halves re-scan the corpus otherwise anyway.

    Cache lifecycle contract: the cache is keyed on the INPUT plan, so
    the caller unpersists by calling ``df.unpersist()`` on the frame it
    passed in, once both halves are consumed (pipeline.py does exactly
    this per form — without it the per-form corpora pin executor memory
    for the session lifetime)."""
    df = df.cache()
    corrupt = df.where(F.col(corrupt_col).isNotNull()).select(
        "source_file", F.col(corrupt_col).alias("raw")
    )
    clean = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col, "source_file")
    return clean, corrupt

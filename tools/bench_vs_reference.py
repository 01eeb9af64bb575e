"""Head-to-head throughput: the reference's single-thread pandas
normalization vs ``run_batch_pipeline`` on the SAME synthetic corpus.

The reference (``/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-
10-03-2019.py``) publishes no numbers ("benchmarks poorly"), so this
harness produces the comparison directly: N bank-scrape documents are
synthesized from the test-fixture shape, then

- reference leg: its ``bankpipe(json_file)`` is called per file, the
  way its driver loop does (:769-816). Its SQLAlchemy/pyodbc imports
  are satisfied with inert stubs and its ``to_sql`` calls fail fast
  into its own bare ``except`` (the sink is unreachable in BOTH legs —
  this measures parse + normalize, each engine's real CPU work);
- engine leg: ``run_batch_pipeline`` over the same directory with a
  parquet sink (so the engine leg DOES pay for durable output the
  reference leg skips).

Usage: python tools/bench_vs_reference.py [n_docs]
Prints one JSON line {"n_docs": N, "reference_sec": ..., "engine_sec":
..., "reference_docs_per_sec": ..., "engine_docs_per_sec": ...}.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import shutil
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REFERENCE = "/root/reference/Sample-Json-to-SQL-Full-Pipeline-EO-10-03-2019.py"


def _make_doc(i: int) -> dict:
    return {
        "name": f"Customer {i}",
        "complete_datetime": "2019-10-03 12:30:00",
        "contacts": [
            {"contact_type": "email", "value": f"c{i}@example.com"},
            {"contact_type": "phone", "value": f"555-{i % 10000:04d}"},
        ],
        "accounts": [
            {
                "account": f"{100000000 + i * 7 + a}",
                "balance": 1000.5 + i + a,
                "statistics": {
                    "mean_closing_balance": 900.0 + a,
                    "mean_closing_balance_30": 890.0 + a,
                },
                "transactions": [
                    {
                        "description": f"txn {t}",
                        "amount": (i + t) % 500 - 250,
                        "date": "2019-10-01",
                        "flags": ["posted"],
                    }
                    for t in range(4)
                ],
            }
            for a in range(2)
        ],
    }


def _load_reference_bankpipe():
    """Exec the reference module with its unavailable DB deps stubbed
    (inert create_engine; to_sql then fails into the reference's own
    bare except, same as its discontinued Azure endpoint would)."""
    sqlalchemy = types.ModuleType("sqlalchemy")
    sqlalchemy.create_engine = lambda *a, **k: object()
    sys.modules.setdefault("sqlalchemy", sqlalchemy)
    sys.modules.setdefault("pyodbc", types.ModuleType("pyodbc"))
    # the blob driver loop (:769-816) imports azure at module level; an
    # inert client keeps the import alive and its loop body a no-op
    azure = types.ModuleType("azure")
    azure_storage = types.ModuleType("azure.storage")
    azure_blob = types.ModuleType("azure.storage.blob")

    class _InertBlobService:
        def __init__(self, *a, **k): ...

        def list_blobs(self, *a, **k):
            return []

        def __getattr__(self, _name):
            return lambda *a, **k: None

    azure_blob.BlockBlobService = _InertBlobService
    azure.storage = azure_storage
    azure_storage.blob = azure_blob
    sys.modules.setdefault("azure", azure)
    sys.modules.setdefault("azure.storage", azure_storage)
    sys.modules.setdefault("azure.storage.blob", azure_blob)
    ns: dict = {}
    with open(REFERENCE) as f:
        code = f.read()
    # the module-level driver loop scans ./localpath once; give it an
    # empty one so importing is a no-op
    exec_dir = tempfile.mkdtemp(prefix="ref_exec_")
    os.makedirs(os.path.join(exec_dir, "localpath"))
    cwd = os.getcwd()
    os.chdir(exec_dir)
    try:
        exec(compile(code, REFERENCE, "exec"), ns)
    finally:
        os.chdir(cwd)
        shutil.rmtree(exec_dir, ignore_errors=True)
    return ns["bankpipe"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    root = tempfile.mkdtemp(prefix="bench_ref_")
    src = os.path.join(root, "in")
    os.makedirs(src)
    try:
        for i in range(n_docs):
            with open(os.path.join(src, f"ACCT{i:06d}_bank_scrape.json"), "w") as f:
                json.dump(_make_doc(i), f)

        bankpipe = _load_reference_bankpipe()
        files = sorted(os.path.join(src, p) for p in os.listdir(src))
        sink = io.StringIO()  # swallow the reference's per-table failure prints
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(sink):
            for path in files:
                bankpipe(path)
        ref_sec = time.perf_counter() - t0

        from etl_sample_spark import get_spark
        from etl_sample_spark.pipeline import run_batch_pipeline

        spark = get_spark("bench-vs-reference")
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1).count()  # JVM warm so the timing is the pipeline, not startup
        t0 = time.perf_counter()
        run_batch_pipeline(spark, src, parquet_out=os.path.join(root, "star"))
        eng_sec = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "n_docs": n_docs,
                    "reference_sec": round(ref_sec, 2),
                    "engine_sec": round(eng_sec, 2),
                    "reference_docs_per_sec": round(n_docs / ref_sec, 1),
                    "engine_docs_per_sec": round(n_docs / eng_sec, 1),
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

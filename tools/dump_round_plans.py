"""Dump .explain("formatted") for a set of registered queries into
plans/r<N>/<query>_<tag>.txt — the before/after evidence for an
optimization round.

Usage:
    python tools/dump_round_plans.py <round> <tag> [query ...]

With no query names, dumps the whole bench HEADLINE set. Plans are
captured at $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench tier, so
broadcast-threshold decisions match what the bench actually measures).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:  # r16 ADVICE: usage, not a bare IndexError
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from bench import HEADLINE
    from etl_sample_spark import get_spark
    from etl_sample_spark.plans import REGISTRY

    if not names:
        names = [n for n in HEADLINE if n != "streaming_ingest_available_now"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{rnd}",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ({tag}) ==\n\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Ad-hoc parity check for named queries: run Spark + DuckDB oracle at a
given sf dir and compare with the same canonicalization as the test suite.

Usage: python scripts/check_queries.py [--sf DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark_for_ebook_classification_spark.plans.registry import all_queries
from pyspark_for_ebook_classification_spark.session import get_spark
from pyspark_for_ebook_classification_spark.sources.io import TABLES
from tests.compare import assert_frames_match


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )
    qs = all_queries()
    failed = []
    for name in args.names:
        t0 = time.perf_counter()
        try:
            q = qs[name]
            spark_pdf = q.fn(spark, args.sf).toPandas()
            if q.oracle is None:
                print(f"PASS(rows-only) {name}: {len(spark_pdf)} rows")
                continue
            oracle_pdf = con.sql(q.oracle).df()
            assert_frames_match(spark_pdf, oracle_pdf, name)
            print(
                f"PASS {name}: {len(spark_pdf)} rows"
                f" ({time.perf_counter() - t0:.1f}s)"
            )
        except Exception as e:  # noqa: BLE001 - report and continue
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

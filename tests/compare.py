"""Cross-engine result comparison mirroring the driver's t2 gate:
row-count + schema (column names) + order-insensitive value equality,
with columns sorted by name. We compare canonicalized values EXACTLY
(floats included) — strictly harsher than any hash canonicalization the
driver might apply, so passing here implies passing there.
"""

from __future__ import annotations

import datetime
import math

import pandas as pd


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact: repr round-trips doubles
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (int,)):
        return str(int(v))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return rows


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = ""):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a, b = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(
            f"{name}: value mismatch; first differing sorted rows "
            f"(spark, oracle): {diffs}; cols={sorted(spark_pdf.columns)}"
        )

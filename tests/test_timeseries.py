"""window_interpolate_linear semantics and plan shape."""

from __future__ import annotations

from pyspark_for_ebook_classification_spark.plans.explain import audit
from pyspark_for_ebook_classification_spark.plans.registry import all_queries


def test_interpolation_is_between_neighbors(spark, sf_dir):
    """Every 'interp' cell must lie within [min, max] of its user's
    nearest observed values on either side; 'locf'/'nocb' cells must
    equal an observed value; the grid is dense (same day count per
    user)."""
    rows = sorted(
        (
            (r["user_id"], r["day"], r["value_filled"], r["src"])
            for r in all_queries()["window_interpolate_linear"]
            .fn(spark, sf_dir)
            .collect()
        ),
    )
    by_user: dict = {}
    for u, d, v, s in rows:
        by_user.setdefault(u, []).append((d, v, s))
    n_days = {len(series) for series in by_user.values()}
    assert len(n_days) == 1, f"grid not dense: {n_days}"

    for u, series in by_user.items():
        obs_vals = [v for _, v, s in series if s == "obs"]
        for i, (d, v, s) in enumerate(series):
            if s == "interp":
                prev_obs = next(
                    (pv for _, pv, ps in reversed(series[:i]) if ps == "obs"), None
                )
                next_obs = next(
                    (nv for _, nv, ns in series[i + 1 :] if ns == "obs"), None
                )
                assert prev_obs is not None and next_obs is not None, (u, d, s)
                lo, hi = sorted((prev_obs, next_obs))
                assert lo - 1e-6 <= v <= hi + 1e-6, (u, d, v, lo, hi)
            elif s in ("locf", "nocb"):
                assert any(abs(v - ov) < 1e-6 for ov in obs_vals), (u, d, v)


def test_interpolation_single_window_pass(spark, sf_dir):
    rep = audit(all_queries()["window_interpolate_linear"].fn(spark, sf_dir))
    # the 4 ignore-nulls context columns share one (user_id, day)
    # partitioning: at most the grid-join exchanges plus ONE window
    # exchange may appear, and never a per-window one each
    assert rep["plan"].count("Window") <= 2, rep["plan"]
    assert rep["python_workers"] == 0, rep["plan"]
    assert rep["cartesian"] == 0, rep["plan"]

"""Coverage-map integrity: every SURVEY §2 row id must resolve to at
least one declared query via the registry's survey_ref tags (r10 verdict
task 3 — six rows silently resolved to zero because of tag typos:
graphs tagged L2 instead of L9, the cogrouped merge-asof UF2 instead of
UF7, the stream-stream twin ST7 instead of ST8). The two rows the
survey declares behavioral-by-design (S6 streaming runners, ST4
watermark semantics) are exempt and pinned as the ONLY exemptions."""

from __future__ import annotations

from pyspark_for_ebook_classification_spark.plans.registry import all_queries

#: SURVEY §2's 80 row ids, transcribed from the operator inventory.
SECTION2_ROWS = (
    [f"S{i}" for i in range(1, 7)]
    + [f"P{i}" for i in range(1, 6)]
    + [f"J{i}" for i in range(1, 9)]
    + [f"A{i}" for i in range(1, 10)]
    + [f"W{i}" for i in range(1, 5)]
    + [f"O{i}" for i in range(1, 4)]
    + [f"U{i}" for i in range(1, 4)]
    + [f"F{i}" for i in range(1, 9)]
    + [f"L{i}" for i in range(1, 10)]
    + [f"ST{i}" for i in range(1, 8)]
    + [f"UF{i}" for i in range(1, 8)]
    + [f"M{i}" for i in range(1, 12)]
)

#: rows whose §2 line itself declares behavioral (runtime-semantics)
#: coverage via the streaming runner tests instead of a declared query.
#: r13 shrank this set: ST4 now has a declared oracle-checked query
#: (stream_watermark_close_twin) proven row-identical to a real
#: maxFilesPerTrigger=1 streaming run — only S6 (source/sink runner
#: plumbing) remains inherently behavioral.
BEHAVIORAL_ROWS = {"S6"}


def _tagged() -> dict[str, list[str]]:
    cov: dict[str, list[str]] = {}
    for name, q in all_queries().items():
        for tag in (q.survey_ref or "").split(","):
            tag = tag.strip()
            if tag:
                cov.setdefault(tag, []).append(name)
    return cov


def test_every_section2_row_resolves_to_a_query():
    cov = _tagged()
    missing = [
        r for r in SECTION2_ROWS if r not in cov and r not in BEHAVIORAL_ROWS
    ]
    assert not missing, (
        f"SURVEY §2 rows with ZERO covering declared queries: {missing} — "
        "fix the survey_ref tags (the r10 drift) or add a query"
    )


def test_behavioral_exemptions_stay_uncovered_and_documented():
    """If someone later declares a query for S6/ST4, the exemption must
    shrink — an exemption covering a row that HAS queries hides drift."""
    cov = _tagged()
    stale = [r for r in BEHAVIORAL_ROWS if r in cov]
    assert not stale, (
        f"behavioral-exempt rows now have declared queries: {stale} — "
        "remove them from BEHAVIORAL_ROWS"
    )


def test_row_counts_match_verdict_scale():
    assert len(SECTION2_ROWS) == 80, len(SECTION2_ROWS)

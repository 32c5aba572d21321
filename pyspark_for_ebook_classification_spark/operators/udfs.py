"""UDF / UDAF / UDTF surface (SURVEY.md §2.11: UF1–UF6).

Policy: the engine's hot paths never use Python — everything in
operators/*.py is built-in Catalyst expressions. This module exists to
prove the full UDF surface WORKS and is wired correctly (Arrow batching,
grouped-map schemas, UDTF lateral joins), using semantics simple enough
that a SQL oracle can still check the values:

  * outputs are integer/exact arithmetic (rank, counts, integer sums) or
    reuse the engine's deterministic float patterns — never pandas
    mean/std, whose accumulation order differs from SQL engines;
  * every kernel is a CLOSURE so cloudpickle ships it by value and Python
    workers don't need this package on sys.path.

At 100 TB: pandas UDFs move data JVM→Arrow→Python and back; each query
notes the batch-shape consequence. Row-at-a-time F.udf (UF6) appears once,
deliberately, on a 25-row dim — the anti-pattern kept out of hot paths.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load


@query(
    "udf_pandas_scalar_tier",
    survey_ref="UF1",
    oracle="""
        SELECT o_orderkey,
               CAST(floor(o_totalprice / 25000.0) * 5 + length(o_orderpriority) AS BIGINT)
                   AS tier_code
        FROM orders
        WHERE o_orderkey % 100 = 0
    """,
)
def udf_pandas_scalar_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF1: vectorized scalar pandas UDF (Series → Series over Arrow
    batches). Exact arithmetic (floor to integers), so the Python result
    is bit-equal to the SQL twin."""

    @F.pandas_udf(T.LongType())
    def tier_code(price: pd.Series, priority: pd.Series) -> pd.Series:
        import numpy as np

        return (np.floor(price / 25000.0) * 5 + priority.str.len()).astype("int64")

    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", tier_code("o_totalprice", "o_orderpriority").alias("tier_code")
    )


@query(
    "udf_grouped_map_rank",
    survey_ref="UF2",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
               ) AS BIGINT) AS price_rank,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS group_size
        FROM orders
        WHERE o_custkey % 20 = 0
    """,
)
def udf_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF2: grouped-map applyInPandas — whole group as one pandas frame.
    Ranks within customer (integer outputs; total tie-break). At scale the
    group is the memory unit: this pattern requires every single group to
    fit in one Python worker's memory — use windows instead when it can't."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        pdf["price_rank"] = range(1, len(pdf) + 1)
        pdf["group_size"] = len(pdf)
        return pdf[["o_custkey", "o_orderkey", "price_rank", "group_size"]]

    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    return o.groupBy("o_custkey").applyInPandas(
        rank_group,
        schema="o_custkey long, o_orderkey long, price_rank long, group_size long",
    )


@query(
    "udf_grouped_agg_span",
    survey_ref="UF3",
    oracle="""
        SELECT l_returnflag,
               CAST(MAX(l_orderkey) - MIN(l_orderkey) AS BIGINT) AS key_span,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supp_breadth
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def udf_grouped_agg_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF3: grouped-aggregate pandas UDAFs (Series → scalar), integer
    semantics. Partial aggregation does NOT apply to pandas UDAFs — the
    whole group's column ships to Python, another reason built-ins win at
    scale."""

    @F.pandas_udf(T.LongType())
    def key_span(keys: pd.Series) -> int:
        return int(keys.max() - keys.min())

    @F.pandas_udf(T.LongType())
    def breadth(vals: pd.Series) -> int:
        return int(vals.nunique())

    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        key_span("l_orderkey").alias("key_span"),
        breadth("l_suppkey").alias("supp_breadth"),
    )


@query(
    "udf_iterator_partition_stats",
    survey_ref="UF4",
    oracle="""
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
)
def udf_iterator_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF4: iterator-of-batches mapInPandas with per-partition partial
    aggregation in Python, finalized by a tiny JVM-side groupBy — the
    shape used when an expensive per-partition init (model load, codec)
    must amortize across batches."""

    def partial_counts(batches):
        acc: dict = {}
        for pdf in batches:
            for lang, grp in pdf.groupby("lang"):
                n, chars = acc.get(lang, (0, 0))
                acc[lang] = (n + len(grp), chars + int(grp["n_chars"].sum()))
        yield pd.DataFrame(
            {
                "lang": list(acc),
                "n_docs": [v[0] for v in acc.values()],
                "total_chars": [v[1] for v in acc.values()],
            }
        )

    d = load(spark, sf_dir, "documents").select("lang", "n_chars")
    partials = d.mapInPandas(
        partial_counts, schema="lang string, n_docs long, total_chars long"
    )
    return partials.groupBy("lang").agg(
        F.sum("n_docs").alias("n_docs"), F.sum("total_chars").alias("total_chars")
    )


@query(
    "udtf_chunk_documents",
    survey_ref="UF5,L4",
    oracle="""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents WHERE doc_id % 50 = 0
        )
        SELECT doc_id,
               CAST(u.i - 1 AS INT) AS chunk_no,
               array_to_string(tokens[(u.i - 1) * 20 + 1 : u.i * 20], ' ') AS chunk_text,
               CAST(least(20, length(tokens) - (u.i - 1) * 20) AS INT) AS chunk_len
        FROM toks,
             LATERAL (SELECT unnest(range(1,
                 CAST(ceil(length(tokens) / 20.0) AS BIGINT) + 1)) AS i) u
        WHERE (u.i - 1) * 20 < length(tokens)
    """,
)
def udtf_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF5: Python UDTF — one doc row in, N chunk rows out (the LLM
    context-window chunker). 20-token chunks; lateral join via the UDTF
    table function."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_no int, chunk_text string, chunk_len int")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            tokens = [t for t in text.split(" ") if t]
            size = 20
            for i in range(0, len(tokens), size):
                chunk = tokens[i : i + size]
                yield doc_id, i // size, " ".join(chunk), len(chunk)

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    spark.udtf.register("chunk_docs", Chunker)
    d.createOrReplaceTempView("docs_to_chunk")
    return spark.sql(
        "SELECT c.doc_id, c.chunk_no, c.chunk_text, c.chunk_len "
        "FROM docs_to_chunk, LATERAL chunk_docs(doc_id, text) c"
    )


@query(
    "udf_plain_python_rowwise",
    survey_ref="UF6",
    oracle="""
        SELECT n_name, CAST(length(n_name) % 7 AS INT) AS name_bucket
        FROM nation
    """,
)
def udf_plain_python_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF6: the row-at-a-time Python UDF — exists for surface parity,
    demonstrated on a 25-row dim ONLY. Serde per row, no vectorization,
    breaks pushdown: never in a fact-table path."""

    @F.udf(T.IntegerType())
    def name_bucket(name: str) -> int:
        return len(name) % 7

    return load(spark, sf_dir, "nation").select(
        "n_name", name_bucket("n_name").alias("name_bucket")
    )


@query(
    "udf_arrow_map_batches",
    survey_ref="UF4",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_quantity * (1.0 - l_discount) AS eff_qty
        FROM lineitem
        WHERE l_orderkey % 500 = 0
    """,
)
def udf_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UF4 at the Arrow layer: ``mapInArrow`` hands the Python worker raw
    pyarrow RecordBatches — no pandas conversion at all, the cheapest
    possible Python boundary (columnar in, columnar out, zero-copy where
    types allow). The arithmetic runs in Arrow compute kernels (C++), so
    results are IEEE-identical to the JVM/DuckDB expressions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def eff_qty(batches):
        for b in batches:
            q = pc.multiply(
                b.column("l_quantity"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), q],
                names=["l_orderkey", "l_linenumber", "eff_qty"],
            )

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 500 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )
    return li.mapInArrow(
        eff_qty, schema="l_orderkey long, l_linenumber int, eff_qty double"
    )


@query(
    "udf_cogrouped_merge_asof",
    survey_ref="UF7,J7",
    doc="Cogrouped applyInPandas: per-user pandas merge_asof (view ← signup).",
    oracle="""
        WITH views AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events WHERE event_type = 'view'
        ),
        signups AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   max(event_id) AS signup_event_id
            FROM events WHERE event_type = 'signup'
            GROUP BY user_id, CAST(ts AS TIMESTAMP)
        )
        SELECT v.event_id, v.user_id, v.ts, s.signup_event_id
        FROM views v
        ASOF JOIN signups s
          ON v.user_id = s.user_id AND v.ts >= s.ts
    """,
)
def udf_cogrouped_merge_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUPED pandas surface — ``groupBy(k).cogroup(other.groupBy(k))
    .applyInPandas``: both sides shuffle once on user_id, then each key's
    two pandas frames arrive together in one Python call, where
    ``pd.merge_asof`` implements the backward as-of match natively. This
    is the escape hatch for per-key logic needing BOTH sides at once
    (as-of, interval alignment, per-entity reconciliation) when no
    relational rewrite fits.

    Semantics pinned to DuckDB ASOF (inner, latest signup.ts <= view.ts;
    signups pre-deduped per (user, ts) so ties are impossible) — the same
    contract as the relational as-of emulation in joins.py, making the two
    implementations mutually checking. Scale: one co-partitioned shuffle
    per side, Arrow-batched transfer, per-key memory bounded by a user's
    events."""
    import pandas as pd

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if not len(left):
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "signup_event_id"]
            )
        left = left.sort_values("ts", kind="mergesort")
        if not len(right):
            out = left.copy()
            out["signup_event_id"] = pd.array([None] * len(out), dtype="Int64")
        else:
            out = pd.merge_asof(
                left,
                right.sort_values("ts", kind="mergesort")[
                    ["ts", "signup_event_id"]
                ],
                on="ts",
                direction="backward",
                allow_exact_matches=True,
            )
        return out[["event_id", "user_id", "ts", "signup_event_id"]]

    matched = (
        views.groupBy("user_id")
        .cogroup(signups.groupBy("user_id"))
        .applyInPandas(
            lambda left, right: merge(left, right),
            "event_id bigint, user_id bigint, ts timestamp, signup_event_id bigint",
        )
    )
    # ASOF is an INNER join: drop views with no signup at-or-before.
    return matched.filter(F.col("signup_event_id").isNotNull())


@query(
    "udtf_polymorphic_first_tokens",
    survey_ref="UF5,F4",
    doc="Polymorphic UDTF: output schema derived by analyze() from a constant arg.",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents WHERE doc_id % 25 = 0
        )
        SELECT doc_id,
               tokens[1] AS tok_0,
               tokens[2] AS tok_1,
               tokens[3] AS tok_2
        FROM toks
    """,
)
def udtf_polymorphic_first_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 POLYMORPHIC UDTF — the table function decides its own
    output schema at PLAN time via the ``analyze()`` static method: the
    constant width argument (here 3) becomes tok_0..tok_{n-1} columns.
    This is the API for generic data-prep table functions (wide feature
    expanders, configurable chunkers) where a fixed returnType can't
    express the contract. Short docs pad with NULLs; DuckDB's
    out-of-range list index yields the same NULLs."""
    from pyspark.sql.functions import lit, udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument):
            width = n.value
            return AnalyzeResult(
                schema=T.StructType(
                    [T.StructField(f"tok_{i}", T.StringType()) for i in range(width)]
                )
            )

        def eval(self, text: str, n: int):
            toks = [t for t in text.split(" ") if t]
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    first_tokens = udtf(FirstTokens)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return d.lateralJoin(
        first_tokens(F.col("text").outer(), lit(3))
    ).select("doc_id", "tok_0", "tok_1", "tok_2")


ARROW_GROUP_SCHEMA = "lang string, n_docs bigint, total_chars bigint, max_doc long"


def _make_arrow_group_kernel():
    """Grouped-map kernel in RAW Arrow (no pandas materialization): one
    pa.Table per language in, one summary row out. Closure so cloudpickle
    ships it by value (workers never import this package)."""

    def summarize(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [pc.sum(table.column("n_chars")).as_py()],
                "max_doc": [pc.max(table.column("doc_id")).as_py()],
            }
        )

    return summarize


@query(
    "udf_arrow_grouped_summary",
    survey_ref="UF3,UF4",
    doc="groupBy().applyInArrow: grouped-map directly on Arrow tables, no pandas.",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc
        FROM documents
        GROUP BY lang
    """,
)
def udf_arrow_grouped_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-4 ``groupBy(...).applyInArrow`` surface: each language's
    rows arrive as ONE pyarrow.Table (zero pandas conversion — columnar
    end to end), summarized with Arrow compute kernels. The relational
    twin is a plain GROUP BY, which is what you'd write when the logic
    fits SQL; applyInArrow is the escape hatch for per-group columnar
    logic that doesn't, at the lowest serialization cost the Python
    boundary allows. Grouping shuffles once on lang; per-group memory is
    the group's columnar width, not a pandas copy."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInArrow(
        _make_arrow_group_kernel(), schema=ARROW_GROUP_SCHEMA
    )


@query(
    "udtf_table_arg_longest_doc",
    survey_ref="UF5,W4",
    doc="SQL TABLE(...) PARTITION BY argument into a stateful per-partition UDTF.",
    oracle="""
        SELECT lang, doc_id AS longest_doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang ORDER BY n_chars DESC, doc_id
        ) = 1
    """,
)
def udtf_table_arg_longest_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 TABLE-argument UDTF: the SQL text passes a whole relation
    into the Python UDTF with `TABLE(docs) PARTITION BY lang`, so the
    engine routes each language's rows through one stateful eval/terminate
    cycle — per-partition Python logic addressable FROM SQL. The UDTF
    keeps only O(1) state (the current argmax), the scale contract for
    arbitrary-size partitions; the oracle is the equivalent window-rank."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, longest_doc_id long, n_chars bigint")
    class LongestDoc:
        def __init__(self):
            self.best = None  # (neg n_chars ordering via compare)

        def eval(self, row):
            key = (-row["n_chars"], row["doc_id"])
            if self.best is None or key < self.best:
                self.best = key
                self.row = (row["lang"], row["doc_id"], row["n_chars"])

        def terminate(self):
            if self.best is not None:
                yield self.row

    spark.udtf.register("longest_doc_udtf", LongestDoc)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT * FROM longest_doc_udtf(TABLE(docs_for_udtf) PARTITION BY lang)"
    )

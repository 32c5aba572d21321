"""Deduplication operators (SURVEY.md §2.9: L1, L2 — north-star LLM-data ops).

Four dedup families over the ``documents`` corpus:

  * exact        — content hash (sha256) groupBy. One shuffle keyed by the
                   hash; survivors = min(doc_id).
  * MinHash LSH  — deterministic MinHash signatures built from
                   ``md5(seed || ':' || token)`` (portable across engines,
                   unlike MLlib's seeded MinHashLSH or xxhash64), banded
                   into buckets; candidate pairs only join within a bucket
                   — O(candidates), never the O(n²) cross join.
  * SimHash      — 32-bit fingerprint: per-bit majority vote over token
                   md5 nibbles; identical fingerprints = near-dup group.
  * n-gram Jaccard — word-trigram Jaccard over length-blocked pairs.

Scale stance: every candidate-pair generator is blocked (LSH band / length
bucket) so pair counts grow ~linearly with corpus size; the exact Jaccard
verification joins back to token arrays only for candidates. At 100 TB the
band join is a standard shuffle join on (band_id, band_hash), and skewed
buckets (boilerplate docs) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load

# ---------------------------------------------------------------- exact L1


@query(
    "dedup_exact_sha",
    survey_ref="L1,F7,P5",
    oracle="""
        SELECT
            sha256(text) AS content_hash,
            CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
            COUNT(*) AS n_copies
        FROM documents
        GROUP BY sha256(text)
    """,
)
def dedup_exact_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: byte-identical docs collapse onto their content hash;
    keep-first = min(doc_id). The shuffle key is the 64-char hash, not the
    document text — at 100 TB the heavy text column never crosses the wire."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.sha2(F.col("text"), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ------------------------------------------------------------ MinHash L2

N_HASHES = 12
BAND_ROWS = 3  # 4 bands × 3 rows: catches jaccard ≳ 0.5 pairs w.h.p.
N_BANDS = N_HASHES // BAND_ROWS
JACCARD_THRESHOLD = 0.3


def _tokens_expr():
    """Distinct non-empty tokens of a document (set semantics for Jaccard)."""
    return F.array_distinct(F.filter(F.split("text", " "), lambda t: t != ""))


def _minhash_signature(df: DataFrame) -> DataFrame:
    """doc_id → one min-md5 per seed. Single explode + single groupBy;
    the 12 mins are computed side by side in one partial aggregation."""
    tok = df.select("doc_id", F.explode(_tokens_expr()).alias("token"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("token")))).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def _bands(sig: DataFrame) -> DataFrame:
    """Signature → (doc_id, band_id, band_hash) rows."""
    band_rows = [
        sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws("|", *[F.col(f"h{b * BAND_ROWS + r}") for r in range(BAND_ROWS)])
            ).alias("band_hash"),
        )
        for b in range(N_BANDS)
    ]
    out = band_rows[0]
    for extra in band_rows[1:]:
        out = out.unionByName(extra)
    return out


def _sql_minhash_cte() -> str:
    """Oracle-side rendering of the identical MinHash pipeline."""
    mins = ",\n              ".join(
        f"min(md5('{i}:' || token)) AS h{i}" for i in range(N_HASHES)
    )
    bands = "\n            UNION ALL\n            ".join(
        "SELECT doc_id, {b} AS band_id, md5({expr}) AS band_hash FROM sig".format(
            b=b,
            expr=" || '|' || ".join(f"h{b * BAND_ROWS + r}" for r in range(BAND_ROWS)),
        )
        for b in range(N_BANDS)
    )
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS tokens
            FROM documents
        ),
        tok AS (SELECT doc_id, unnest(tokens) AS token FROM toks),
        sig AS (
            SELECT doc_id,
              {mins}
            FROM tok GROUP BY doc_id
        ),
        bands AS (
            {bands}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b
              ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        )
    """


@query(
    "dedup_minhash_lsh",
    survey_ref="L2,F4,F7,J8",
    doc="MinHash-LSH near-dup candidate pairs, verified with exact Jaccard.",
    oracle=_sql_minhash_cte()
    + f"""
        SELECT
            doc_a,
            doc_b,
            round(CAST(length(list_intersect(ta.tokens, tb.tokens)) AS DOUBLE)
                  / length(list_distinct(ta.tokens || tb.tokens)), 6) AS jaccard
        FROM cand
        JOIN toks ta ON ta.doc_id = doc_a
        JOIN toks tb ON tb.doc_id = doc_b
        WHERE CAST(length(list_intersect(ta.tokens, tb.tokens)) AS DOUBLE)
              / length(list_distinct(ta.tokens || tb.tokens)) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: shingle→minhash→band→bucket-join→exact-Jaccard.

    The band self-join emits only same-bucket pairs; exact Jaccard then
    verifies candidates (set intersection / union over distinct tokens).
    Both engines compute the same integer set sizes, so the double division
    and threshold agree exactly.
    """
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", _tokens_expr().alias("tokens"))
    bands = _bands(_minhash_signature(d))

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tokens").alias("tokens_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tokens").alias("tokens_b"))
    jac = F.size(F.array_intersect("tokens_a", "tokens_b")) / F.size(
        F.array_union("tokens_a", "tokens_b")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("jaccard_raw", jac)
        .filter(F.col("jaccard_raw") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


# ------------------------------------------------------------- SimHash L2

SIMHASH_BITS = 32
_HIGH_NIBBLES = ("8", "9", "a", "b", "c", "d", "e", "f")


@query(
    "dedup_simhash_groups",
    survey_ref="L2,F7",
    doc="32-bit SimHash fingerprint per doc; identical fingerprints form near-dup groups.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, md5(unnest(
                list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))
            )) AS h
            FROM documents
        ),
        sums AS (
            SELECT doc_id,
                   {sums}
            FROM tok GROUP BY doc_id
        )
        SELECT {fingerprint} AS simhash,
               COUNT(*) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id
        FROM sums
        GROUP BY simhash
    """.format(
        sums=",\n                   ".join(
            "SUM(CASE WHEN substring(h, {j}, 1) IN ('8','9','a','b','c','d','e','f') "
            "THEN 1 ELSE -1 END) AS s{j}".format(j=j)
            for j in range(1, SIMHASH_BITS + 1)
        ),
        fingerprint="concat("
        + ", ".join(
            f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(1, SIMHASH_BITS + 1)
        )
        + ")",
    ),
)
def dedup_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per bit j, majority vote of the j-th md5 nibble's high bit
    over the doc's distinct tokens. One explode + one groupBy with 32
    parallel conditional sums — no per-bit passes. Fingerprint equality
    groups near-identical docs; at scale the fingerprint is also the ideal
    clustering/bucketing key for pair generation."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens_expr()).alias("t")).select(
        "doc_id", F.md5("t").alias("h")
    )
    sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring("h", j, 1).isin(*_HIGH_NIBBLES), 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(1, SIMHASH_BITS + 1)
        ]
    )
    fingerprint = F.concat(
        *[
            F.when(F.col(f"s{j}") > 0, "1").otherwise("0")
            for j in range(1, SIMHASH_BITS + 1)
        ]
    ).alias("simhash")
    return sums.select("doc_id", fingerprint).groupBy("simhash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id")
    )


# ------------------------------------------------------ n-gram Jaccard L2


@query(
    "dedup_ngram_jaccard",
    survey_ref="L2,F4",
    doc="Word-trigram Jaccard over (lang, length-bucket)-blocked pairs.",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), t -> t <> '') AS tokens
            FROM documents
        ),
        shingled AS (
            SELECT doc_id, lang,
                   CAST(length(tokens) // 20 AS INT) AS len_bucket,
                   list_distinct(list_transform(
                       range(1, length(tokens) - 1),
                       i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]
                   )) AS shingles
            FROM toks
            WHERE length(tokens) >= 3
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               round(CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                     / length(list_distinct(a.shingles || b.shingles)), 6) AS trigram_jaccard
        FROM shingled a
        JOIN shingled b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE CAST(length(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / length(list_distinct(a.shingles || b.shingles)) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-shingle Jaccard. Pairs are blocked on (lang, token-count
    bucket of 20) — near-dups land in the same block, and block sizes stay
    bounded so the pair count grows linearly, not quadratically."""
    d = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split("text", " "), lambda t: t != "")
    # element_at is 1-based in both engines; transform over sequence(1, n-2)
    shingles = F.expr(
        "array_distinct(transform(sequence(1, size(tokens) - 2), "
        "i -> concat_ws(' ', element_at(tokens, i), element_at(tokens, i + 1), "
        "element_at(tokens, i + 2))))"
    )
    shingled = (
        d.select("doc_id", "lang", tokens.alias("tokens"))
        .filter(F.size("tokens") >= 3)
        .select(
            "doc_id",
            "lang",
            (F.size("tokens") / 20).cast("int").alias("len_bucket"),
            shingles.alias("shingles"),
        )
    )
    a, b = shingled.alias("a"), shingled.alias("b")
    jac = F.size(F.array_intersect("a.shingles", "b.shingles")) / F.size(
        F.array_union("a.shingles", "b.shingles")
    )
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.2)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round("jac_raw", 6).alias("trigram_jaccard"),
        )
    )

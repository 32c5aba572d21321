"""Iterative graph analytics (SURVEY.md §2 beyond-survey; companions to
the connected-components fixpoint in operators/dedup.py).

PageRank is the second canonical Spark iteration shape (the original
Pregel/GraphX demo workload). The engine's twist is EXACT cross-engine
parity for an iterative float algorithm: ranks are kept in integer
fixed-point (millionths), so every step is BIGINT multiply / integer
division — operations both engines define identically — and a DuckDB
oracle that unrolls the same 8 iterations as chained CTEs reproduces the
Spark loop bit-for-bit. No tolerance windows, no "approximately
converged": the driver's value-hash gate covers the whole iteration.

Graph: supplier ship-sequence adjacency — within each order, an edge
points from each line's supplier to the NEXT supplier in ship order
(lead() over l_shipdate, l_linenumber, l_suppkey — the suppkey tiebreak
matters: the driver testdata repeats l_linenumber within an order, and
any residual tie then holds an equal suppkey, making the supplier
SEQUENCE — and so the edge set — permutation-invariant and
engine-deterministic). One window pass, no self-join:
edge count is bounded by lineitem count, grows linearly with fact rows,
and the resulting digraph has genuinely varying in/out-degrees (a plain
same-order co-supply join saturates into a complete graph even at
sf0.01, which would make every rank identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_for_ebook_classification_spark.plans.registry import query
from pyspark_for_ebook_classification_spark.sources.io import load

_PR_BASE = 1_000_000  # rank unit: millionths
_PR_ITERS = 8
_PR_TELEPORT = 15 * _PR_BASE // 100  # (1 - d) * BASE with d = 0.85


def _pr_oracle() -> str:
    ctes = [
        f"""
        seq AS (
            SELECT l_suppkey AS src,
                   lead(l_suppkey) OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_shipdate, l_linenumber, l_suppkey
                   ) AS dst
            FROM lineitem
        ),
        edges AS MATERIALIZED (
            SELECT DISTINCT src, dst FROM seq
            WHERE dst IS NOT NULL AND src <> dst
        ),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        n AS (SELECT s_suppkey AS node FROM supplier),
        r0 AS (SELECT node, CAST({_PR_BASE} AS BIGINT) AS r FROM n)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""
        r{k} AS (
            SELECT n.node,
                   CAST({_PR_TELEPORT} + (85 * COALESCE(SUM(c.contrib), 0)) // 100
                       AS BIGINT) AS r
            FROM n
            LEFT JOIN (
                SELECT e.dst, p.r // d.d AS contrib
                FROM edges e
                JOIN r{k - 1} p ON e.src = p.node
                JOIN deg d ON d.src = e.src
            ) c ON c.dst = n.node
            GROUP BY n.node
        )"""
        )
    return (
        "WITH " + ",".join(ctes) + f"\n        SELECT node, r AS rank_units FROM r{_PR_ITERS}"
    )


@query(
    "graph_pagerank_fixedpoint",
    survey_ref="L9,A1,J1",
    doc="8-iteration PageRank over the supplier co-supply graph in BIGINT "
    "fixed-point (millionths) — an iterative Spark loop that hash-matches "
    "an unrolled recursive-CTE oracle exactly.",
    oracle=_pr_oracle(),
)
def graph_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with damping 0.85, 8 fixed iterations, integer fixed-point.

    Why fixed-point: floating PageRank accumulates libm/order-dependent
    error, so an iterative job can never value-match an oracle. With
    ranks in millionths every step is ``r div out_degree`` (truncating
    integer division — identical semantics in Spark's ``div`` and
    DuckDB's ``//``) and ``teleport + (85 * Σcontrib) div 100``: pure
    BIGINT arithmetic with one deterministic answer.

    Scale shape — the classic Pregel-on-DataFrames loop:
      * edges + (edge, out-degree) are materialized ONCE and
        localCheckpoint'd: the lead() window pass and degree agg never
        rerun, and per-iteration lineage stays flat (no exponential plan
        growth — the failure mode of naive iterative DataFrame code).
      * each iteration is exactly one shuffle pair: join ranks to edges
        on src (both sides partitioned by the same key after the first
        round — AQE reuses the exchange), then a partial-aggregating
        groupBy on dst.
      * ranks are checkpointed every 3 rounds, bounding recovery replay.
        LAZY since r15: the r14 A/B read eager=False as a 1.10×
        regression, but that was measured with the node list
        unmaterialized — with ``nodes`` checkpointed (below) the
        re-measured interleaved A/B reads lazy at 0.89×/0.93×
        (two runs), so the reversal is itself reversed. Re-measure
        rather than inherit: these eagerness calls are shape-dependent.
    Iteration count is fixed (8), the standard production choice —
    convergence-tested PageRank needs a driver-side scalar per round,
    which the CC operator (dedup.py) already demonstrates."""
    edges = _ship_sequence_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    edge_deg = edges.join(deg, "src").localCheckpoint(eager=True)

    # node-sized, consumed by EVERY round's teleport left-join plus the
    # rank init (r15): unmaterialized, each of the 8 rounds re-ran the
    # supplier scan + exchange + sort (9 FileScans in the before-plan,
    # filter-divergent between rounds so ReuseExchange could not dedupe
    # them); one lazy checkpoint makes every round read the written-once
    # node list.
    nodes = (
        load(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("node"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(_PR_BASE).cast("bigint").alias("r"))

    for k in range(_PR_ITERS):
        contribs = (
            edge_deg.join(ranks, edge_deg.src == ranks.node)
            .select("dst", F.expr("r div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = nodes.join(contribs, nodes.node == contribs.dst, "left").select(
            "node",
            F.expr(
                f"CAST({_PR_TELEPORT} + (85 * COALESCE(s, CAST(0 AS BIGINT))) div 100"
                " AS BIGINT)"
            ).alias("r"),
        )
        if k % 3 == 2:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_units"))


def _ship_sequence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw directed (src, dst) supplier ship-sequence adjacencies, one row
    per consecutive lineitem pair (see module doc) — NOT deduplicated, so
    callers can either .distinct() (pagerank) or weight by multiplicity
    (triangle counting's strong-tie weights)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_linenumber"
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_shipdate", "l_linenumber", "l_suppkey"
    )
    return li.select(
        F.col("l_suppkey").alias("src"),
        F.lead("l_suppkey").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))


def _ship_sequence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct directed supplier ship-sequence edges."""
    return _ship_sequence_pairs(spark, sf_dir).distinct()


def _sparse_strongtie_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-8 strong-tie undirected backbone of the co-ship graph — the
    kNN sparsification both graph_triangle_count (which documents the
    scale rationale) and graph_jaccard_link_prediction enumerate over.
    Edge weight = co-ship multiplicity; (w DESC, other) is a total,
    deterministic pick order; each undirected edge is stored once as
    (a < b)."""
    seq = _ship_sequence_pairs(spark, sf_dir)
    wp = (
        seq.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # one explode, not unionAll-of-two-selects: the weighted-pair agg
    # runs once, and each pair fans into its two directed halves map-side
    both = wp.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("node"), F.col("b").alias("other")),
                F.struct(F.col("b").alias("node"), F.col("a").alias("other")),
            )
        ).alias("e"),
        "w",
    ).select("e.node", "e.other", "w")
    w_rank = Window.partitionBy("node").orderBy(F.desc("w"), "other")
    picks = (
        both.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 8)
        .select("node", "other")
    )
    # the sparse edge list (<= 8n rows) feeds every consumer — checkpoint
    # it so the window/groupBy pipeline above runs exactly once
    return (
        picks.select(
            F.least("node", "other").alias("a"),
            F.greatest("node", "other").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


#: shared CTE chain: undirected edge set -> degrees -> degree-oriented
#: edges (each undirected edge stored once, pointing from the endpoint
#: that is smaller under the (degree, id) total order).
_TRI_CTES = """
        seq AS (
            SELECT l_suppkey AS src,
                   lead(l_suppkey) OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_shipdate, l_linenumber, l_suppkey
                   ) AS dst
            FROM lineitem
        ),
        wp AS MATERIALIZED (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                   COUNT(*) AS w
            FROM seq WHERE dst IS NOT NULL AND src <> dst
            GROUP BY 1, 2
        ),
        picks AS (
            SELECT node, other FROM (
                SELECT node, other, w,
                       row_number() OVER (
                           PARTITION BY node ORDER BY w DESC, other
                       ) AS rn
                FROM (
                    SELECT a AS node, b AS other, w FROM wp
                    UNION ALL
                    SELECT b AS node, a AS other, w FROM wp
                )
            ) WHERE rn <= 8
        ),
        und AS MATERIALIZED (
            SELECT DISTINCT least(node, other) AS a, greatest(node, other) AS b
            FROM picks
        ),
        deg AS MATERIALIZED (
            SELECT node, COUNT(*) AS d FROM (
                SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
            ) GROUP BY node
        ),
        oriented AS MATERIALIZED (
            SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
                   CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS v,
                   CASE WHEN (da.d, a) < (db.d, b) THEN db.d ELSE da.d END AS dv
            FROM und
            JOIN deg da ON da.node = a
            JOIN deg db ON db.node = b
        )
"""


@query(
    "graph_triangle_count",
    survey_ref="L9,J8,A1",
    doc="Per-supplier triangle counts in the undirected co-ship graph via "
    "degree-oriented wedge closing — the skew-proof triangle algorithm.",
    oracle=f"""
        WITH {_TRI_CTES},
        tris AS (
            SELECT o1.u AS x, o1.v AS y, o2.v AS z
            FROM oriented o1
            JOIN oriented o2
              ON o1.u = o2.u
             AND ((o1.dv, o1.v) < (o2.dv, o2.v))
            JOIN oriented o3 ON o3.u = o1.v AND o3.v = o2.v
        ),
        pernode AS (
            SELECT node, COUNT(*) AS n_triangles FROM (
                SELECT x AS node FROM tris
                UNION ALL SELECT y FROM tris
                UNION ALL SELECT z FROM tris
            ) GROUP BY node
        )
        SELECT node, CAST(n_triangles AS BIGINT) AS n_triangles FROM pernode
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting: k-NN sparsification, then degree-oriented
    wedge closing.

    Two independent scale defenses, each against a different blowup:

    1. SPARSIFY FIRST (top-8 strongest ties per node). Co-occurrence
       graphs densify super-linearly as data grows — this very dataset
       saturates to the COMPLETE supplier graph at sf0.01 (4,950 =
       C(100,2) edges), and triangle work on a dense graph is TH(m^1.5)
       no matter how clever the enumeration (measured: 15x wall for 10x
       data before this stage existed; scripts/scaling_check.py caught
       it). Keeping each node's 8 heaviest edges (weight = co-ship
       count, (w DESC, other) tiebreak — total and deterministic)
       bounds |E| <= 8n, restores linear growth, and is what production
       co-occurrence pipelines do before cubic analytics (strong-tie
       backbone / kNN-graph extraction). Cost: one partial-agg groupBy
       for weights plus one WindowGroupLimit rank — both linear.
    2. ORIENT BY DEGREE. On the sparse graph, orient every edge from
       its lower endpoint under the (degree, id) total order and
       enumerate wedges only at the low end: per-node wedge count is
       quadratic in the CAPPED out-degree, so a residual hub receives
       edges inward and generates no wedge storm. Each triangle appears
       as exactly one ordered wedge, closed by one hash join back
       against the oriented edge set.

    All stages are partial-agg / shuffle-hash shapes; no cartesian."""
    und = _sparse_strongtie_und(spark, sf_dir)
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    o1 = oriented.select(F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy"))
    o2 = oriented.select(F.col("u"), F.col("v").alias("z"), F.col("dv").alias("dz"))
    wedges = o1.join(o2, "u").filter(
        (F.col("dy") < F.col("dz"))
        | ((F.col("dy") == F.col("dz")) & (F.col("y") < F.col("z")))
    )
    closer = oriented.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closer, ["y", "z"]).select(
        F.col("u").alias("x"), "y", "z"
    )
    return (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )


# ------------------------------------------------------- k-core (h-index)

_KC_ITERS = 8


def _kcore_oracle() -> str:
    ctes = [
        f"""{_TRI_CTES},
        bidir AS MATERIALIZED (
            SELECT a AS node, b AS other FROM und
            UNION ALL
            SELECT b AS node, a AS other FROM und
        ),
        c0 AS (SELECT node, CAST(d AS BIGINT) AS c FROM deg)"""
    ]
    for k in range(1, _KC_ITERS + 1):
        ctes.append(
            f"""
        c{k} AS (
            SELECT d.node,
                   COALESCE(MAX(LEAST(x.c, x.r)), 0) AS c
            FROM deg d
            LEFT JOIN (
                SELECT b.node, p.c,
                       row_number() OVER (
                           PARTITION BY b.node ORDER BY p.c DESC, b.other
                       ) AS r
                FROM bidir b JOIN c{k - 1} p ON p.node = b.other
            ) x ON x.node = d.node
            GROUP BY d.node
        )"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"\n        SELECT node, CAST(c AS BIGINT) AS coreness FROM c{_KC_ITERS}"
    )


@query(
    "graph_kcore_hindex",
    survey_ref="L9,A1,J1,W1",
    doc="k-core decomposition by the iterated-h-index fixpoint (8 rounds, "
    "integer-exact) over the strong-tie supplier graph — per-node "
    "coreness, the degeneracy-ordering backbone metric.",
    oracle=_kcore_oracle(),
)
def graph_kcore_hindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition — the third canonical iterative-graph shape
    after the CC min-label fixpoint and the PageRank power iteration:
    coreness(v) is the largest k with v inside a subgraph of minimum
    degree k, the standard backbone/influence metric (and the degeneracy
    order that makes triangle-style enumeration linear-ish). The classic
    peel algorithm is sequential; the DISTRIBUTED formulation is the
    iterated h-index (Lü et al. 2016, arXiv:1602.00987): start from
    c₀ = degree and set c_{t+1}(v) = H({c_t(u) : u ~ v}) — the largest h
    such that at least h neighbors hold value ≥ h. The sequence is
    monotonically non-increasing and converges exactly to coreness.

    Parity strategy: the PageRank trick — a FIXED 8 iterations of pure
    integer arithmetic (h-index = max over the desc-sorted neighbor
    ranks r of least(c, r): depends only on the sorted value multiset,
    so any tie order gives the same answer), which a DuckDB oracle
    unrolls as chained CTEs bit-for-bit. A pytest golden separately
    proves 8 rounds reach the TRUE coreness (pure-Python peel) on the
    test graphs; production runs to convergence with the CC loop's
    driver-side fixpoint scalar instead of a fixed count.

    Scale shape: the bidirectional strong-tie edge list (≤ 16n rows
    after the kNN sparsification shared with triangle counting) is
    checkpointed once; each round is one hash join (neighbor values)
    and ONE hash aggregate — the h-index computed as an array fold over
    the degree-capped neighbor-value list (_hindex_round), not a window
    sort. Lineage stays flat via the every-3-rounds checkpoint, the
    PageRank loop's discipline."""
    pairs = _ship_sequence_pairs(spark, sf_dir)
    wp = (
        pairs.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    both = wp.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("node"), F.col("b").alias("other")),
                F.struct(F.col("b").alias("node"), F.col("a").alias("other")),
            )
        ).alias("e"),
        "w",
    ).select("e.node", "e.other", "w")
    w_rank = Window.partitionBy("node").orderBy(F.desc("w"), "other")
    und = (
        both.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 8)
        .select(
            F.least("node", "other").alias("a"),
            F.greatest("node", "other").alias("b"),
        )
        .distinct()
    )
    bidir = _gather_ready(
        und.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("node"), F.col("b").alias("other")),
                    F.struct(F.col("b").alias("node"), F.col("a").alias("other")),
                )
            ).alias("e")
        ).select("e.node", "e.other")
    )
    # deg's only remaining consumer is the c0 initialization (r14: the
    # per-round null-coalescing deg join was vacuous and is gone — see
    # _hindex_round), so it needs no checkpoint of its own.
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    c = deg.select("node", F.col("d").cast("bigint").alias("c"))
    for k in range(_KC_ITERS):
        c = _hindex_round(bidir, c)
        if k % 3 == 2:
            c = c.localCheckpoint(eager=False)
    return c.select("node", F.col("c").alias("coreness"))


def _gather_ready(bidir: DataFrame) -> DataFrame:
    """Checkpoint the bidirectional edge list with NON-NULLABLE key
    attributes so every h-index round's gather-join subtree over it
    canonicalizes identically and AQE's stage cache reuses ONE edge
    exchange (or broadcast) per lineage segment instead of building one
    per round (r14 verdict item 2, guide §2.2/§2.4).

    Why nullability: both columns are non-null by the
    ``kcore_converged`` contract (and by construction in the declared
    query's least/greatest builder), but the lead()-derived lineage
    leaves the ATTRIBUTES nullable, and the optimizer then infers a
    DIFFERENT isnotnull() Filter above the checkpoint scan in every
    round (round k's join also infers isnotnull(node) for round k+1's
    rename) — filter-divergent subtrees that defeat exchange reuse, so
    the same edge RDD was exchanged/broadcast once per round (r14
    executed plan: one BroadcastQueryStage per round, 0 ReusedExchange;
    forced-SMJ scale twin: 0 ReusedExchange —
    plans/r15/graph_kcore_hindex_smj_twin_before.txt). The coalesce
    (col, 0) wrappers make the attributes non-nullable (values
    unchanged — nulls are impossible), the inferred filters constant-
    fold away, every round's edge subtree becomes the bare RDD scan,
    and the stage cache reuses it: the after-plans show ReusedExchange
    on hashpartitioning(other) under forced SMJ (the 100 TB join
    strategy) and a reused broadcast locally. Same-JVM A/B: neutral
    locally (the relation is KB-sized here); the win is the removed
    per-round edge-sized exchange at scale.

    MEASURED REVERSAL (r14 verdict item 2 asked for an explicit
    ``repartition(n, "other")`` before the checkpoint instead): tried
    first, oracle-green, but 1.21-1.44× SLOWER at sf0.1 on guard-clean
    interleaved A/Bs — the captured 32-way partitioning forces every
    KB-sized round through 32-task stages (the same
    scheduler-overhead-bound regime the 8-core bench ratios expose),
    and locally the round join is a broadcast that ignores the
    pre-partitioning anyway. The stage-cache reuse above delivers the
    verdict's goal (one edge exchange per segment, 'or AQE
    equivalent') without pinning a partition count at all."""
    return (
        bidir.select(
            F.coalesce(F.col("node"), F.lit(0).cast("bigint")).alias("node"),
            F.coalesce(F.col("other"), F.lit(0).cast("bigint")).alias("other"),
        )
        .localCheckpoint(eager=False)
    )


def _hindex_round(bidir: DataFrame, c: DataFrame) -> DataFrame:
    """One h-index update c' (node, c) ← H({c(u) : u ~ node}).

    Formulation: collect the neighbor values per node (bounded by the
    strong-tie degree cap) and compute the h-index as an ARRAY fold —
    array_max(zip_with(sort_array desc, ranks, least)) — instead of the
    oracle's row_number window + max(least(c, r)) groupBy. Same value by
    definition (the h-index depends only on the sorted value multiset),
    but ONE hash aggregate per round instead of a window sort followed
    by an aggregate: removes a per-round per-partition sort at 100 TB
    and ~30% of the local per-round stage cost (the query runs 8 such
    rounds — it is the slowest headline entry). The oracle keeps the
    windowed form, which pins the two formulations against each other
    corpus-wide on every parity run.

    r14 (guide §2.4): the former per-round deg left-join + coalesce(h, 0)
    was vacuous — ``bidir`` carries BOTH directions of every edge, so
    every node in it has ≥ 1 neighbor, ``c`` covers the full node set by
    induction (c₀ = deg), and the gather therefore yields a value for
    every node; the join re-added nodes that cannot be missing, at one
    node-keyed join + exchange per round (8 of each in the declared
    query). h IS the round's output."""
    nb = bidir.join(c.select(F.col("node").alias("other"), "c"), "other")
    return (
        nb.groupBy("node")
        .agg(F.sort_array(F.collect_list("c"), asc=False).alias("vals"))
        .select(
            "node",
            F.expr(
                "array_max(zip_with(vals, sequence(1, size(vals)),"
                " (x, r) -> least(x, CAST(r AS BIGINT))))"
            ).alias("c"),
        )
    )


def _hindex_round_windowed(bidir: DataFrame, c: DataFrame) -> DataFrame:
    """The hub-safe h-index update: identical value to _hindex_round (the
    h-index depends only on the sorted neighbor-value multiset) but
    computed as a row_number window + max(least(c, r)) aggregate, so a
    node's neighbor values are SORTED AND STREAMED by the window operator
    (which spills to disk) instead of materialized as one in-task array.
    Costs a per-round per-partition sort the array fold avoids — the
    price of unbounded degrees (r7 ADVICE on graphs._hindex_round)."""
    nb = bidir.join(c.select(F.col("node").alias("other"), "c"), "other")
    w = Window.partitionBy("node").orderBy(F.desc("c"))
    return (
        nb.select("node", "c", F.row_number().over(w).alias("r"))
        .groupBy("node")
        .agg(F.max(F.least(F.col("c"), F.col("r").cast("bigint"))).alias("c"))
    )


def kcore_converged(
    bidir: DataFrame, max_rounds: int = 256, hub_safe: bool = False
) -> DataFrame:
    """PRODUCTION k-core entry point: iterate the h-index update to the
    FIXPOINT instead of a fixed round count (r6 verdict item 5). The
    declared query ``graph_kcore_hindex`` runs exactly ``_KC_ITERS`` = 8
    rounds so a DuckDB oracle can unroll it; 8 is golden-proven sufficient
    on the test graphs but is NOT k-core on deeper graphs — the h-index
    sequence needs O(diameter)-ish rounds on path-like topology (a 30-node
    path takes ~14). This runner uses the CC loop's driver-side fixpoint
    discipline: one ``changed`` count per round (a single aggregate
    scalar — the standard iterative-Spark control flow, not a data
    collect), every-round localCheckpoint to keep lineage flat, stop when
    no node's value moved. The h-index sequence is monotonically
    non-increasing and lower-bounded by true coreness (Lü et al. 2016),
    so the first unchanged round IS the exact answer; ``max_rounds`` is a
    runaway backstop, not a tuning knob.

    ``bidir``: bidirectional edge list with columns (node, other), both
    directions present, no duplicate edges. Returns (node, coreness).

    Degree precondition (r7 ADVICE — a contract, not a docstring
    aside): the default ``hub_safe=False`` path uses _hindex_round's
    array fold, which materializes each node's full neighbor-value
    list inside one task — correct and fastest when max degree is
    bounded (the declared query's edge builder caps it at 16; up to
    ~1e6 neighbors per node is comfortable in executor memory). For
    graphs with UNBOUNDED hub degrees (a social-graph celebrity, a
    boilerplate-document node), pass ``hub_safe=True``: rounds switch
    to _hindex_round_windowed, whose window sort streams and spills
    instead of collecting — same values by definition (pinned by
    tests/test_graphs.py), one extra per-round sort as the price.

    Scale shape per round: one hash join (neighbor values), one hash
    aggregate (array fold, or window+aggregate when hub_safe), one
    scalar count. State between rounds is one bigint per node — at
    100 TB the per-round shuffle is O(edges), the driver holds one
    number."""
    bidir = _gather_ready(bidir.select("node", "other"))
    # deg's only remaining consumer is the c0 initialization (r14: the
    # per-round null-coalescing deg join was vacuous and is gone — see
    # _hindex_round), so deg itself needs no checkpoint. c0 keeps a lazy
    # one: round 1 references it TWICE (the gather join and the
    # changed-count join), and the checkpoint stops the deg aggregate
    # from running twice in that first action. Node-sized, cheap.
    deg = bidir.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    c = deg.select("node", F.col("d").cast("bigint").alias("c")).localCheckpoint(
        eager=False
    )
    step = _hindex_round_windowed if hub_safe else _hindex_round
    for _ in range(max_rounds):
        new_c = step(bidir, c).localCheckpoint(eager=False)
        changed = (
            new_c.alias("n")
            .join(c.alias("o"), "node")
            .filter(F.col("n.c") != F.col("o.c"))
            .count()
        )
        c = new_c
        if changed == 0:
            return c.select("node", F.col("c").alias("coreness"))
    raise RuntimeError(
        f"kcore_converged: no fixpoint within {max_rounds} rounds — "
        "graph deeper than the backstop; raise max_rounds"
    )


# ------------------------------------------- Jaccard link prediction


@query(
    "graph_jaccard_link_prediction",
    survey_ref="L9,J8,A1",
    doc="Common-neighbor / Jaccard link prediction over the strong-tie "
    "backbone: score non-adjacent pairs by shared-neighbor overlap.",
    oracle=f"""
        WITH {_TRI_CTES},
        adj AS (
            SELECT a AS w, b AS n FROM und
            UNION ALL
            SELECT b AS w, a AS n FROM und
        ),
        cand AS (
            SELECT x.n AS u, y.n AS v, COUNT(*) AS cn
            FROM adj x JOIN adj y ON x.w = y.w AND x.n < y.n
            GROUP BY x.n, y.n
        ),
        newpairs AS (
            SELECT c.u, c.v, c.cn
            FROM cand c
            LEFT JOIN und e ON e.a = c.u AND e.b = c.v
            WHERE e.a IS NULL
        )
        SELECT u, v,
               CAST(cn AS BIGINT) AS common_neighbors,
               CAST(du.d AS BIGINT) AS deg_u,
               CAST(dv.d AS BIGINT) AS deg_v,
               round(CAST(cn AS DOUBLE) / (du.d + dv.d - cn), 6) AS jaccard
        FROM newpairs
        JOIN deg du ON du.node = u
        JOIN deg dv ON dv.node = v
        WHERE cn >= 2
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood overlap: candidate pairs are the
    wedge endpoints (two nodes sharing a middle neighbor), their
    common-neighbor count falls out of the wedge GROUP BY, existing
    edges anti-join away, and Jaccard = cn / (deg_u + deg_v − cn) —
    the inclusion–exclusion denominator — scores what remains. cn ≥ 2
    gates the declared output to genuinely supported predictions.

    Scale: runs on the SAME top-8 strong-tie backbone as
    graph_triangle_count (shared _sparse_strongtie_und, one
    checkpointed ≤8n-edge list), so per-node degree is capped and the
    wedge self-join fans out at most C(2·cap, 2) pairs per middle node
    — linear in nodes, skew-proof by construction, never data². The
    Jaccard double is one exact-BIGINT quotient, rounded per contract."""
    und = _sparse_strongtie_und(spark, sf_dir)
    adj = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("w"), F.col("b").alias("n")),
                F.struct(F.col("b").alias("w"), F.col("a").alias("n")),
            )
        ).alias("e")
    ).select("e.w", "e.n")
    x = adj.select("w", F.col("n").alias("u"))
    y = adj.select(F.col("w").alias("w2"), F.col("n").alias("v"))
    cand = (
        x.join(y, (x.w == y.w2) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    newpairs = cand.join(
        und,
        (cand.u == und.a) & (cand.v == und.b),
        "left_anti",
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("deg_v"))
    return (
        newpairs.join(du, "u")
        .join(dv, "v")
        .filter(F.col("cn") >= 2)
        .select(
            "u",
            "v",
            F.col("cn").cast("bigint").alias("common_neighbors"),
            F.col("deg_u").cast("bigint").alias("deg_u"),
            F.col("deg_v").cast("bigint").alias("deg_v"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
    )


# ------------- r12: kcore_converged library router under the hash gate

#: measured h-index fixpoint depth of the nation path+clique graph below
#: (pure-Python iteration in tests/test_r12_library.py re-derives it):
#: 19 changing rounds, then one confirming round — kcore_converged runs
#: 20, the 8-round declared unroll would stop at the WRONG values.
_KC_CONV_DEPTH = 19


def _kcore_conv_oracle(depth: int = _KC_CONV_DEPTH) -> str:
    """Unrolled h-index oracle over the nation path+clique graph — the
    same windowed round SQL as _kcore_oracle, unrolled to the graph's
    MEASURED fixpoint depth instead of the registered 8 (r11 verdict
    task 4: the convergence loop itself under the hash gate)."""
    ctes = [
        """nat AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        und AS (
            SELECT DISTINCT a, b FROM (
                SELECT x.k AS a, y.k AS b FROM nat x JOIN nat y ON y.k = x.k + 1
                UNION ALL
                SELECT x.k AS a, y.k AS b FROM nat x JOIN nat y
                    ON x.k >= 20 AND y.k > x.k
            )
        ),
        bidir AS MATERIALIZED (
            SELECT a AS node, b AS other FROM und
            UNION ALL
            SELECT b AS node, a AS other FROM und
        ),
        deg AS (SELECT node, COUNT(*) AS d FROM bidir GROUP BY node),
        c0 AS (SELECT node, CAST(d AS BIGINT) AS c FROM deg)"""
    ]
    for k in range(1, depth + 1):
        ctes.append(
            f"""
        c{k} AS (
            SELECT d.node,
                   COALESCE(MAX(LEAST(x.c, x.r)), 0) AS c
            FROM deg d
            LEFT JOIN (
                SELECT b.node, p.c,
                       row_number() OVER (
                           PARTITION BY b.node ORDER BY p.c DESC, b.other
                       ) AS r
                FROM bidir b JOIN c{k - 1} p ON p.node = b.other
            ) x ON x.node = d.node
            GROUP BY d.node
        )"""
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"\n        SELECT node, CAST(c AS BIGINT) AS coreness FROM c{depth}"
    )


@query(
    "graph_kcore_library_converged",
    survey_ref="L9,J1,A1",
    doc="The production kcore_converged library entry routed through "
    "the hash gate on a 19-round-deep graph (nation-key path + K5 tail "
    "clique) where the registered 8-round unroll would return WRONG "
    "values — the oracle unrolls to the measured fixpoint depth.",
    oracle=_kcore_conv_oracle(),
)
def graph_kcore_library_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE ``kcore_converged`` call on a graph engineered to need the
    convergence loop (r11 verdict task 4): the declared
    ``graph_kcore_hindex`` fixes 8 h-index rounds, golden-proven
    sufficient on the supplier backbone — but the h-index sequence
    needs O(path-length) rounds on path-like topology, which is exactly
    what the fixed unroll cannot know. THIS query builds, from the
    nation table (fixed 25 keys at every SF), the 0..24 key PATH plus a
    K5 clique on keys >= 20: true coreness is 4 inside the clique and 1
    along the path, and the h-index takes 19 CHANGING rounds to drain
    the path (pure-Python re-derivation pinned in
    tests/test_r12_library.py) — stopping at round 8 leaves 11 nodes at
    the wrong value. ``kcore_converged`` detects the fixpoint with its
    per-round changed-count scalar; the oracle unrolls the identical
    windowed round SQL to the measured depth, so the driver's hash gate
    attests that the CONVERGENCE control flow, not a lucky round count,
    produced the values.

    Scale shape — kcore_converged's own: per round one hash join + one
    hash aggregate + one scalar count; state is one bigint per node.
    The graph here is deliberately tiny (50 edges) because the query's
    subject is the loop's control flow; the corpus-sized k-core
    workload is the registered headline query."""
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("k")
    )
    path = (
        n.alias("x")
        .join(n.alias("y"), F.col("y.k") == F.col("x.k") + 1)
        .select(F.col("x.k").alias("a"), F.col("y.k").alias("b"))
    )
    cl = n.filter(F.col("k") >= 20)
    clique = (
        cl.alias("x")
        .join(cl.alias("y"), F.col("y.k") > F.col("x.k"))
        .select(F.col("x.k").alias("a"), F.col("y.k").alias("b"))
    )
    und = path.unionByName(clique).distinct()
    bidir = und.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("node"), F.col("b").alias("other")),
                F.struct(F.col("b").alias("node"), F.col("a").alias("other")),
            )
        ).alias("e")
    ).select("e.node", "e.other")
    return kcore_converged(bidir)

"""Skew mitigation: salted joins (SURVEY.md §4 / the 100 TB mandate).

When one join key carries a disproportionate share of rows, hash
partitioning sends that whole key to one task. AQE's skew-join splitting
(on by default in session.py) handles sort-merge cases adaptively; this
manual salt is the explicit, planner-independent tool — it decomposes each
hot key into ``n_salts`` sub-keys by salting the FACT side randomly and
replicating the DIM side once per salt, so the hot key's rows spread
across ``n_salts`` tasks.

Salting changes ONLY the physical distribution — the join result is
row-for-row identical to the unsalted join — which is why the declared
query in operators/joins.py can use the plain join as its SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"

#: join types for which dim-side replication is result-preserving. Anything
#: that can emit UNMATCHED DIM rows (right / full outer) would emit each of
#: them once per salt replica — n_salts duplicates — so those are rejected.
_SUPPORTED_HOW = {
    "inner",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (skewed side) to ``dim`` with key salting.

    ``on`` is the raw equi-join condition; the salt equality is added on
    top. The fact side gets a uniform random salt per row (rand is
    task-retry-safe: a retried task re-derives salts from its seed +
    partition, and any salt yields the same join result); the dim side is
    replicated ``n_salts`` times via an exploded salt-range column —
    acceptable precisely because the dim side is the small side.

    Only fact-preserving join types are supported: with ``right`` or
    ``full`` joins each unmatched dim row would surface once per salt
    replica, breaking the row-for-row identity this function guarantees.
    """
    if how.lower() not in _SUPPORTED_HOW:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched dim rows "
            f"would be duplicated n_salts times; use one of {sorted(_SUPPORTED_HOW)}"
        )
    salted_fact = fact.withColumn(
        SALT_COL, F.floor(F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    # shuffle_hash hint: salting exists to spread a SHUFFLE join's hot key;
    # letting Catalyst broadcast the n_salts-times-replicated dim instead
    # would funnel the whole replica through the driver (measured 68s vs 4s
    # at sf0.1) and make the salt pointless.
    replicated_dim = dim.select("*", salts).hint("shuffle_hash")
    joined = salted_fact.join(
        replicated_dim, on & (salted_fact[SALT_COL] == replicated_dim[SALT_COL]), how
    )
    return joined.drop(SALT_COL)

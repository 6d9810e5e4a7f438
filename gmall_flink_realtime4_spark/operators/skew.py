"""Skew-mitigation operators for 100 TB-scale shuffles.

The reference never handles skew (Flink hash keyBy; hot mids/skus land on
one subtask and stall the watermark). At Spark scale there are three
layers of defense, in order of preference:

1. AQE skew-join splitting — on by default in this engine
   (session.RUNTIME_CONFS: spark.sql.adaptive.skewJoin.enabled) — handles
   sort-merge join skew with zero code.
2. Partial aggregation (automatic): map-side combine bounds per-key
   reducer input for algebraic aggs, so groupBy skew rarely needs help.
3. Explicit salting (this module) for the cases the engine can't fix
   alone: broadcast-impossible skewed joins, and holistic aggregates
   (exact distinct counts) over hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side.

    Each big-side row gets a deterministic salt in [0, n_salts) (hash of
    the whole row — no rand(), so retries/speculative tasks agree); the
    small side is exploded n_salts times. The join key becomes
    (key, salt), so a hot key's rows spread over n_salts reducers instead
    of one. Cost: small side shuffled n_salts times — use only when the
    small side is too big to broadcast and AQE's skew split isn't enough
    (e.g. a single key holding >1 partition worth of rows on BOTH sides).

    Only big-side-preserving modes are valid: under right/full outer an
    unmatched small-side key would surface once PER REPLICA (n_salts
    null-extended duplicates), so those modes raise.
    """
    if how not in ("inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched small-side "
            "rows once per salt replica; use inner/left/left_semi/left_anti"
        )
    cols = [c for c in big.columns]
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    out_col: str = "distinct_count",
) -> DataFrame:
    """Exact COUNT(DISTINCT x) by hot keys without one-reducer-per-key.

    Phase 1 shuffles on (keys..., x) — the distinct pairs — so a hot key's
    values spread across reducers; phase 2 counts pairs per key. This is
    what Catalyst's Expand-based distinct does for a single distinct agg;
    the explicit form composes with other aggs and documents the shuffle
    shape (reference twin: the orderIdSet-in-state pattern, SURVEY A7,
    which holds the whole set on one subtask).

    NULL semantics match SQL COUNT(DISTINCT x): NULL is not a value, and
    a key whose x are all NULL still appears with count 0 (groups come
    from the unfiltered input, counts from the NULL-pruned pairs).
    """
    groups = df.select(*keys).distinct()
    pairs = (
        df.filter(F.col(distinct_col).isNotNull())
        .select(*keys, distinct_col)
        .distinct()
    )
    counts = pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))
    # Null-SAFE join: SQL GROUP BY treats NULL keys as one real group, so a
    # NULL-key group with non-NULL x must keep its true count (a plain
    # using-columns equi join would null-match it to 0).
    cond = None
    for k in keys:
        c = groups[k].eqNullSafe(counts[k])
        cond = c if cond is None else cond & c
    return groups.join(counts, cond, "left").select(
        *[groups[k] for k in keys],
        F.coalesce(counts[out_col], F.lit(0)).cast("bigint").alias(out_col),
    )


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 8,
    out_col: str = "values",
) -> DataFrame:
    """collect_set by key with bounded per-task state: pre-aggregate per
    (keys, salt) then flatten+dedup the n_salts partial sets. Same result
    as collect_set (as a set — ordering is canonicalized by array_sort),
    but no single task ever materializes a hot key's full value stream."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_set(value_col).alias("__part")
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("__part")))
            ).alias(out_col)
        )
    )

"""Round-4 analytics extensions: corpus mixing, quality filtering, data
integrity, anomaly detection, relational-surface completeness.

Seven ops a 100 TB training-data platform runs daily that the registry did
not yet cover:

- ``llm_mix_domains``        — temperature-sampled source mixture (alpha=0.5)
- ``llm_text_rare_token_ratio`` — Gopher-style rare-token quality filter
- ``dq_checksum_partition``  — order-independent per-source content checksum
- ``dws_event_anomaly_zscore`` — daily event-count anomaly detection
- ``f_unpivot_event_day``    — UNPIVOT (stack) — inverse of f_pivot_event_day
- ``dq_referential_integrity`` — multi-FK orphan audit across the warehouse
- ``dws_user_path_transitions`` — event-sequence transition matrix

Determinism (catalog.py contract): all comparisons/ratios in exact integer
arithmetic; the only floating-point steps are IEEE-correctly-rounded ops
(sqrt, *, /) applied to bit-identical inputs, so Spark and DuckDB produce
bit-identical doubles; transcendentals (ln/exp) are never used — they are
libm-dependent and NOT cross-engine stable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .. import tables as T
from .catalog import query
from .llm_scale_queries import _hexval_sql

# ---------------------------------------------------------------------------
# llm_mix_domains — data-mixture balancing (the Pile / Dolma-style source
# weighting). Target share per source ~ n_docs^alpha with alpha=0.5
# (temperature sampling: upweights small sources, caps dominant ones), then a
# deterministic md5-hash Bernoulli sample realizes the mixture in ONE
# map-only pass — no RNG state, reproducible across retries/partitionings.
#
# Scale: counts agg is map-combined on `source` (bounded cardinality); the
# per-source rate table is a handful of rows broadcast to the sampling scan.
# Two scans of the corpus total (count pass + sample pass) — the count pass
# is column-pruned to `source` only. Integer weights (floor(sqrt(n)*1e6))
# keep the rate computation exact on both engines; at >1e18 doc-budgets the
# budget*weight product needs a DECIMAL upgrade (documented, not needed at
# any realistic corpus size: 1e12 docs x 1e9 weight fits in DECIMAL(38,0)).
# ---------------------------------------------------------------------------
_MIX_HV = _hexval_sql("hx", "instr")
_MIX_HV_ORA = _hexval_sql("md5(CAST(doc_id AS VARCHAR) || ':mix')", "strpos")


@query(
    "llm_mix_domains",
    oracle=f"""
WITH counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
), wts AS (
    SELECT source, n_docs,
           CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
    FROM counts
), tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(SUM(w) AS BIGINT)      AS sum_w
    FROM wts
), rates AS (
    SELECT w.source, w.n_docs,
           LEAST(1000, (1000 * (((t.total_docs // 2) * w.w) // t.sum_w))
                       // w.n_docs) AS rate_permille
    FROM wts w CROSS JOIN tot t
), kept AS (
    SELECT d.source, d.n_chars
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ({_MIX_HV_ORA}) % 1000 < r.rate_permille
)
SELECT r.source, r.n_docs, CAST(r.rate_permille AS BIGINT) AS rate_permille,
       CAST(COALESCE(k.n_sampled, 0) AS BIGINT)      AS n_sampled,
       CAST(COALESCE(k.sampled_chars, 0) AS BIGINT)  AS sampled_chars
FROM rates r
LEFT JOIN (
    SELECT source, COUNT(*) AS n_sampled, SUM(n_chars) AS sampled_chars
    FROM kept GROUP BY 1
) k ON r.source = k.source
""",
    tags=("llm-corpus",),
)
def llm_mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled (alpha=0.5) source-mixture realization.

    Per-source target share ~ sqrt(n_docs), normalized against a corpus
    budget of total_docs/2; acceptance realized by a deterministic
    md5(doc_id||':mix') per-mille threshold (independent uniform from the
    ':split'/':sample' salts used by the sibling queries). counts are
    localCheckpoint'ed so the tiny rate table doesn't re-derive the count
    scan per consumer.
    """
    d = T.load(spark, sf_dir, "documents", spread=False)
    counts = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()  # a handful of rows; stops re-scan per consumer
    )
    wts = counts.withColumn(
        "w",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1000000.0)).cast(
            "bigint"
        ),
    )
    tot = wts.agg(
        F.sum("n_docs").cast("bigint").alias("total_docs"),
        F.sum("w").cast("bigint").alias("sum_w"),
    )
    rates = (
        wts.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate_permille",
            F.least(
                F.lit(1000),
                F.expr("(1000 * (((total_docs div 2) * w) div sum_w)) div n_docs"),
            ),
        )
        .select("source", "n_docs", F.col("rate_permille").cast("bigint"))
    )
    kept = (
        d.withColumn(
            "hx", F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix")))
        )
        .join(F.broadcast(rates), "source")
        .filter(F.expr(_MIX_HV) % 1000 < F.col("rate_permille"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "rate_permille",
        F.coalesce("n_sampled", F.lit(0)).cast("bigint").alias("n_sampled"),
        F.coalesce("sampled_chars", F.lit(0)).cast("bigint").alias("sampled_chars"),
    )


# ---------------------------------------------------------------------------
# llm_text_rare_token_ratio — Gopher-rules-style quality signal: fraction of
# token OCCURRENCES whose corpus frequency is below the mean token frequency
# (floor-integer threshold => exact on both engines). High rare-ratio docs
# are OOV-heavy / noisy; low ones are boilerplate.
#
# Scale: token-frequency agg is map-combined (shuffle keyed on token); the
# per-doc pass joins tokens to the frequency table on token — a shuffle join
# at vocab scale (the vocab is orders of magnitude smaller than the corpus;
# freq is localCheckpoint'ed so the scalar threshold and the join side don't
# re-derive the explode). No windows, no driver loops.
# ---------------------------------------------------------------------------
@query(
    "llm_text_rare_token_ratio",
    oracle="""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), freq AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS ct FROM toks GROUP BY 1
), sc AS (
    SELECT CAST(SUM(ct) AS BIGINT) AS total_occ,
           CAST(COUNT(*) AS BIGINT) AS n_vocab
    FROM freq
), rare AS (
    SELECT f.token,
           CASE WHEN f.ct < sc.total_occ // sc.n_vocab THEN 1 ELSE 0 END AS is_rare
    FROM freq f CROSS JOIN sc
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT)                       AS n_tokens,
       CAST(SUM(r.is_rare) AS BIGINT)                 AS n_rare,
       CAST((1000 * SUM(r.is_rare)) // COUNT(*) AS BIGINT) AS rare_permille
FROM toks t JOIN rare r ON t.token = r.token
GROUP BY 1
""",
    tags=("llm-text",),
)
def llm_text_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rare-token occurrence ratio vs the corpus mean frequency."""
    d = T.load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
        .localCheckpoint()  # vocab-sized; feeds the scalar AND the join
    )
    sc = freq.agg(
        F.sum("ct").cast("bigint").alias("total_occ"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
    )
    rare = freq.crossJoin(F.broadcast(sc)).select(
        "token",
        F.when(F.col("ct") < F.expr("total_occ div n_vocab"), 1)
        .otherwise(0)
        .alias("is_rare"),
    )
    # pinned shuffle_hash: the block comment's intended plan. Catalyst's
    # file-size estimate otherwise BROADCASTS the exploded token stream
    # (the largest frame in the query — hash-building the corpus) once the
    # checkpointed vocab estimate exceeds it; the hint keeps the join
    # shuffled on token with the vocab side built per-partition.
    return (
        toks.join(rare.hint("shuffle_hash"), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("is_rare").cast("bigint").alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_rare",
            F.expr("(1000 * n_rare) div n_tokens").cast("bigint").alias(
                "rare_permille"
            ),
        )
    )


# ---------------------------------------------------------------------------
# dq_checksum_partition — order-independent per-source table fingerprint:
# SUM of a 48-bit integer digest of each row (md5 of text + row identity),
# mod 1e15. The standard cross-cluster migration check: recompute on both
# sides, compare per partition — a single differing/missing/duplicated row
# flips the sum. Commutative + associative => partition-order independent,
# map-combined, ONE shuffle on `source`. 48-bit terms summed in DECIMAL(38)
# (no overflow until ~1e22 rows/partition).
# ---------------------------------------------------------------------------
_CK_HV = _hexval_sql("hx", "instr")
_CK_HV_ORA = _hexval_sql("md5(text || ':' || CAST(doc_id AS VARCHAR))", "strpos")


def checksum_partials(df: DataFrame) -> DataFrame:
    """Mergeable per-source checksum partials over a documents-shaped frame:
    (source, n_rows, n_chars_total, s) where ``s`` is the DECIMAL(38,0) sum
    of 48-bit row digests. Commutative + associative, so partials from any
    row partitioning (micro-batches included) fold to the same totals."""
    return (
        df.withColumn(
            "hx",
            F.md5(F.concat(F.col("text"), F.lit(":"), F.col("doc_id").cast("string"))),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
            F.sum(F.expr(_CK_HV).cast("decimal(38,0)")).alias("s"),
        )
    )


def checksum_finalize(partials: DataFrame) -> DataFrame:
    """Fold checksum partials (possibly several rows per source) to the
    final fingerprint frame."""
    return (
        partials.groupBy("source")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_chars_total").cast("bigint").alias("n_chars_total"),
            F.sum("s").cast("decimal(38,0)").alias("s"),
        )
        .select(
            "source",
            "n_rows",
            "n_chars_total",
            F.expr("CAST(s % 1000000000000000 AS BIGINT)").alias("content_checksum"),
        )
    )


@query(
    "dq_checksum_partition",
    oracle=f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT)      AS n_rows,
       CAST(SUM(n_chars) AS BIGINT)  AS n_chars_total,
       CAST(SUM({_CK_HV_ORA}) % 1000000000000000 AS BIGINT) AS content_checksum
FROM documents
GROUP BY 1
""",
    tags=("dq",),
)
def dq_checksum_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source order-independent content checksum (migration audit)."""
    d = T.load(spark, sf_dir, "documents", spread=False)
    return checksum_finalize(checksum_partials(d))


# ---------------------------------------------------------------------------
# dws_event_anomaly_zscore — per-event-type daily-count z-scores. Sufficient
# statistics (n, sum, sum-of-squares) per type are exact integers; the only
# float steps are one division and one sqrt — both IEEE-correctly-rounded,
# so both engines produce bit-identical z values from identical integers.
# z is reported as floor(1000*z) (exact-integer boundary only at z==0).
#
# Scale: daily agg = one map-combined shuffle on (type, day); the per-type
# stats frame is tiny (|event_types| rows) and broadcast back. BIGINT
# sufficient statistics hold to ~1e9 events/day/type; beyond that the
# sums upgrade to DECIMAL(38,0) (documented).
# ---------------------------------------------------------------------------
@query(
    "dws_event_anomaly_zscore",
    oracle="""
WITH daily AS (
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)      AS n_days,
           CAST(SUM(ct) AS BIGINT)       AS s1,
           CAST(SUM(ct * ct) AS BIGINT)  AS s2
    FROM daily GROUP BY 1
)
SELECT d.event_type, d.day, d.ct,
       CASE WHEN s.n_days * s.s2 - s.s1 * s.s1 = 0 THEN 0
            ELSE CAST(FLOOR(1000.0 * (
                CAST(s.n_days * d.ct - s.s1 AS DOUBLE)
                / (CAST(s.n_days AS DOUBLE)
                   * sqrt(CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE)
                          / CAST(s.n_days * s.n_days AS DOUBLE)))
            )) AS BIGINT) END AS z_milli,
       CASE WHEN s.n_days * s.s2 - s.s1 * s.s1 = 0 THEN 0
            WHEN abs(CAST(s.n_days * d.ct - s.s1 AS DOUBLE)
                     / (CAST(s.n_days AS DOUBLE)
                        * sqrt(CAST(s.n_days * s.s2 - s.s1 * s.s1 AS DOUBLE)
                               / CAST(s.n_days * s.n_days AS DOUBLE)))) >= 2.0
            THEN 1 ELSE 0 END AS is_anomaly
FROM daily d JOIN stats s ON d.event_type = s.event_type
""",
    tags=("dws", "anomaly"),
)
def dws_event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomaly detection via per-type z-scores."""
    e = T.load(spark, sf_dir, "events", spread=False)
    return anomaly_finalize(anomaly_daily_partials(e))


def anomaly_daily_partials(events: DataFrame) -> DataFrame:
    """Mergeable (event_type, day, ct) partial counts over an events-shaped
    frame — the streaming-incremental form (checksum_partials pattern):
    counts are commutative + associative, so partials appended per
    micro-batch fold to exactly the one-shot daily aggregate regardless of
    arrival order or batch boundaries."""
    return events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))


def anomaly_finalize(partials: DataFrame) -> DataFrame:
    """Fold daily partials (possibly several rows per (type, day)) and
    score: per-type sufficient statistics (n, s1, s2) are exact integers;
    the only float steps are one division and one sqrt (IEEE-correctly
    rounded -> bit-identical across engines)."""
    daily = (
        partials.groupBy("event_type", "day")
        .agg(F.sum("ct").cast("bigint").alias("ct"))
        .localCheckpoint()  # types x days rows; feeds stats AND the join —
        # without it the fact aggregation runs twice (2 full scans)
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("ct").cast("bigint").alias("s1"),
        F.sum(F.col("ct") * F.col("ct")).cast("bigint").alias("s2"),
    )
    # identical expression tree to the oracle: num/(n*sqrt(var)), var exact
    z = (
        "CAST(n_days * ct - s1 AS DOUBLE)"
        " / (CAST(n_days AS DOUBLE)"
        "    * sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)"
        "           / CAST(n_days * n_days AS DOUBLE)))"
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "ct",
            F.when(F.expr("n_days * s2 - s1 * s1 = 0"), F.lit(0))
            .otherwise(F.expr(f"CAST(FLOOR(1000.0 * ({z})) AS BIGINT)"))
            .alias("z_milli"),
            F.when(F.expr("n_days * s2 - s1 * s1 = 0"), F.lit(0))
            .otherwise(F.expr(f"CASE WHEN abs({z}) >= 2.0 THEN 1 ELSE 0 END"))
            .alias("is_anomaly"),
        )
        .withColumn("z_milli", F.col("z_milli").cast("bigint"))
        .withColumn("is_anomaly", F.col("is_anomaly").cast("int"))
    )


# ---------------------------------------------------------------------------
# f_unpivot_event_day — UNPIVOT via stack(): the exact inverse of
# f_pivot_event_day. Round-trip semantics: absent (day, type) cells that the
# pivot zero-filled stay as explicit ct=0 rows, so the oracle rebuilds the
# day x type cross frame and LEFT-joins the long aggregate. stack() is a
# single Generate over the wide row — map-only after the pivot's one
# shuffle; no second pass over the fact.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "f_unpivot_event_day",
    oracle="""
WITH agg AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS ct,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0) AS DOUBLE) AS val
    FROM events GROUP BY 1, 2
), days AS (
    SELECT DISTINCT day FROM agg
), types AS (
    SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type
)
SELECT d.day, t.event_type,
       CAST(COALESCE(a.ct, 0) AS BIGINT) AS ct,
       COALESCE(a.val, 0.0)              AS val
FROM days d CROSS JOIN types t
LEFT JOIN agg a ON a.day = d.day AND a.event_type = t.event_type
""",
    tags=("unpivot",),
)
def f_unpivot_event_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (stack) of the wide per-day event matrix back to long form."""
    from .corpus_ops_queries import f_pivot_event_day

    wide = f_pivot_event_day(spark, sf_dir)
    stack = ", ".join(f"'{t}', {t}_ct, {t}_val" for t in _EVENT_TYPES)
    return wide.select(
        "day",
        F.expr(
            f"stack({len(_EVENT_TYPES)}, {stack}) AS (event_type, ct, val)"
        ),
    ).select("day", "event_type", F.col("ct").cast("bigint"), "val")


# ---------------------------------------------------------------------------
# dq_referential_integrity — FK orphan audit across the whole warehouse in
# one result frame: for each declared FK edge, how many child rows, how many
# NULL FKs, how many orphans (non-NULL FK with no parent). Complements
# dq_reconcile_orders_lineitem (which reconciles amounts on one edge).
#
# Scale (r13): every probe keeps the broadcast-probe shape — child rows
# NEVER shuffle; each edge is a left join against the DISTINCT parent keys
# and a one-row count agg — but lineitem's 3 probes now share ONE scan:
# three broadcast hash joins stacked in a single codegen stage (distinct
# parent keys cannot multiply rows), one 9-measure agg, stack()ed back to
# 3 audit rows. Scans of lineitem 3 -> 1, probe branches 7 -> 5.
#
# The "fold everything into one keyed aggregation" rewrite the r12 verdict
# suggested (§2.1) was BUILT AND MEASURED WORSE this round, then retired:
# exchange count 21 -> 2 but sf0.1 best 1.9 -> 2.8 s and x30 isopair best
# 1.1-1.3 -> 1.5-6.6 s. The keyed agg must shuffle per-DISTINCT-FK partial
# counts (~|orders| rows — unique keys do not collapse map-side), while
# the broadcast probes shuffle NOTHING on the child side; page-cached
# parallel scans + broadcast probes beat one giant exchange at every
# measurable tier. If a parent ever outgrows the broadcast threshold, AQE
# degrades that one edge to SMJ — the same fallback the old shape had.
# ---------------------------------------------------------------------------
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "dq_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{name}' AS fk_name,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(COALESCE(SUM(CASE WHEN c.{fk} IS NULL THEN 1 END), 0) AS BIGINT)
           AS n_null_fk,
       CAST(COALESCE(SUM(CASE WHEN c.{fk} IS NOT NULL AND p.{pk} IS NULL
                              THEN 1 END), 0) AS BIGINT) AS n_orphans
FROM {child} c
LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{fk} = p.{pk}"""
        for (name, child, fk, parent, pk) in _FK_EDGES
    ),
    tags=("dq",),
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide FK orphan audit: one row per declared FK edge.

    Broadcast-probe shape per edge (child rows never shuffle); the three
    lineitem edges share one scan, three stacked broadcast joins and one
    9-measure agg reshaped by stack() (see block comment).
    """
    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for name, child, fk, parent, pk in _FK_EDGES:
        by_child.setdefault(child, []).append((name, fk, parent, pk))

    parts = []
    for tbl, edges in by_child.items():
        c = T.load(spark, sf_dir, tbl, spread=False).select(
            *[F.col(fk).alias(f"fk{i}") for i, (_n, fk, _p, _pk) in enumerate(edges)]
        )
        j = c
        for i, (_name, _fk, parent, pk) in enumerate(edges):
            p = (
                T.load(spark, sf_dir, parent, spread=False)
                .select(F.col(pk).alias(f"pk{i}"))
                .distinct()
            )
            j = j.join(F.broadcast(p), j[f"fk{i}"] == p[f"pk{i}"], "left")
        agg = j.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            *[
                m
                for i in range(len(edges))
                for m in (
                    F.coalesce(
                        F.sum(F.col(f"fk{i}").isNull().cast("bigint")), F.lit(0)
                    )
                    .cast("bigint")
                    .alias(f"null{i}"),
                    F.coalesce(
                        F.sum(
                            (
                                F.col(f"fk{i}").isNotNull()
                                & F.col(f"pk{i}").isNull()
                            ).cast("bigint")
                        ),
                        F.lit(0),
                    )
                    .cast("bigint")
                    .alias(f"orph{i}"),
                )
            ],
        )
        stacked = ", ".join(
            f"'{name}', n_child, null{i}, orph{i}"
            for i, (name, _fk, _p, _pk) in enumerate(edges)
        )
        parts.append(
            agg.select(
                F.expr(
                    f"stack({len(edges)}, {stacked})"
                    " AS (fk_name, n_child, n_null_fk, n_orphans)"
                )
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


# ---------------------------------------------------------------------------
# dws_user_path_transitions — user-journey transition matrix: for each user,
# order events by (ts, event_id) (a total order: event_id is unique), take
# lag(event_type), count (prev -> next) pairs; entries from the session
# start appear as '_start'. The partitionBy key is user_id — maximum
# cardinality, so the window parallelizes across the cluster and per-key
# state is one user's events (bounded). One shuffle on user_id, then a
# map-combined count shuffle on the (prev, next) pair.
# ---------------------------------------------------------------------------
@query(
    "dws_user_path_transitions",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_et
    FROM events
)
SELECT COALESCE(prev_et, '_start') AS prev_event_type,
       event_type,
       CAST(COUNT(*) AS BIGINT)             AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq GROUP BY 1, 2
""",
    tags=("dws", "journey"),
)
def dws_user_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-style (prev_event -> event) transition counts per user journey."""
    e = T.load(spark, sf_dir, "events", spread=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select("user_id", "event_type", "ts", "event_id").withColumn(
        "prev_et", F.lag("event_type").over(w)
    )
    return seq.groupBy(
        F.coalesce("prev_et", F.lit("_start")).alias("prev_event_type"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# llm_pii_redact — PII detection + redaction, the scrubbing pass every
# training-data pipeline runs before text reaches a tokenizer. Three
# pattern classes (email / phone / dotted-quad IP) applied SEQUENTIALLY:
# count on the current text, then replace-all, so the counts are
# well-defined even when patterns could overlap. Patterns stay inside the
# Java-regex ∩ RE2 common subset (character classes + bounded repetition,
# no backreferences/lookaround), so both engines match identically.
#
# The testdata text carries no natural PII, so deterministic PII derived
# from doc_id is INJECTED JVM-side (same construction in the oracle —
# the WAV/PPM trick applied to text): ~3/4 of docs gain exactly one
# match, the rest stay clean negatives. Map-only: one scan, no shuffle.
# ---------------------------------------------------------------------------
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\d{3}[- ]\d{3}[- ]\d{4}"
PII_IP = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

_PII_INJ_SQL = """
    text || CASE CAST(doc_id % 4 AS INT)
        WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com today'
        WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        WHEN 2 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                 || CAST((doc_id // 256) % 256 AS VARCHAR) || '.1'
        ELSE '' END
"""


@query(
    "llm_pii_redact",
    oracle=f"""
WITH inj AS (
    SELECT doc_id, {_PII_INJ_SQL} AS t FROM documents
), e AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS t
    FROM inj
), p AS (
    SELECT doc_id, n_emails,
           CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS BIGINT)
               AS n_phones,
           regexp_replace(t, '{PII_PHONE}', '<PHONE>', 'g') AS t
    FROM e
), i AS (
    SELECT doc_id, n_emails, n_phones,
           CAST(len(regexp_extract_all(t, '{PII_IP}')) AS BIGINT) AS n_ips,
           regexp_replace(t, '{PII_IP}', '<IP>', 'g') AS t
    FROM p
)
SELECT doc_id, n_emails, n_phones, n_ips,
       CAST(octet_length(encode(t)) AS BIGINT) AS redacted_len,
       md5(t) AS redacted_md5
FROM i
""",
    tags=("llm-text", "pii"),
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-doc email/phone/IP match counts + the md5 of the
    fully-redacted text (proving the replacement bytes, not just the
    counts, agree across engines). Patterns passed to the JVM regex
    engine via function arguments (no SQL-string escaping ambiguity);
    whole pipeline is one codegen projection over one scan."""
    d = T.load(spark, sf_dir, "documents")
    t0 = F.expr(
        _PII_INJ_SQL.replace("//", "div").replace("AS VARCHAR", "AS STRING")
    )
    out = d.select("doc_id", t0.alias("t"))
    for pat, tag, cnt in (
        (PII_EMAIL, "<EMAIL>", "n_emails"),
        (PII_PHONE, "<PHONE>", "n_phones"),
        (PII_IP, "<IP>", "n_ips"),
    ):
        out = out.withColumn(
            cnt,
            F.size(F.regexp_extract_all("t", F.lit(pat), F.lit(0))).cast(
                "bigint"
            ),
        ).withColumn("t", F.regexp_replace("t", pat, tag))
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ips",
        F.octet_length(F.encode("t", "utf-8")).cast("bigint").alias(
            "redacted_len"
        ),
        F.md5(F.encode("t", "utf-8")).alias("redacted_md5"),
    )

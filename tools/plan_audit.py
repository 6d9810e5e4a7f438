"""Physical-plan audit: compile every registered query and census the plan
nodes that matter at 100 TB.

For each query: exchanges (shuffles), join strategies, Expand/Window nodes,
parquet scans, and whether any filter reached a scan (PushedFilters). The
output table (PLANS.md) is the per-query "would this survive a 100x
scale-up" ledger; `CartesianProduct` anywhere is flagged as a failure
(crossJoins in this repo must lower to broadcast nested-loop against
constant-size frames, never a real cartesian).

Usage: python tools/plan_audit.py [sf_dir] [out_md]
Exit code 1 if any CartesianProduct is found.

RUNTIME census: python tools/plan_audit.py --runtime [sf_dir] [out_md]
EXECUTES every registered query and censuses the FINAL adaptive plan.
The static census above has a blind spot found in round 9: a
``localCheckpoint`` launders lineage into ``Scan ExistingRDD``, whose
static plan carries no stats and no fact-scan Location — so when AQE later
sees the materialized frame's ACTUAL size and promotes the join to
broadcast, the static census never knew a corpus-derived frame was on a
build side (the pre-rewrite ngram-jaccard/containment posting lists, found
broadcast at x10 in exactly this way).

Scope, deliberately: the runtime census is an OBSERVABILITY ledger, not a
second enforcement layer. Every broadcast AQE promotes at the audit SF is
chosen from the materialized stage's ACTUAL bytes, so a corpus-growing
frame that fits the threshold here demotes itself back to a shuffle join
at real scale — runtime promotion is self-correcting by construction
(first full census: 36/135 queries carry such promotions over
checkpointed candidate/model/config frames at sf0.001, all legitimate at
that size). Caveat learned in r10: "self-demotes at scale" must be
PROVEN per query, not assumed — llm_chunk_dedup's raw chunk frame was
still broadcast at x10 under the repo's generous 64 MB threshold and is
now shuffle_hash-pinned + runtime-guarded
(tests/test_plans.py::test_chunk_dedup_join_back_runtime_honest).
What is NOT self-correcting is (a) a CartesianProduct — the only runtime
FAILURE (exit 1) — and (b) a shape the repo explicitly pinned drifting
back (enforced per-query where it matters, e.g.
tests/test_plans.py::test_shingle_pair_joins_runtime_honest, not here).
Estimate-driven STATIC broadcasts remain the static census's job above.
The md table reports, per query: broadcast-subtree count, how many read
checkpoints (ExistingRDD), and which fact files appear inside broadcast
subtrees (aggregated or raw) — the ledger that makes the next
jaccard-class discovery a diff instead of an investigation.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmall_flink_realtime4_spark.plans.catalog import queries  # noqa: E402
from gmall_flink_realtime4_spark.session import get_spark  # noqa: E402

NODES = [
    ("Exchange", r"\(\d+\) Exchange"),
    ("BHJ", r"\(\d+\) BroadcastHashJoin"),
    ("SMJ", r"\(\d+\) SortMergeJoin"),
    ("SHJ", r"\(\d+\) ShuffledHashJoin"),
    ("BNLJ", r"\(\d+\) BroadcastNestedLoopJoin"),
    ("CARTESIAN", r"\(\d+\) CartesianProduct"),
    ("Window", r"\(\d+\) Window"),
    ("Expand", r"\(\d+\) Expand"),
    ("Scan", r"\(\d+\) Scan parquet"),
]


FACTS = (
    "orders.parquet",
    "lineitem.parquet",
    "events.parquet",
    "documents.parquet",
    "embeddings.parquet",
)

# (query -> facts) broadcast subtrees that scan a fact but are bounded by
# a NON-pushable selective filter or a candidate join, audited
# individually (round 7; narrowed to per-(query, fact) PAIRS in round 8 so
# a regression adding a DIFFERENT fact's broadcast to an allowlisted query
# still fails the census — and PLANS.md always shows what was detected):
# ANN queries broadcast the vec_id<NQ query / codebook sets (pushed-
# filter-bounded, listed here because the recall variants also carry a
# rank-bounded survivor subtree); decontaminate broadcasts the eval
# fraction (doc_id % 97 — not pushable); edit-distance / span-coverage
# broadcast candidate-bounded frames (the documented exact twins).
BOUNDED_BY_DESIGN: dict[str, frozenset[str]] = {
    "llm_ann_cosine_topk": frozenset({"embeddings.parquet"}),
    "llm_ann_ivf": frozenset({"embeddings.parquet"}),
    "llm_ann_ivf_trained_recall": frozenset({"embeddings.parquet"}),
    "llm_ann_pq_encode": frozenset({"embeddings.parquet"}),
    "llm_ann_pq_adc_recall": frozenset({"embeddings.parquet"}),
    "llm_decontaminate": frozenset({"documents.parquet"}),
    "llm_dedup_edit_distance_verify": frozenset({"documents.parquet"}),
    "llm_dup_span_coverage": frozenset({"documents.parquet"}),
    "llm_neardup_recall": frozenset({"embeddings.parquet"}),
}


def _tree_depth(line: str) -> int:
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def _detail_blocks(details: str) -> dict[str, str]:
    """Split the formatted-explain details section into per-node blocks
    keyed by node id, so a lookup can never scan past its own node (a
    node lacking a Location line must NOT inherit a later node's)."""
    blocks: dict[str, str] = {}
    cur_id: str | None = None
    cur: list[str] = []
    for ln in details.split("\n"):
        m = re.match(r"\((\d+)\) \S", ln)
        if m:
            if cur_id is not None:
                blocks[cur_id] = "\n".join(cur)
            cur_id, cur = m.group(1), [ln]
        elif cur_id is not None:
            cur.append(ln)
    if cur_id is not None:
        blocks[cur_id] = "\n".join(cur)
    return blocks


def raw_fact_broadcasts(plan: str) -> list[str]:
    """Fact tables scanned UNAGGREGATED inside a BroadcastExchange
    subtree — the plan class that cannot survive scale-up (a broadcast
    side that grows with the corpus; round-7 finding, see SCALE.md).
    Aggregated subtrees are excluded: their build sides sit behind a
    shuffle stage, so AQE re-decides the join from ACTUAL sizes and
    demotes the broadcast once the frame outgrows the threshold."""
    tree, _, details = plan.partition("\n\n")
    blocks = _detail_blocks(details)
    lines = tree.split("\n")
    found = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = _tree_depth(ln)
        sub = []
        for j in range(i + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if 0 <= dj <= d:
                break
            sub.append(lines[j])
        subtxt = "\n".join(sub)
        if "Aggregate" in subtxt:
            continue
        for m in re.finditer(r"Scan parquet\s*\((\d+)\)", subtxt):
            block = blocks.get(m.group(1), "")
            loc = re.search(r"Location.*?(\w+\.parquet)", block, re.S)
            if loc and loc.group(1) in FACTS:
                found.append(loc.group(1))
    return found


def _final_plan(df) -> str:
    """Execute ``df`` (wrapped in an ungrouped count so nothing large is
    collected) and return the FINAL adaptive plan string. The count agg
    sits above the query's own tree, so every join/exchange decision below
    it is the one AQE actually took."""
    dfc = df.groupBy().count()
    dfc.collect()
    txt = dfc._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints the final tree first, then the initial plan
    return txt.split("== Initial Plan ==")[0]


def runtime_broadcast_findings(final_txt: str) -> list[dict]:
    """Census BroadcastExchange subtrees of a final adaptive plan string.

    Returns one record per broadcast subtree: which fact files its scans
    touch (FileScan simpleStrings carry the truncated Location inline),
    whether it reads a checkpoint (``Scan ExistingRDD``), and whether any
    aggregate sits between the broadcast and its sources."""
    lines = final_txt.split("\n")
    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln or "ReusedExchange" in ln:
            continue
        d = _tree_depth(ln)
        sub = []
        for j in range(i + 1, len(lines)):
            dj = _tree_depth(lines[j])
            if 0 <= dj <= d:
                break
            sub.append(lines[j])
        subtxt = "\n".join(sub)
        out.append(
            {
                "facts": sorted({f for f in FACTS if f in subtxt}),
                "existing_rdd": "Scan ExistingRDD" in subtxt,
                "aggregated": "Aggregate" in subtxt,
            }
        )
    return out


def runtime_audit(spark, sf_dir: str, names: list[str] | None = None) -> list[dict]:
    rows = []
    for name, fn in queries().items():
        if names and name not in names:
            continue
        try:
            final = _final_plan(fn(spark, sf_dir))
            bx = runtime_broadcast_findings(final)
            bad = []
            if "CartesianProduct" in final:
                bad.append("cartesian")
            rows.append(
                {
                    "query": name,
                    "bx": bx,
                    "bad": bad,
                    # fact files seen inside broadcast subtrees, with
                    # whether an aggregate bounds them (raw = the class
                    # the static census forbids when planned statically)
                    "fact_bx": sorted(
                        {
                            (f, b["aggregated"])
                            for b in bx
                            for f in b["facts"]
                        }
                    ),
                }
            )
        except Exception as exc:
            rows.append({"query": name, "error": str(exc)[:160], "bad": ["error"]})
    return rows


def runtime_main(sf_dir: str, out_md: str, names: list[str] | None = None) -> None:
    spark = get_spark("plan_audit_runtime")
    # r9-ADVICE fix: runtime_broadcast_findings substring-matches fact
    # filenames against the final plan's toString(), but FileScan
    # simpleStrings truncate each metadata entry (incl. Location) at
    # spark.sql.maxMetadataStringLength (default 100 chars) — a long
    # sf_dir path could silently drop the filename and under-report the
    # fact-in-bx column. Raise it so Location always reaches the filename.
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    rows = runtime_audit(spark, sf_dir, names)
    bad = [r for r in rows if r.get("bad")]
    n_bx = sum(len(r.get("bx", [])) for r in rows)
    n_ck = sum(
        1 for r in rows for b in r.get("bx", []) if b["existing_rdd"]
    )
    lines = [
        "# PLANS_RUNTIME — final-adaptive-plan census "
        "(auto-generated by tools/plan_audit.py --runtime)",
        "",
        f"Executed {len(rows)} registered queries at {sf_dir}; censused the",
        "FINAL adaptive plan of each (the plan AQE actually ran, where",
        "runtime size-based broadcast promotion and checkpoint-laundered",
        "lineage are visible — the static census in PLANS.md cannot see",
        "either). This is an OBSERVABILITY ledger: every broadcast here was",
        "promoted by AQE from the materialized stage's ACTUAL bytes at this",
        "SF and self-demotes at real scale; pinned shapes are enforced by",
        "per-query guards in tests/test_plans.py, estimate-driven static",
        "broadcasts by the static census. The only runtime FAILURE is a",
        "CartesianProduct. Columns: broadcast-subtree count, how many read",
        "a checkpoint (Scan ExistingRDD — lineage the static census cannot",
        "attribute), and fact files inside broadcast subtrees with (agg) /",
        "(raw) marking whether an aggregate bounds them.",
        "",
        f"Totals: {n_bx} broadcast subtrees; {n_ck} over checkpoints.",
        "",
        "| query | broadcasts | checkpoint-bx | fact-in-bx | FAIL |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['query']} | RUN ERROR: {r['error']} | | | error |")
            continue
        lines.append(
            "| {q} | {n} | {ck} | {fb} | {bad} |".format(
                q=r["query"],
                n=len(r["bx"]),
                ck=sum(1 for b in r["bx"] if b["existing_rdd"]),
                fb=", ".join(
                    f"{f} ({'agg' if agg else 'raw'})"
                    for f, agg in r["fact_bx"]
                ),
                bad=", ".join(r["bad"]),
            )
        )
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(
        f"wrote {out_md}: {len(rows)} queries executed, "
        f"failures: {[r['query'] for r in bad]}"
    )
    sys.exit(1 if bad else 0)


def audit(spark, sf_dir: str) -> list[dict]:
    rows = []
    for name, fn in queries().items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            row = {"query": name}
            for label, pat in NODES:
                row[label] = len(re.findall(pat, plan))
            row["pushed"] = bool(
                re.search(r"PushedFilters: \[[^\]]", plan)
            )
            fb = sorted(set(raw_fact_broadcasts(plan)))
            allowed = BOUNDED_BY_DESIGN.get(name, frozenset())
            row["fact_bx"] = fb  # everything detected — PLANS.md shows it
            row["fact_bx_bad"] = [f for f in fb if f not in allowed]
            rows.append(row)
        except Exception as exc:  # plan build failed — that IS a finding
            rows.append({"query": name, "error": str(exc)[:120]})
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--runtime"]
    if "--runtime" in sys.argv[1:]:
        runtime_main(
            args[0] if args else "/root/testdata/sf0.001",
            args[1] if len(args) > 1 else "PLANS_RUNTIME.md",
            args[2:] or None,  # optional query-name filter: a targeted
            # runtime census (e.g. one query at x10) without a full sweep
        )
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    spark = get_spark("plan_audit")
    rows = audit(spark, sf_dir)

    lines = [
        "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)",
        "",
        "Node counts per registered query at sf0.001 (plan compilation only).",
        "Columns: shuffles (Exchange, incl. the loader's small-file spread",
        "repartition), join strategies (BHJ broadcast-hash / SMJ sort-merge /",
        "SHJ shuffled-hash / BNLJ broadcast-nested-loop — BNLJ appears only",
        "for broadcast crossJoins against constant-size frames), Window /",
        "Expand operators, parquet scans, and whether any predicate reached",
        "a scan (pushed). CartesianProduct anywhere fails the audit, as",
        "does any BroadcastExchange subtree scanning a fact table",
        "unaggregated (a broadcast side that grows with the corpus —",
        "round-7 rule). fact_bx lists EVERYTHING detected; entries marked",
        "(by-design) are the individually audited bounded-by-design",
        "(query, fact) pairs from tools/plan_audit.py::BOUNDED_BY_DESIGN —",
        "only unmarked entries fail the audit.",
        "",
        "| query | Exchange | BHJ | SMJ | SHJ | BNLJ | Window | Expand | Scan | pushed | fact_bx |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    bad = []
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['query']} | PLAN ERROR: {r['error']} |" + " |" * 9)
            bad.append(r["query"])
            continue
        if r["CARTESIAN"]:
            bad.append(r["query"])
        if r.get("fact_bx_bad"):
            bad.append(f"{r['query']} (fact broadcast: {r['fact_bx_bad']})")
        fb_cell = ", ".join(
            f if f in r["fact_bx_bad"] else f"{f} (by-design)"
            for f in r["fact_bx"]
        )
        lines.append(
            "| {query} | {Exchange} | {BHJ} | {SMJ} | {SHJ} | {BNLJ} | "
            "{Window} | {Expand} | {Scan} | {p} | {fb} |".format(
                **r, p="y" if r["pushed"] else "", fb=fb_cell
            )
        )
    ok = [r for r in rows if "error" not in r]
    lines += [
        "",
        f"Totals: {len(rows)} queries; "
        f"{sum(r['Exchange'] for r in ok)} exchanges; "
        f"{sum(r['BHJ'] for r in ok)} broadcast-hash joins; "
        f"{sum(r['SMJ'] for r in ok)} sort-merge joins; "
        f"{sum(r['CARTESIAN'] for r in ok)} cartesian products (must be 0).",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}: {len(rows)} queries, cartesian/errors: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

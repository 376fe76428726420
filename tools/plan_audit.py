"""Scale audit: capture explain(formatted) for every registered query and
flag plan shapes that would not survive a 100x scale-up.

Red flags:
  - BroadcastExchange fed (transitively) by a scan of an sf-scaled table
    (customer/orders/lineitem/part/supplier/events/documents/embeddings) with
    no reducing aggregation between scan and exchange
  - CartesianProduct / BroadcastNestedLoopJoin anywhere
  - BatchEvalPython (row-at-a-time Python UDF) anywhere

Usage: python tools/plan_audit.py [sf_dir]  (default /root/testdata/sf0.001)
Writes PLAN_AUDIT.md at the repo root.
"""
from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

SF_SCALED = {
    "customer", "orders", "lineitem", "part", "supplier",
    "events", "documents", "embeddings",
}
DIMS = {"nation", "region"}

# Queries whose BroadcastNestedLoopJoin is the intended plan: the broadcast
# side is O(1)-sized regardless of scale factor (a single query vector or a
# fixed literal interval dim), which is the standard Spark shape for probe
# joins and small range joins.
BNLJ_OK = {
    "embedding_cosine_neighbors": "broadcasts one query vector (1 row)",
    "embedding_knn_topk": "broadcasts one query vector (1 row)",
    "interval_containment_groups": "broadcasts a fixed 5-row interval dim (range join)",
    "embedding_ivf_topk": "broadcasts the fixed centroid set (16 rows) for the argmax assignment",
    # NOTE: semantic_dedup is intentionally NOT allowlisted — it assigns
    # via mapInPandas now; a BNLJ reappearing there is the measured 19x
    # quadratic regressing and must flag loudly.
    "bigram_lm_score": "broadcasts the 1-row vocabulary-size scalar (V) of the reference LM",
    "dsir_selection": "broadcasts the two 1-row feature-total scalars (Np, Nq); the bucket-count sides are <=4096-row BroadcastHashJoins",
    "dsir_threshold_select": "broadcasts the 1-row histogram threshold plus the cached importance pipeline's 1-row Np/Nq scalars (weights persisted, computed once)",
    "histogram_threshold_refined": "broadcasts the 1-row refined threshold onto the value relation (crossJoin of a scalar)",
    # NOTE: nb_lang_classify is intentionally NOT allowlisted — the
    # pivoted wide model keeps its plan BNLJ-free; a BNLJ reappearing
    # there is the measured occurrence x label fan-out regressing.
}


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_plan(text: str) -> list[str]:
    flags = []
    if "CartesianProduct" in text:
        flags.append("CartesianProduct")
    if "BroadcastNestedLoopJoin" in text:
        flags.append("BroadcastNestedLoopJoin")
    if "BatchEvalPython" in text:
        flags.append("BatchEvalPython (row-at-a-time UDF)")

    # Broadcast of an sf-scaled relation: walk the formatted-plan operator
    # tree; a BroadcastExchange is suspect when some descendant scans an
    # sf-scaled parquet file and no HashAggregate sits in between on that
    # path (an aggregate bounds the broadcast size by cardinality of keys,
    # which may still scale — flag those separately as "agg-gated").
    # The formatted plan lists operators as "(id) OpName ..." with a tree
    # section first; we approximate by scanning the tree section lines.
    tree = text.split("\n\n")[0].splitlines()
    # Depth = indentation position of the operator glyph.
    ops = []  # (depth, name)
    for ln in tree:
        m = re.search(r"([+:*-]-?|\s)\(\d+\)\s+(\S+)", ln)
        if not m:
            continue
        depth = ln.index("(")
        ops.append((depth, m.group(2), ln))
    for i, (d, name, ln) in enumerate(ops):
        if not name.startswith("BroadcastExchange"):
            continue
        # children: subsequent ops with depth > d until depth <= d
        sub = []
        for d2, n2, l2 in ops[i + 1:]:
            if d2 <= d:
                break
            sub.append((n2, l2))
        scans = [
            l2 for n2, l2 in sub
            if "Scan" in n2 and any(t in l2 for t in SF_SCALED)
        ]
        has_agg = any("Aggregate" in n2 or "Deduplicate" in n2 for n2, _ in sub)
        if scans and not has_agg:
            flags.append(f"BroadcastExchange over sf-scaled scan: {scans[0].strip()[:110]}")
        elif scans and has_agg:
            flags.append(f"agg-gated broadcast of sf-scaled scan (check key cardinality): {scans[0].strip()[:90]}")
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from biocache_store_spark.session import get_spark
    from biocache_store_spark.queries import load_all

    spark = get_spark()
    rows = []
    for name, q in sorted(load_all().items()):
        try:
            df = q.spark_fn(spark, sf_dir)
            plan = fmt_plan(df)
            flags = audit_plan(plan)
        except Exception as exc:  # pragma: no cover - audit tool
            flags = [f"EXPLAIN FAILED: {exc}"]
            plan = ""
        if name in BNLJ_OK:
            flags = [
                f if "BroadcastNestedLoopJoin" not in f
                else f"BNLJ (accepted: {BNLJ_OK[name]})"
                for f in flags
            ]
        rows.append((name, flags, plan))
        status = "OK" if not flags else "; ".join(flags)
        print(f"{name:40s} {status}")

    with open("PLAN_AUDIT.md", "w") as fh:
        fh.write("# Plan audit (explain-formatted scan, auto-generated)\n\n")
        fh.write(f"sf_dir: `{sf_dir}`\n\n")
        fh.write("| query | flags |\n|---|---|\n")
        for name, flags, _ in rows:
            fh.write(f"| {name} | {'; '.join(flags) if flags else 'clean'} |\n")
    flagged = [r for r in rows if r[1]]
    print(f"\n{len(flagged)}/{len(rows)} queries flagged")


if __name__ == "__main__":
    main()

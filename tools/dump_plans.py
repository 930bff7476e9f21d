#!/usr/bin/env python
"""Dump physical plans for key queries → PLANS.md (evidence that filters
push down, joins broadcast, and codegen spans are wide)."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
PICK = [
    "q01_pricing_summary",
    "q02_revenue_topk",
    "q04_topk_per_group",
    "q10_semi_join",
    "q18_cosine_topk",
    "q31_fused_centroids",
    "q35_incident_scores",
    "q36_emission_caps",
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from pelinker_spark.operators.relational import QUERIES
    from pelinker_spark.session import get_spark

    spark = get_spark("plans", cores=4, shuffle_partitions=4)
    out = ["# PLANS — physical plan evidence (sf0.01)", ""]
    for name in PICK:
        p = plan_of(QUERIES[name](spark, SF))
        out += [f"## {name}", "```", p.strip()[:4000], "```", ""]

    # pipeline mention stage: show it is scan → project/generate (no shuffle)
    from pelinker_spark.mentions import generate_mentions
    from pelinker_spark.synth import web_pages

    pages = web_pages(spark, 100, seed=42, partitions=2)
    m = generate_mentions(pages.select("url", "text", "lang"))
    out += ["## mention generation (narrow, no shuffle)", "```",
            plan_of(m).strip()[:3000], "```", ""]

    # compact-channel blocking: the |surfaces| side must be probed by a
    # BROADCAST semi join, never shuffled whole (round-2 rewrite)

    from pelinker_spark.blocking import compact_key_pairs
    from pelinker_spark.pipeline import surface_table

    surfaces = surface_table(m).persist()
    surfaces.count()
    out += ["## compact_key_pairs (broadcast semi probe of the big side)",
            "```", plan_of(compact_key_pairs(surfaces)).strip()[:3500], "```", ""]

    # cluster assignment: mentions left-join the SMALL edge-key component
    # map (broadcast under AQE) + coalesce — not a join on all surfaces

    from pelinker_spark.pipeline import LinkConfig, link_pipeline

    res = link_pipeline(spark, pages, cfg=LinkConfig())
    out += ["## cluster assignment (small component map joined onto mentions)",
            "```", plan_of(res.clusters).strip()[:3500], "```", ""]

    # KB validation: the full cluster output joins two KB-derived dims
    # (lemma index, label patterns) — BOTH must broadcast (the dims are
    # |KB|-sized; the probe side is |mentions|-sized and must not shuffle)
    from pelinker_spark.kb import validate_kb_anchors
    from pelinker_spark.synth import kb_table

    kb = kb_table(spark, n_entities=50)
    res_kb = link_pipeline(spark, pages, kb=kb, cfg=LinkConfig())
    vplan = plan_of(validate_kb_anchors(res_kb.clusters, kb))
    # the two OUTERMOST joins are validate_kb_anchors' own (lemma-key dim,
    # then label-pattern dim); everything below them is cluster lineage.
    # Evidence = both are BroadcastHashJoin and no SortMergeJoin anywhere
    # touches the mention-sized probe side.
    top = "\n".join(vplan.splitlines()[:10])
    n_top_bc = top.count("BroadcastHashJoin")
    out += [
        "## validate_kb_anchors (KB dims broadcast onto the cluster output)",
        f"Outermost joins (the two validation joins): {n_top_bc} "
        "BroadcastHashJoin, 0 SortMergeJoin — the KB lemma-key dim and "
        "label-pattern dim broadcast onto the mention-sized probe side.",
        "```", vplan.strip()[:3500], "```", ""]
    assert n_top_bc >= 2, "KB validation dims not broadcast"
    assert "SortMergeJoin" not in top, "KB validation join shuffled"
    res_kb.unpersist()
    res.unpersist()

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()

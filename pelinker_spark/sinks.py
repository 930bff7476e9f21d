"""Output sinks and named output projections.

S10 (reference _write_mention_anomaly, pelinker/cli/link_files.py:41-60):
diagnostics dump dispatched on the path extension — parquet / csv / jsonl.

P7 (reference Linker.to_dict public-vs-debug modes, pelinker/model.py:
415-465): two NAMED projections of the link result — the public one is
the stable user-facing schema; the debug one adds the scoring internals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PUBLIC_COLUMNS = [
    "url", "mention", "key", "wg", "a_abs", "b_abs", "cluster_id",
    "link_score", "exact_key",
]
DEBUG_EXTRA_COLUMNS = ["itext", "ichunk", "a", "b"]


def write_by_extension(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """S10: write df as parquet / csv (with header) / jsonl, chosen by the
    path extension (reference link_files.py:41-60). Returns the format
    used. Unknown extensions default to parquet (the engine's canonical
    columnar sink)."""
    lower = path.lower()
    if lower.endswith(".csv"):
        df.write.mode(mode).option("header", "true").csv(path)
        return "csv"
    if lower.endswith((".jsonl", ".json")):
        df.write.mode(mode).json(path)
        return "json"
    df.write.mode(mode).parquet(path)
    return "parquet"


def public_projection(clusters: DataFrame) -> DataFrame:
    """P7 public mode: the stable output schema a consumer of the linker
    sees — mention identity, span, cluster id, plus the KB anchor when the
    run had a KB."""
    cols = [c for c in PUBLIC_COLUMNS if c in clusters.columns]
    for c in ("kb_entity_id", "kb_label", "kb_label_valid"):
        # present only when the run had a KB (and ran validation)
        if c in clusters.columns:
            cols.append(c)
    return clusters.select(*cols)


def debug_projection(clusters: DataFrame) -> DataFrame:
    """P7 debug mode: public columns plus the positional/scoring internals
    (sentence-local spans, chunk indices) for diagnostics."""
    pub = [c for c in PUBLIC_COLUMNS if c in clusters.columns]
    for c in ("kb_entity_id", "kb_label", "kb_label_valid"):
        if c in clusters.columns:
            pub.append(c)
    extra = [
        c
        for c in (*DEBUG_EXTRA_COLUMNS, "kb_lemma_entity_id")
        if c in clusters.columns
    ]
    return clusters.select(*pub, *extra)


def minmax_normalize(
    df: DataFrame, col: str, out_col: str | None = None
) -> DataFrame:
    """F11: min-max [0,1] over finite values of a column (reference
    clustering_grid.py:138-150): constant columns normalize to 1.0,
    non-finite values pass through as null. One global agg broadcast back
    — no per-row shuffle."""
    out_col = out_col or f"{col}_minmax"
    finite = F.col(col).isNotNull() & ~F.isnan(col)
    stats = df.agg(
        F.min(F.when(finite, F.col(col))).alias("__lo"),
        F.max(F.when(finite, F.col(col))).alias("__hi"),
    )
    j = df.crossJoin(F.broadcast(stats))
    norm = F.when(~finite, F.lit(None).cast("double")).otherwise(
        F.when(
            (F.col("__hi") - F.col("__lo")) <= F.lit(1e-12), F.lit(1.0)
        ).otherwise(
            (F.col(col) - F.col("__lo")) / (F.col("__hi") - F.col("__lo"))
        )
    )
    return j.withColumn(out_col, norm).drop("__lo", "__hi")

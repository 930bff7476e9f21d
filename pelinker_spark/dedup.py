"""Document deduplication operators — the large-scale training-data
channels, each a reusable DataFrame function (the oracle-checked query
forms live in operators/relational.py q16/q17/q22/q26/q27).

All channels share the engine's determinism discipline: hashes are
content-derived (md5/xxhash64), never RNG; every function is a pure plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocking import minhash_signatures_agg


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Channel 1 — exact: md5 fingerprint groups with a canonical keeper
    (min id). Returns (fp, n, keep_id)."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("fp")).agg(
        F.count("*").alias("n"), F.min(id_col).alias("keep_id")
    )


def minhash_lsh_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    rows: int = 3,
    shingle: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """Channel 2 — MinHash-LSH near-dup candidates: char-shingle minhash
    (explode → scalar hash → min() aggregates, the codegen-friendly form),
    banded buckets, hot buckets dropped. Returns (id_a, id_b, band)."""
    sig = minhash_signatures_agg(
        docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("key")),
        "key",
        num_hashes,
        n=shingle,
    ).join(
        docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("key")),
        "key",
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(":", *[F.col(f"mh{b * rows + r}") for r in range(rows)]),
                F.lit(b),
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    bucketed = sig.select(
        "__id", F.explode(F.array(*band_structs)).alias("bnd")
    ).select("__id", "bnd.band", "bnd.bh")
    sizes = bucketed.groupBy("band", "bh").agg(F.count("*").alias("bn"))
    bucketed = bucketed.join(
        sizes.where(F.col("bn") <= max_bucket).select("band", "bh"),
        ["band", "bh"],
        "left_semi",
    )
    a = bucketed.select("band", "bh", F.col("__id").alias("id_a"))
    b = bucketed.select("band", "bh", F.col("__id").alias("id_b"))
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "band")
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """Channel 3 — SimHash: per-token hash bits vote ±1, sign of each bit
    sum forms the fingerprint. Explode → scalar hash → conditional-sum
    aggregates (partial-agg friendly). Returns (id, simhash)."""
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("t"),
    ).select("__id", F.shiftrightunsigned(F.xxhash64("t"), 16).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("__id").agg(*bit_sums)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select(F.col("__id").alias(id_col), fp.alias("simhash"))


def simhash_dup_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", bits: int = 32,
                      max_hamming: int = 3,
                      max_segment: int = 1000) -> DataFrame:
    """SimHash near-dup pairs: block on fingerprint segments (a pair
    within hamming distance d must agree on at least one of d+1 segments —
    pigeonhole), verify hamming distance exactly with bit_count.

    Stop-segment discipline (VERDICT r1): a segment value shared by more
    than max_segment fingerprints (e.g. the near-zero segments short docs
    collapse to) is dropped whole from candidate generation — same hash-
    aggregate + semi-join cap as the MinHash channel, so a degenerate
    segment can't go quadratic. A true near-dup pair loses candidacy only
    if EVERY segment it agrees on is hot — at that point the segment
    carries no discriminating information and the pair belongs to the
    exact-dup channel anyway."""
    fps = simhash_fingerprints(docs, text_col, id_col, bits).persist()
    segs = max_hamming + 1
    seg_bits = bits // segs
    seg_cols = [
        (
            F.shiftright(F.col("simhash"), i * seg_bits)
            % F.lit(1 << seg_bits)
        ).alias(f"seg{i}")
        for i in range(segs)
    ]
    keyed = fps.select(id_col, "simhash", *seg_cols)
    pairs = None
    for i in range(segs):
        a = keyed.select(
            F.col(id_col).alias("id_a"),
            F.col("simhash").alias("sh_a"),
            F.col(f"seg{i}").alias("sk"),
        )
        b = keyed.select(
            F.col(id_col).alias("id_b"),
            F.col("simhash").alias("sh_b"),
            F.col(f"seg{i}").alias("sk"),
        )
        sizes = a.groupBy("sk").agg(F.count("*").alias("sn"))
        a = a.join(
            sizes.where(F.col("sn") <= max_segment).select("sk"),
            "sk",
            "left_semi",
        )
        p = a.join(b, "sk").where(F.col("id_a") < F.col("id_b")).drop("sk")
        pairs = p if pairs is None else pairs.unionByName(p)
    out = (
        pairs.dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("sh_a").bitwiseXOR(F.col("sh_b"))
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return out


def token_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        threshold: float = 0.8,
                        max_df: int | None = 10000) -> DataFrame:
    """Channel 4 — token Jaccard via token inverted index: explode
    distinct tokens, self-join on token, count intersections,
    |A∪B| = |A|+|B|-|A∩B|. Returns (id_a, id_b, jaccard).

    Document-frequency cap (VERDICT r1): tokens appearing in more than
    max_df documents are stop-tokens — their posting list is
    O(|corpus|) and the self-join on it is quadratic. They are removed
    from the token UNIVERSE (both the index and the size counts), so the
    reported jaccard is exact over the filtered vocabulary; on a corpus
    where no token exceeds the cap the output is bit-identical to the
    uncapped form (tested). Pass max_df=None for the uncapped exact
    channel (small data / oracle use only)."""
    tok = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), r"\s+"))).alias("t"),
    )
    if max_df is not None:
        dfreq = tok.groupBy("t").agg(F.count("*").alias("df"))
        tok = tok.join(
            dfreq.where(F.col("df") <= max_df).select("t"), "t", "left_semi"
        )
    sz = tok.groupBy("__id").agg(F.count("*").alias("n"))
    a = tok.withColumnRenamed("__id", "id_a")
    b = tok.withColumnRenamed("__id", "id_b")
    inter = (
        a.join(b, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sz.select(F.col("__id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sz.select(F.col("__id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_dup_pairs(embeddings: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        threshold: float = 0.9) -> DataFrame:
    """Channel 5 — embedding-cosine near-dups over integer-quantized
    vectors (exact, order-independent). Brute-force long-format join —
    for the scale path compose with similarity.lsh_buckets first."""
    lf = embeddings.select(
        F.col(id_col).alias("__id"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).select(
        "__id", "pos", F.round(F.col("v") * 1000000.0).cast("long").alias("iv")
    )
    a = lf.select(F.col("__id").alias("id_a"), "pos", F.col("iv").alias("xa"))
    b = lf.select(F.col("__id").alias("id_b"), "pos", F.col("iv").alias("xb"))
    dot = (
        a.join(b, "pos")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("xa") * F.col("xb")).cast("double").alias("dot"))
    )
    nrm = lf.groupBy("__id").agg(
        F.sqrt(F.sum(F.col("iv") * F.col("iv")).cast("double")).alias("nrm")
    )
    return (
        dot.join(nrm.select(F.col("__id").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(nrm.select(F.col("__id").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .withColumn("cos_sim", F.col("dot") / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_dup_pairs_lsh(
    embeddings: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_planes: int = 6,
    n_tables: int = 4,
    max_bucket: int = 2000,
) -> DataFrame:
    """Channel 5, scale path — the LSH-bucketed composition the
    brute-force docstring promises (VERDICT r1): random-hyperplane buckets
    (similarity.hyperplane_bucket) generate candidates within same-bucket
    groups across n_tables tables, hot buckets are dropped whole (same
    stop-bucket cap as the MinHash channel), then candidates are verified
    with the same integer-quantized exact cosine as embedding_dup_pairs —
    so every emitted pair is exact; only recall is probabilistic
    (union over tables drives it up). One shuffle per table on the bucket
    key; never an all-pairs join."""
    from .similarity import hyperplane_bucket

    base = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        *[
            hyperplane_bucket(F.col(vec_col), dim, n_planes, f"t{t}").alias(f"b{t}")
            for t in range(n_tables)
        ],
    ).persist()
    cand = None
    for t in range(n_tables):
        kt = base.select("__id", F.col(f"b{t}").alias("bk"))
        sizes = kt.groupBy("bk").agg(F.count("*").alias("bn"))
        kt = kt.join(
            sizes.where(F.col("bn") <= max_bucket).select("bk"), "bk", "left_semi"
        )
        p = (
            kt.select(F.col("__id").alias("id_a"), "bk")
            .join(kt.select(F.col("__id").alias("id_b"), "bk"), "bk")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.dropDuplicates(["id_a", "id_b"])

    # exact verification with the integer-quantized cosine (determinism
    # discipline shared with embedding_dup_pairs)
    quant = base.select(
        "__id",
        F.transform(
            "__v", lambda v: F.round(v * 1000000.0).cast("long")
        ).alias("iv"),
    )
    dot = F.aggregate(
        F.zip_with("iv_a", "iv_b", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).cast("double")
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda v: v * v),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
    )
    out = (
        cand.join(quant.select(F.col("__id").alias("id_a"), F.col("iv").alias("iv_a")), "id_a")
        .join(quant.select(F.col("__id").alias("id_b"), F.col("iv").alias("iv_b")), "id_b")
        .withColumn("cos_sim", dot / (nrm(F.col("iv_a")) * nrm(F.col("iv_b"))))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
    return out

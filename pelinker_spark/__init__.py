"""pelinker_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the capabilities of the reference system (growgraph/pelinker,
surveyed in SURVEY.md) as an idiomatic Spark DataFrame pipeline:

    web pages (url, warc_ts, html, text, lang)
      → byte-identical text extraction           (extract.py)
      → mention candidate generation             (mentions.py)
      → blocking (surface keys + MinHash-LSH)    (blocking.py)
      → pairwise scoring (cosine, Jaro-Winkler)  (scoring.py)
      → transitive clustering (hash-min CC)      (cc.py)
      → cluster reporting + pairwise-F1 metrics  (metrics.py)

All stages are pure DataFrame-composing functions; Python appears only in
Arrow-batched pandas UDFs (never per-row Python UDFs).
"""

__version__ = "0.1.0"

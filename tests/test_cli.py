"""End-to-end smoke of the spark-submit entrypoint (run_link_job.main):
arg wiring for --min-link-score / --kb-validate / --output-mode, output
parquet round-trip, and the one-line JSON report."""

from __future__ import annotations

import importlib.util
import json
import sys

import pandas as pd


def _load_cli():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_link_job", os.path.join(repo, "run_link_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cli_end_to_end(spark, tmp_path, capsys, monkeypatch):
    from pelinker_spark.synth import web_pages

    pages_dir = str(tmp_path / "pages")
    kb_dir = str(tmp_path / "kb")
    out_dir = str(tmp_path / "out")
    web_pages(spark, 300, seed=42, n_entities=30, partitions=4).write.parquet(
        pages_dir
    )
    spark.createDataFrame(
        pd.DataFrame(
            {"entity_id": ["E1", "E2"], "label": ["spark", "window function"]}
        )
    ).write.parquet(kb_dir)

    cli = _load_cli()
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "run_link_job.py",
            "--input", pages_dir,
            "--output", out_dir,
            "--kb", kb_dir,
            "--kb-validate",
            "--min-link-score", "0.5",
            "--output-mode", "debug",
        ],
    )
    cli.main()

    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows"] > 0
    assert report["config"]["cos_threshold"] == 0.90

    out = spark.read.parquet(out_dir)
    cols = set(out.columns)
    # debug projection with KB validation columns present
    for c in ("url", "mention", "key", "cluster_id", "link_score",
              "exact_key", "kb_entity_id", "kb_label", "kb_label_valid",
              "kb_lemma_entity_id", "itext"):
        assert c in cols, c
    # the score filter held
    assert out.where(out.link_score < 0.5).count() == 0
    assert report["rows"] == out.count()

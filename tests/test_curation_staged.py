"""Staged curation (VERDICT r2 task 6): the persisted, resumable stage
materialization must admit exactly what the lazy `curate` plan admits,
and resume after a kill without recomputing committed stages."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.plans.curation import (
    STAGES,
    curate,
    curate_staged,
)
from asid_v2_data_pipeline_spark.schemas import load_table

SF = "/root/testdata/sf0.001"
WEIGHTS = {"en": 2.0, "de": 1.0, "fr": 0.5}


def _inputs(spark):
    d = load_table(spark, SF, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    return corpus, bench


def _result_set(df):
    return sorted(
        (r["doc_id"], r["lang"], r["source"], r["epoch"])
        for r in df.select("doc_id", "lang", "source", "epoch").collect()
    )


def test_staged_equals_lazy(spark, tmp_path):
    corpus, bench = _inputs(spark)
    lazy = _result_set(curate(corpus, bench, WEIGHTS))
    staged = curate_staged(corpus, bench, WEIGHTS, str(tmp_path / "stages"))
    assert _result_set(staged) == lazy
    # every stage committed
    for s in STAGES:
        assert os.path.exists(tmp_path / "stages" / s / "_SUCCESS"), s


def test_resume_after_kill(spark, tmp_path):
    corpus, bench = _inputs(spark)
    stage_dir = tmp_path / "stages"
    full = _result_set(curate_staged(corpus, bench, WEIGHTS, str(stage_dir)))

    # record the committed early-stage files, then simulate a kill during
    # the 'clean' stage: its _SUCCESS never landed, later stages missing
    quality_files = sorted(os.listdir(stage_dir / "quality"))
    quality_mtimes = {
        f: os.path.getmtime(stage_dir / "quality" / f) for f in quality_files
    }
    os.remove(stage_dir / "clean" / "_SUCCESS")  # partial write
    shutil.rmtree(stage_dir / "mixed")

    resumed = _result_set(
        curate_staged(corpus, bench, WEIGHTS, str(stage_dir))
    )
    assert resumed == full  # identical admitted set + epochs

    # committed stages were NOT recomputed (same files, same mtimes)
    assert sorted(os.listdir(stage_dir / "quality")) == quality_files
    for f in quality_files:
        assert os.path.getmtime(stage_dir / "quality" / f) == quality_mtimes[f]
    # the killed stage was recommitted
    assert os.path.exists(stage_dir / "clean" / "_SUCCESS")
    assert os.path.exists(stage_dir / "mixed" / "_SUCCESS")


def test_v2_staged_equals_lazy_and_resumes(spark, tmp_path):
    """The staged v2 chain (classifier gate + span rewrite + fuzzy
    decontam stages persisted) admits exactly what the lazy curate_v2
    plan admits, and a kill during 'clean' resumes without recomputing
    the committed 'rewritten' stage."""
    from asid_v2_data_pipeline_spark.functions.classifier import lcg_weights
    from asid_v2_data_pipeline_spark.plans.curation import (
        STAGES_V2,
        curate_v2,
        curate_v2_staged,
    )

    d = load_table(spark, SF, "documents")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    w = lcg_weights(64, seed=17)
    kw = dict(clf_bias=0.1, clf_min=0.5249, fuzzy_jaccard=0.4)

    lazy_df = curate_v2(corpus, bench, WEIGHTS, w, **kw)
    lazy = _result_set(lazy_df)
    stage_dir = tmp_path / "v2stages"
    staged = curate_v2_staged(
        corpus, bench, WEIGHTS, w, str(stage_dir), **kw
    )
    assert _result_set(staged) == lazy and len(lazy) > 0
    # the two documented-as-equivalent paths agree on SCHEMA, not just
    # the admitted set (ADVICE r12: staged used to leak text + extras)
    assert sorted(staged.columns) == sorted(lazy_df.columns)
    assert sorted(lazy_df.columns) == ["doc_id", "epoch", "lang", "source"]
    for s in STAGES_V2:
        assert os.path.exists(stage_dir / s / "_SUCCESS"), s

    rewritten_files = sorted(os.listdir(stage_dir / "rewritten"))
    rewritten_mtimes = {
        f: os.path.getmtime(stage_dir / "rewritten" / f)
        for f in rewritten_files
    }
    os.remove(stage_dir / "clean" / "_SUCCESS")
    shutil.rmtree(stage_dir / "mixed")
    resumed = _result_set(
        curate_v2_staged(corpus, bench, WEIGHTS, w, str(stage_dir), **kw)
    )
    assert resumed == lazy
    assert sorted(os.listdir(stage_dir / "rewritten")) == rewritten_files
    for f in rewritten_files:
        assert (
            os.path.getmtime(stage_dir / "rewritten" / f)
            == rewritten_mtimes[f]
        )

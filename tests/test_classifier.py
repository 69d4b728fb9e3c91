"""Hashed-BOW logistic classifier: training separates planted labels,
scoring is a zero-shuffle narrow map."""

from pyspark.sql import functions as F

from asid_v2_data_pipeline_spark.functions.classifier import (
    lcg_weights,
    score_documents,
    train_hashed_logreg,
)


def _planted(spark):
    pos = [(i, "excellent insightful educational rigorous analysis " * 3, 1) for i in range(40)]
    neg = [(100 + i, "click here buy now cheap deal spam offer " * 3, 0) for i in range(40)]
    return spark.createDataFrame(
        pos + neg, "doc_id long, text string, label int"
    )


def test_training_separates_planted_labels(spark):
    d = _planted(spark)
    w, b = train_hashed_logreg(d, "text", "label", dim=64, steps=8, lr=4.0)
    scored = score_documents(d, "text", w, b)
    rows = scored.select("label", "clf_score").collect()
    pos = [r["clf_score"] for r in rows if r["label"] == 1]
    neg = [r["clf_score"] for r in rows if r["label"] == 0]
    assert min(pos) > max(neg), (min(pos), max(neg))


def test_training_is_deterministic(spark):
    d = _planted(spark)
    w1, b1 = train_hashed_logreg(d, "text", "label", dim=32, steps=3)
    w2, b2 = train_hashed_logreg(d, "text", "label", dim=32, steps=3)
    assert w1 == w2 and b1 == b2


def test_scoring_plan_is_narrow(spark):
    """Scoring = ONE vectorized Arrow kernel in the scan stage (r13:
    functions/arrowhash.py::clf_token_sum, weights in the UDF closure):
    no Exchange of any kind (the pre-r13 broadcast weight row is gone
    too), no row-at-a-time BatchEvalPython, and the struct result is
    extracted from a single ArrowEvalPython — the optimizer must not
    duplicate the kernel across the s/n references (guide §4.4)."""
    d = _planted(spark)
    out = score_documents(d, "text", lcg_weights(64), 0.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_empty_text_scores_at_bias(spark):
    d = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = score_documents(d, "text", lcg_weights(16), bias=0.0).first()
    assert abs(r["clf_score"] - 0.5) < 1e-12


def test_hashed_bow_embedding_properties(spark):
    """Unit-norm, shuffle-invariant (BOW), near-dup > unrelated cosine,
    empty text -> zero vector."""
    from asid_v2_data_pipeline_spark.functions.doc_embed import (
        with_doc_embeddings,
    )

    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "zeta epsilon delta gamma beta alpha"),  # permutation
            (3, "alpha beta gamma delta epsilon eta"),  # one-token edit
            (4, "totally different words entirely here now"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    e = with_doc_embeddings(d, "text", dim=32)
    rows = {r["doc_id"]: list(r["embedding"]) for r in e.collect()}
    import math

    for i in (1, 2, 3, 4):
        assert abs(math.sqrt(sum(x * x for x in rows[i])) - 1.0) < 1e-12
    assert rows[1] == rows[2]  # order-invariant
    assert rows[5] == [0.0] * 32

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(rows[1], rows[3]) > 0.7 > cos(rows[1], rows[4])

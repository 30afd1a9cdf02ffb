"""Distributed logistic-regression text classifier
(`operators/textclf.py`): hashed-feature structure, GD parity against
an independent dense numpy implementation, and end-to-end train/score
on a planted two-class corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.textclf import (
    BIAS_IDX,
    hashed_features,
    score_logreg,
    train_logreg,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier


def test_hashed_features_structure(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the the"), (3, "")],
        ["doc_id", "text"],
    )
    rows = hashed_features(df, n_features=1 << 12).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 3 unigrams + 2 bigrams, all distinct → 5 rows of v=1
    assert sorted(r.v for r in by_doc[1]) == [1.0] * 5
    # doc 2: "the"x3 + "the the"x2 → 2 rows with counts 3 and 2
    assert sorted(r.v for r in by_doc[2]) == [2.0, 3.0]
    # empty doc contributes nothing
    assert 3 not in by_doc
    assert all(0 <= r.idx < (1 << 12) for r in rows)
    # deterministic across runs
    again = hashed_features(df, n_features=1 << 12).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _ref_logreg(feat_rows, label_rows, n_iter, lr, l2):
    """Independent dense GD with the same update rule."""
    idxs = sorted({r[1] for r in feat_rows})
    pos = {ix: i for i, ix in enumerate(idxs)}
    docs = sorted({r[0] for r in label_rows})
    dpos = {d: i for i, d in enumerate(docs)}
    X = np.zeros((len(docs), len(idxs)))
    for d, ix, v in feat_rows:
        X[dpos[d], pos[ix]] = v
    y = np.zeros(len(docs))
    for d, lab in label_rows:
        y[dpos[d]] = lab
    w = np.zeros(len(idxs))
    n = len(docs)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X.T @ (p - y) / n
        w = w * (1.0 - lr * l2) - lr * g
    return {ix: w[pos[ix]] for ix in idxs}


@pytest.mark.parametrize("l2", [0.0, 0.01])
def test_train_logreg_matches_dense_reference(spark, l2):
    feat_rows = [
        (0, 10, 2.0), (0, 11, 1.0), (0, BIAS_IDX, 1.0),
        (1, 10, 1.0), (1, 12, 3.0), (1, BIAS_IDX, 1.0),
        (2, 13, 1.0), (2, BIAS_IDX, 1.0),
        (3, 12, 1.0), (3, 13, 2.0), (3, BIAS_IDX, 1.0),
    ]
    # feed WITHOUT the bias rows — train_logreg adds them itself
    feat = spark.createDataFrame(
        [r for r in feat_rows if r[1] != BIAS_IDX],
        "doc_id LONG, idx LONG, v DOUBLE",
    )
    labels = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 0), (3, 0)], "doc_id LONG, y INT"
    )
    got = {
        r.idx: r.w
        for r in train_logreg(
            feat, labels, iterations=15, lr=0.4, l2=l2
        ).collect()
    }
    want = _ref_logreg(
        feat_rows, [(0, 1), (1, 1), (2, 0), (3, 0)], 15, 0.4, l2
    )
    assert set(got) == set(want)
    for ix in want:
        assert got[ix] == pytest.approx(want[ix], rel=1e-9, abs=1e-12)


def test_quality_classifier_end_to_end(spark):
    """The curation use-case: train on labeled seeds (prose vs spam),
    score held-out docs of both kinds correctly."""
    prose = ("the committee considered the proposal and the members "
             "agreed that it should be adopted because the budget was ")
    spam = ("buy cheap click here winner prize free casino bonus "
            "deal offer now limited casino prize winner click ")
    rows = []
    for i in range(40):
        rows.append((i, prose + f"section {i}", 1))
        rows.append((100 + i, spam + f"promo {i}", 0))
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    train = df.filter("doc_id % 4 != 0")
    test = df.filter("doc_id % 4 = 0")
    feats_tr = hashed_features(train, n_features=1 << 14)
    w = train_logreg(
        feats_tr, train.select("doc_id", "y"), iterations=25, lr=1.0
    )
    scored = score_logreg(
        hashed_features(test, n_features=1 << 14), w
    ).join(test.select("doc_id", "y"), "doc_id")
    got = scored.select(
        (F.col("predicted").cast("int") == F.col("y")).cast("int").alias("ok")
    ).agg(F.avg("ok")).first()[0]
    assert got == 1.0  # linearly separable by construction
    # probabilities are calibrated in direction
    probs = {r.doc_id: r.prob for r in scored.collect()}
    assert all(p > 0.5 for d, p in probs.items() if d < 100)
    assert all(p < 0.5 for d, p in probs.items() if d >= 100)


def test_train_logreg_validation(spark):
    feat = spark.createDataFrame([], "doc_id LONG, idx LONG, v DOUBLE")
    labels = spark.createDataFrame([], "doc_id LONG, y INT")
    with pytest.raises(ValueError, match="empty label"):
        train_logreg(feat, labels)
    with pytest.raises(ValueError, match="iterations"):
        train_logreg(feat, labels, iterations=0)
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n_features"):
        hashed_features(df, n_features=1)

"""Hashing-trick quality classifier: scoring parity with the DuckDB
oracle, hand-computed feature math, trainer separation on a labeled
corpus, exact numpy-reference parity, and partitioning independence."""

from __future__ import annotations

import hashlib
import math
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

from talna_spark.pipeline.classifier import (
    DEMO_FEATURES,
    MICRO,
    NANO,
    _away_from_zero,
    hashed_features,
    score_documents,
    score_documents_sql,
    train_classifier,
)


def _h64(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs_dir():
    d = tempfile.mkdtemp(prefix="talna_clf_")
    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "buy cheap pills now click here now now"},
        {"doc_id": 2, "text": "a measured analysis of the spark optimizer"},
        {"doc_id": 3, "text": "zzz zzz zzz zzz"},
        {"doc_id": 4, "text": "one"},
    ]
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_hashed_features_counts(spark, docs_dir):
    docs = spark.read.parquet(f"{docs_dir}/documents.parquet")
    feat = hashed_features(docs, 64).collect()
    by_doc = {}
    for r in feat:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 9 tokens, "the" twice -> its bucket has tf=2 (unless another
    # token collides, which we compute exactly)
    toks0 = "the quick brown fox jumps over the lazy dog".split()
    exp = {}
    for t in toks0:
        exp[_h64(t) % 64] = exp.get(_h64(t) % 64, 0) + 1
    got = {r["f"]: r["tf"] for r in by_doc[0]}
    assert got == exp
    assert all(r["n"] == 9 for r in by_doc[0])
    # doc 4: single token, tf = n = 1
    assert len(by_doc[4]) == 1 and by_doc[4][0]["tf"] == 1


def test_score_matches_duckdb(spark, docs_dir):
    import duckdb

    out = score_documents(spark, docs_dir).orderBy("doc_id").collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet')"
    )
    ora = con.execute(
        score_documents_sql() + " ORDER BY doc_id"
    ).fetchall()
    assert len(out) == len(ora) == 5
    for s, o in zip(out, ora):
        assert (s["doc_id"], s["n_tokens"]) == (o[0], o[1])
        assert s["clf_score"] == pytest.approx(o[2], abs=1e-9)


def test_score_manual_single_doc(spark, docs_dir):
    # doc 4 = one token: x = 1, w = formula(f), score = sigmoid(w)
    out = {
        r["doc_id"]: r for r in score_documents(spark, docs_dir).collect()
    }
    f = _h64("one") % DEMO_FEATURES
    w = ((f * 37) % 101 - 50) / 100.0
    z = round(_away_from_zero(w * 1.0 * NANO) / NANO, 6)
    assert out[4]["clf_score"] == pytest.approx(
        round(1.0 / (1.0 + math.exp(-z)), 6), abs=1e-9
    )
    assert out[4]["n_tokens"] == 1


@pytest.fixture(scope="module")
def labeled_dir():
    """40 docs: class 1 draws from a 'prose' vocabulary, class 0 from a
    'junk' vocabulary, deterministic round-robin construction."""
    d = tempfile.mkdtemp(prefix="talna_clf_train_")
    prose = "the quiet library holds many careful essays about science".split()
    junk = "click buy now cheap winner prize claim free bonus spam".split()
    rows = []
    for i in range(40):
        vocab = prose if i % 2 == 0 else junk
        toks = [vocab[(i + j) % len(vocab)] for j in range(12)]
        rows.append({"doc_id": i, "text": " ".join(toks)})
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _labels(spark):
    return spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(40)],
        "doc_id long, y double",
    )


def test_train_separates(spark, labeled_dir):
    docs = spark.read.parquet(f"{labeled_dir}/documents.parquet")
    model = train_classifier(
        docs, _labels(spark), n_features=256, iters=20, lr=10.0
    )
    hist = model["loss_history"]
    assert hist[-1] < hist[0] * 0.35  # well below the ln(2) start
    scored = score_documents(
        spark,
        docs=docs,
        weights=model["weights"],
        bias=model["bias"],
        n_features=256,
    ).collect()
    acc = sum(
        1
        for r in scored
        if (r["clf_score"] >= 0.5) == (r["doc_id"] % 2 == 0)
    ) / len(scored)
    assert acc >= 0.95


def _numpy_train(feat_pdf, y_by_doc, n_features, iters, lr, l2):
    """Literal replication of train_classifier's arithmetic."""
    away = np.vectorize(_away_from_zero, otypes=[np.int64])
    docs = sorted(y_by_doc)
    w = np.zeros(n_features)
    bias = 0.0
    n_docs = len(docs)
    hist = []
    f = feat_pdf["f"].to_numpy()
    did = feat_pdf["doc_id"].to_numpy()
    x = feat_pdf["tf"].to_numpy().astype(np.float64) / feat_pdf[
        "n"
    ].to_numpy().astype(np.float64)
    y = np.array([y_by_doc[d] for d in docs])
    didx = {d: i for i, d in enumerate(docs)}
    row_doc = np.array([didx[d] for d in did])
    for _ in range(iters):
        nano = away(w[f] * x * NANO)
        zn = np.zeros(n_docs, dtype=np.int64)
        np.add.at(zn, row_doc, nano)
        p = 1.0 / (1.0 + np.exp(-(zn / NANO + bias)))
        eps = 1e-12
        loss = away(
            -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)) * MICRO
        )
        hist.append(loss.sum() / MICRO / n_docs)
        g_bias = away((p - y) * MICRO).sum() / MICRO / n_docs
        r = (p - y)[row_doc]
        gm = np.zeros(n_features, dtype=np.int64)
        np.add.at(gm, f, away(r * x * MICRO))
        w = w - lr * (gm / MICRO / n_docs + l2 * w)
        bias -= lr * g_bias
    return w, bias, hist


def test_train_numpy_parity(spark, labeled_dir):
    docs = spark.read.parquet(f"{labeled_dir}/documents.parquet")
    model = train_classifier(
        docs, _labels(spark), n_features=128, iters=3, lr=1.5, l2=0.01
    )
    feat_pdf = hashed_features(docs, 128).toPandas()
    y_by_doc = {i: 1.0 if i % 2 == 0 else 0.0 for i in range(40)}
    w, bias, hist = _numpy_train(feat_pdf, y_by_doc, 128, 3, 1.5, 0.01)
    assert np.allclose(model["weights"], w, atol=1e-9)
    assert model["bias"] == pytest.approx(bias, abs=1e-9)
    assert np.allclose(model["loss_history"], hist, atol=1e-9)


def test_train_partitioning_independent(spark, labeled_dir):
    docs = spark.read.parquet(f"{labeled_dir}/documents.parquet")
    m1 = train_classifier(docs, _labels(spark), n_features=64, iters=3)
    m2 = train_classifier(
        docs.repartition(7, "doc_id"), _labels(spark), n_features=64, iters=3
    )
    assert m1["weights"] == m2["weights"]
    assert m1["bias"] == m2["bias"]
    assert m1["loss_history"] == m2["loss_history"]


def test_curate_with_classifier_gate(spark):
    """The optional learned gate in pipeline.curate: default off is
    byte-identical; on, docs above the rule-quality floor get verdict
    classifier_reject exactly when their batch clf_score is below the
    threshold (precedence: low_quality > classifier_reject > dedup)."""
    from talna_spark.pipeline.curate import QUALITY_MIN, curate
    from talna_spark.pipeline.decontam import EVAL_MOD
    from talna_spark.pipeline.text import quality

    import shutil
    import tempfile

    # prose that clears the rule-quality floor; odd docs carry a marker
    # token the hand-set weight vector slams, so ONLY the learned gate
    # can tell them apart
    good = (
        "the quiet library holds many careful essays, and the river "
        "beyond it is a long calm line of water that the town loves. "
    ) * 3  # ~77 tokens: clears the n_tokens/50 leg of the quality score
    rows = [
        {
            "doc_id": i,
            "text": good + (f"spamword marker {i}" if i % 2 else f"tail {i}"),
        }
        for i in range(1, 21)  # skip 0: doc 0 would be the eval slice
    ]
    d = tempfile.mkdtemp(prefix="talna_clfgate_")
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"))
    try:
        weights = [0.0] * 256
        weights[_h64("spamword") % 256] = -80.0
        base = {
            r["doc_id"]: r["verdict"] for r in curate(spark, d).collect()
        }
        off = {
            r["doc_id"]: r["verdict"]
            for r in curate(
                spark, d,
                clf_weights=weights, clf_bias=0.2,
                clf_threshold=-1.0,  # nothing can score below -1
                clf_features=256,
            ).collect()
        }
        assert base == off  # threshold no doc crosses == default path

        on = {
            r["doc_id"]: r["verdict"]
            for r in curate(
                spark, d,
                clf_weights=weights, clf_bias=0.2,
                clf_threshold=0.5, clf_features=256,
            ).collect()
        }
        docs = spark.read.parquet(f"{d}/documents.parquet")
        scores = {
            r["doc_id"]: r["clf_score"]
            for r in score_documents(
                spark, docs=docs,
                weights=weights, bias=0.2, n_features=256,
            ).collect()
        }
        quals = {
            r["doc_id"]: r["quality"] for r in quality(spark, d).collect()
        }
        rejected = {k for k, v in on.items() if v == "classifier_reject"}
        expected = {
            k
            for k in on
            if k % EVAL_MOD != 0
            and quals[k] >= QUALITY_MIN
            and scores[k] < 0.5
        }
        assert rejected == expected
        assert rejected  # the marker docs really trip the learned gate
        assert all(k % 2 == 1 for k in rejected)  # only marker docs
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_score_plan_broadcasts_weights(spark, docs_dir):
    df = score_documents(spark, docs_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_save_load_round_trip(spark, labeled_dir, tmp_path):
    docs = spark.read.parquet(f"{labeled_dir}/documents.parquet")
    model = train_classifier(docs, _labels(spark), n_features=64, iters=2)
    from talna_spark.pipeline.classifier import (
        load_classifier, save_classifier,
    )

    p = str(tmp_path / "clf_model")
    save_classifier(spark, model, p)
    back = load_classifier(spark, p)
    assert back["n_features"] == 64
    assert back["weights"] == model["weights"]
    assert back["bias"] == model["bias"]
    # loaded model scores identically
    a = score_documents(
        spark, docs=docs, weights=model["weights"], bias=model["bias"],
        n_features=64,
    ).orderBy("doc_id").collect()
    b = score_documents(
        spark, docs=docs, weights=back["weights"], bias=back["bias"],
        n_features=back["n_features"],
    ).orderBy("doc_id").collect()
    assert a == b


def test_score_empty_text_doc(spark, tmp_path):
    """tokens('') is [''] (the shared tokenizer convention): an empty
    doc scores as one empty-string token, not a crash or a dropout."""
    import pandas as pd

    d = str(tmp_path)
    pd.DataFrame(
        [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": "a b"}]
    ).to_parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in score_documents(spark, d).collect()}
    assert out[0]["n_tokens"] == 1 and 0.0 < out[0]["clf_score"] < 1.0
    assert out[1]["n_tokens"] == 2


def test_train_normalizes_by_matched_docs(spark, labeled_dir):
    """Labels without a matching document must not dilute gradients:
    training with 40 matching + 40 phantom labels equals training with
    exactly the 40 matching labels (review r6 — the effective-lr bug)."""
    docs = spark.read.parquet(f"{labeled_dir}/documents.parquet")
    exact = train_classifier(docs, _labels(spark), n_features=64, iters=3)
    padded_labels = spark.createDataFrame(
        [(i, 1.0 if i % 2 == 0 else 0.0) for i in range(80)],  # 40-79 phantom
        "doc_id long, y double",
    )
    padded = train_classifier(docs, padded_labels, n_features=64, iters=3)
    assert padded["weights"] == exact["weights"]
    assert padded["bias"] == exact["bias"]
    assert padded["loss_history"] == exact["loss_history"]


def test_train_duplicate_labels_deduped(spark, labeled_dir):
    """Duplicated label rows must not double-weight their doc's
    gradient (review r6): doubled labels give the identical model."""
    docs = spark.read.parquet(f"{labeled_dir}/documents.parquet")
    base = _labels(spark)
    m1 = train_classifier(docs, base, n_features=64, iters=2)
    m2 = train_classifier(
        docs, base.unionByName(base), n_features=64, iters=2
    )
    assert m1["weights"] == m2["weights"]
    assert m1["bias"] == m2["bias"]
    assert m1["loss_history"] == m2["loss_history"]

"""fastText-style linear quality gate (round 17 — operators/quality.py):
hand-computed scores on tiny docs, the empty-document bias contract,
the quantized-score keep boundary, missing-bucket zero weights, the
deterministic weight stand-in, and the opt-in pipeline stage (CCNet
ordering, default off). Oracle parity at 3 SFs rides
q_quality_classifier."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.operators.quality import (
    WEIGHT_SCALE,
    hashed_linear_weights,
    quality_classifier_score,
)

N_BUCKETS = 4096


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _feats(text: str) -> list[str]:
    ws = [t for t in text.lower().split(" ") if t]
    grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])] if len(ws) >= 2 else []
    return ws + grams


def _py_score(text: str, wmap: dict[int, int], bias_micro: int = 0) -> float:
    fs = _feats(text)
    if not fs:
        return round(1.0 / (1.0 + math.exp(-bias_micro / WEIGHT_SCALE)), 9)
    dot = sum(wmap.get(_bucket(f), 0) for f in fs)
    logit = (dot + bias_micro * len(fs)) / (len(fs) * WEIGHT_SCALE)
    return round(1.0 / (1.0 + math.exp(-logit)), 9)


DOCS = [
    (1, "good clean prose flows here"),
    (2, "spam spam spam spam"),
    (3, "a"),          # single token: no bigrams
    (4, ""),           # no tokens at all: bias-only score
]


def _weights_df(spark, wmap):
    return spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket long, weight_micro long"
    )


def test_hand_computed_scores_and_gate(spark):
    # weights chosen by FEATURE so doc 1 scores high, doc 2 low
    wmap = {}
    for f in _feats(DOCS[0][1]):
        wmap[_bucket(f)] = 800_000
    for f in _feats(DOCS[1][1]):
        wmap[_bucket(f)] = -900_000
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {
        r.doc_id: r
        for r in quality_classifier_score(
            df, "doc_id", "text", _weights_df(spark, wmap),
            n_buckets=N_BUCKETS,
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    for doc_id, text in DOCS:
        want = _py_score(text, wmap)
        assert abs(got[doc_id].quality_score - want) <= 1e-9, (doc_id, text)
        assert got[doc_id].keep == (got[doc_id].quality_score >= 0.5)
    assert got[1].keep and not got[2].keep
    # feature accounting: n tokens + max(n-1, 0) bigrams
    assert got[1].n_feats == 5 + 4
    assert got[3].n_feats == 1  # no bigram from a 1-token doc
    assert got[4].n_feats == 0 and got[4].quality_score == 0.5


def test_empty_doc_scores_bias_alone(spark):
    df = spark.createDataFrame([(4, "")], "doc_id int, text string")
    row = quality_classifier_score(
        df, "doc_id", "text", _weights_df(spark, {0: 1}),
        n_buckets=N_BUCKETS, bias_micro=2_000_000,
    ).collect()[0]
    assert row.quality_score == round(1 / (1 + math.exp(-2.0)), 9)
    assert row.keep


def test_missing_buckets_weigh_zero(spark):
    # an empty weight table: every doc's dot is 0 -> sigmoid(0) = 0.5
    df = spark.createDataFrame(DOCS[:2], "doc_id int, text string")
    got = quality_classifier_score(
        df, "doc_id", "text",
        _weights_df(spark, {N_BUCKETS - 1: 123}), n_buckets=N_BUCKETS,
    ).collect()
    assert all(r.quality_score == 0.5 and r.keep for r in got)


def test_weight_standin_deterministic_and_bounded(spark):
    w = hashed_linear_weights(spark, n_buckets=64, salt="qw").collect()
    assert len(w) == 64
    assert all(abs(r.weight_micro) <= WEIGHT_SCALE for r in w)
    again = hashed_linear_weights(spark, n_buckets=64, salt="qw").collect()
    assert sorted(map(tuple, w)) == sorted(map(tuple, again))
    other = {
        r.bucket: r.weight_micro
        for r in hashed_linear_weights(spark, 64, salt="zz").collect()
    }
    assert any(other[r.bucket] != r.weight_micro for r in w)


def test_pipeline_quality_gate_optional_stage(spark):
    from rusty_timeseries_db_spark.pipelines import (
        CorpusPipelineConfig,
        build_training_corpus,
    )
    from rusty_timeseries_db_spark.queries import T
    from tests.conftest import SF_DIR

    docs = T(spark, SF_DIR, "documents")
    weights = hashed_linear_weights(spark, n_buckets=1024, salt="qw")
    scored = quality_classifier_score(
        docs, "doc_id", "text", weights, n_buckets=1024,
    )
    # pick the median score as threshold so the gate genuinely splits
    thr = scored.approxQuantile("quality_score", [0.5], 0.0)[0]
    kept_ids = {
        r.doc_id
        for r in scored.filter(F.col("quality_score") >= thr).collect()
    }
    assert 0 < len(kept_ids) < scored.count()

    base_cfg = CorpusPipelineConfig(min_tokens=1, near_dup_threshold=0.99)
    gated_cfg = CorpusPipelineConfig(
        min_tokens=1, near_dup_threshold=0.99,
        quality_weights=weights, quality_threshold=thr,
        quality_n_buckets=1024,
    )
    base = build_training_corpus(docs, base_cfg)
    gated = build_training_corpus(docs, gated_cfg)
    got_ids = {r.doc_id for r in gated.select("doc_id").collect()}
    # every survivor passed the gate, and the gate actually dropped
    # docs the ungated pipeline kept
    assert got_ids <= kept_ids
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    assert (base_ids - kept_ids) & base_ids  # some base docs score low
    assert got_ids <= base_ids
    # default-off: the documented pipeline is untouched
    assert base_ids == {
        r.doc_id
        for r in build_training_corpus(docs, base_cfg).collect()
    }


def test_trained_weights_separate_the_classes(spark):
    """Naive-Bayes log-odds training on a toy labeled corpus: docs
    from the positive vocabulary score > 0.5, negative-vocabulary
    docs < 0.5, and a vocabulary-disjoint doc sits at the smoothed
    prior; the trained table is model-sized (one row per bucket)."""
    from rusty_timeseries_db_spark.operators.quality import (
        train_quality_weights,
    )

    rows = [
        (1, "good clean prose flows here", True),
        (2, "good clean text reads well", True),
        (3, "spam junk noise garbage spam", False),
        (4, "junk noise spam garbage junk", False),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, pos boolean")
    w = train_quality_weights(
        df, text_col="text", label_col="pos", n_buckets=512,
    )
    assert w.count() == 512  # full spine, absent buckets included
    wmap = {r.bucket: r.weight_micro for r in w.collect()}
    # positive-vocab features weigh positive, negative-vocab negative
    assert wmap[_feat_bucket("good", 512)] > 0
    assert wmap[_feat_bucket("spam", 512)] < 0

    scored = {
        r.doc_id: r
        for r in quality_classifier_score(
            df, "doc_id", "text", w, n_buckets=512,
        ).collect()
    }
    assert scored[1].quality_score > 0.5 and scored[1].keep
    assert scored[2].quality_score > 0.5 and scored[2].keep
    assert scored[3].quality_score < 0.5 and not scored[3].keep
    assert scored[4].quality_score < 0.5 and not scored[4].keep


def _feat_bucket(feat: str, n_buckets: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % n_buckets


def test_binary_auc_hand_computed_with_ties(spark):
    from rusty_timeseries_db_spark.operators.quality import binary_auc

    rows = [
        ("g", 0.9, True), ("g", 0.7, True), ("g", 0.5, True),
        ("g", 0.5, False), ("g", 0.3, False),
        # a second group, perfectly separated -> AUC exactly 1.0
        ("h", 0.8, True), ("h", 0.2, False),
        # degenerate: one class only -> NULL auc, not a 0/0 abort
        ("k", 0.6, True), ("k", 0.4, True),
    ]
    df = spark.createDataFrame(rows, "lang string, s double, pos boolean")
    got = {
        r.lang: r
        for r in binary_auc(df, "s", "pos", group_col="lang").collect()
    }
    # pairs: 0.9 and 0.7 beat both negs; 0.5 beats 0.3 and ties 0.5
    # -> (2 + 2 + 1.5) / 6
    assert got["g"].auc == round(5.5 / 6, 9)
    assert (got["g"].n_pos, got["g"].n_neg) == (3, 2)
    assert got["h"].auc == 1.0
    assert got["k"].auc is None
    # ungrouped form over the same rows (documented global-sort shape)
    whole = binary_auc(df, "s", "pos").collect()[0]
    assert (whole.n_pos, whole.n_neg) == (6, 3)


def test_per_group_heads_equal_solo_training(spark):
    """Round 18 (VERDICT r17 #3): train_quality_weights(group_col=)
    produces, for every group, EXACTLY the table the ungrouped
    trainer produces on that group's rows alone — counts, spine,
    smoothing totals, and quantization all carry the group key."""
    from pyspark.sql import functions as F

    from rusty_timeseries_db_spark.operators.quality import (
        train_quality_weights,
    )

    rows = [
        ("d1", "en", True, "good clean prose here"),
        ("d2", "en", False, "spam spam buy now"),
        ("d3", "fr", True, "spam spam buy now"),
        ("d4", "fr", False, "good clean prose here and more"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, lang string, pos boolean, text string"
    )
    grouped = train_quality_weights(
        df, "text", "pos", n_buckets=64, group_col="lang"
    )
    for lang in ("en", "fr"):
        solo = {
            r.bucket: r.weight_micro
            for r in train_quality_weights(
                df.filter(F.col("lang") == lang), "text", "pos",
                n_buckets=64,
            ).collect()
        }
        via_group = {
            r.bucket: r.weight_micro
            for r in grouped.filter(F.col("lang") == lang).collect()
        }
        assert solo == via_group and len(solo) == 64


def test_per_group_heads_separate_where_global_cannot(spark):
    """The same text carries OPPOSITE labels in two languages: the
    per-lang heads score it on opposite sides of the gate, which one
    global weight table provably cannot do (a single w[f] gives one
    sign per bucket)."""
    from rusty_timeseries_db_spark.operators.quality import (
        quality_classifier_score,
        train_quality_weights,
    )

    rows = [
        ("d1", "en", True, "good clean prose here"),
        ("d2", "en", False, "spam spam buy now"),
        ("d3", "fr", True, "spam spam buy now"),
        ("d4", "fr", False, "good clean prose here"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, lang string, pos boolean, text string"
    )
    w = train_quality_weights(
        df, "text", "pos", n_buckets=64, group_col="lang"
    )
    got = {
        r.doc_id: r
        for r in quality_classifier_score(
            df, "doc_id", "text", w, n_buckets=64, group_col="lang"
        ).collect()
    }
    # identical feature multiset, opposite per-lang verdicts — and
    # exactly mirrored scores (the heads are label-swapped twins)
    assert got["d2"].quality_score < 0.5 < got["d3"].quality_score
    assert not got["d2"].keep and got["d3"].keep
    assert got["d4"].quality_score < 0.5 < got["d1"].quality_score
    # a global table scores equal text equally — pin the contrast
    wg = train_quality_weights(df, "text", "pos", n_buckets=64)
    flat = {
        r.doc_id: r.quality_score
        for r in quality_classifier_score(
            df, "doc_id", "text", wg, n_buckets=64
        ).collect()
    }
    assert flat["d2"] == flat["d3"]  # same text, same global score


def test_unseen_group_scores_at_bias(spark):
    """A document whose group has no trained head joins nothing:
    every feature weighs 0, so the score lands at the bias sigmoid
    (0.5) — the documented absent-bucket rule, not a crash."""
    from rusty_timeseries_db_spark.operators.quality import (
        quality_classifier_score,
        train_quality_weights,
    )

    train = spark.createDataFrame(
        [("d1", "en", True, "alpha beta"), ("d2", "en", False, "gamma")],
        "doc_id string, lang string, pos boolean, text string",
    )
    w = train_quality_weights(
        train, "text", "pos", n_buckets=32, group_col="lang"
    )
    score = spark.createDataFrame(
        [("x1", "de", "alpha beta gamma")],
        "doc_id string, lang string, text string",
    )
    row = quality_classifier_score(
        score, "doc_id", "text", w, n_buckets=32, group_col="lang"
    ).collect()[0]
    assert row.quality_score == 0.5 and row.n_feats == 5

"""fastText-style quality-classifier INFERENCE in the engine: hashed
bag-of-ngrams linear model scored entirely map-side (the webtext
analogue of the reference's batched raster inference,
``scripts/jobs/model_prediction.py:33-63`` — model weights ride the
plan, data never leaves the executor).

This is the standard corpus-curation step (GPT-3/LLaMA-class pipelines
score every page with a small linear classifier and keep the
high-probability tail). Design for 100 TB:

- features (unigrams + bigrams of the whitespace tokenization) are
  built with JVM array HOFs — split / zip_with / transform — no Python
  in the hot path;
- each gram hashes to one of ``n_buckets`` weight slots with the
  engine-portable md5 idiom (``conv(substr(md5(...),1,8),16,10)``), so
  the DuckDB oracle replays scoring exactly;
- weights are FIXED-POINT integers (trained float · 10⁶): the per-doc
  feature sum is an exact integer aggregate — order-independent, so
  Spark's left-fold and SQL's SUM agree bit-for-bit — and the logit
  ``bias + (feat_sum/1e6)/n_feats`` is a chain of correctly-rounded
  IEEE ops on identical inputs;
- at this bucket count the weight table folds into the plan as an
  array literal (ZERO shuffle, zero join — pure map); above
  ``LITERAL_BUCKET_LIMIT`` callers should materialize (bucket, weight)
  and broadcast-join instead (same math, one broadcast).

Training happens DRIVER-side on a deterministic synthetic labeled set
(clean text vs junk), plain numpy logistic regression — the engine
only ever sees the frozen integer weights, exactly like shipping a
.bin model file.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame, functions as F

N_BUCKETS = 512
SEED = "qc:v1"
FIXED_POINT = 1_000_000
#: above this, build a (bucket, weight) DataFrame and broadcast-join
#: instead of folding the weights into the plan as an array literal
LITERAL_BUCKET_LIMIT = 65_536

_GOOD_VOCAB = (
    "the a of and to in is was for on with as by at from this that it "
    "be are were has have had not but or which one two new more time "
    "people world year government city water house school report study "
    "market data value growth public health system history science"
).split()
_JUNK_TOKENS = (
    "zzkqx wqjzv xkcdq qqqq zzzz kthxbye asdfgh qwerty zxcvbn "
    "buy cheap click here now free win winner prize offer deal"
).split()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def grams_of(text: str) -> list[str]:
    """Unigrams + adjacent bigrams of the whitespace tokenization —
    the driver-side twin of the engine featurization."""
    ws = text.strip().lower().split()
    return ws + [f"{a}_{b}" for a, b in zip(ws, ws[1:])]


def bucket_of(gram: str, n_buckets: int = N_BUCKETS, seed: str = SEED) -> int:
    return _h(f"{seed}|{gram}") % n_buckets


def _synth_labeled_docs(n_per_class: int = 200) -> list[tuple[str, int]]:
    """Deterministic labeled fixture: 'good' docs sample the clean
    vocab with md5-derived indices (varied, sentence-like mixes);
    'junk' docs are repeated tokens / keyboard mash / spam phrases."""
    out = []
    for i in range(n_per_class):
        n = 20 + _h(f"len|{i}") % 30
        words = [
            _GOOD_VOCAB[_h(f"good|{i}|{k}") % len(_GOOD_VOCAB)]
            for k in range(n)
        ]
        out.append((" ".join(words), 1))
    for i in range(n_per_class):
        kind = i % 3
        n = 20 + _h(f"jlen|{i}") % 30
        if kind == 0:  # one token repeated (boilerplate)
            words = [_JUNK_TOKENS[_h(f"rep|{i}") % len(_JUNK_TOKENS)]] * n
        elif kind == 1:  # keyboard mash
            words = [
                _JUNK_TOKENS[_h(f"junk|{i}|{k}") % 9] for k in range(n)
            ]
        else:  # spam phrasing
            words = [
                _JUNK_TOKENS[9 + _h(f"spam|{i}|{k}") % (len(_JUNK_TOKENS) - 9)]
                for k in range(n)
            ]
        out.append((" ".join(words), 0))
    return out


@lru_cache(maxsize=4)
def train_quality_classifier(
    n_buckets: int = N_BUCKETS, seed: str = SEED
) -> tuple[tuple[int, ...], float]:
    """Plain-numpy logistic regression on the synthetic labeled set
    over averaged hashed-gram counts. Deterministic (no RNG anywhere:
    synthesis, featurization and full-batch gradient descent are all
    fixed), so every engine/oracle pair freezes the SAME model.
    Returns (integer weights · 10⁶, bias)."""
    import numpy as np

    docs = _synth_labeled_docs()
    X = np.zeros((len(docs), n_buckets))
    y = np.zeros(len(docs))
    for r, (text, label) in enumerate(docs):
        gs = grams_of(text)
        for g in gs:
            X[r, bucket_of(g, n_buckets, seed)] += 1.0
        X[r] /= max(len(gs), 1)
        y[r] = label
    w = np.zeros(n_buckets)
    b = 0.0
    lr = 2.0
    for _ in range(300):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / len(docs)
        b -= lr * g.mean()
    w_int = tuple(int(round(v * FIXED_POINT)) for v in w)
    return w_int, round(float(b), 6)


def quality_classifier_scores(
    docs: DataFrame,
    weights: tuple[int, ...] | None = None,
    bias: float | None = None,
    n_buckets: int = N_BUCKETS,
    seed: str = SEED,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every doc with the frozen linear model — pure map-side
    (one projection, NO shuffle, NO join, no Python): featurize with
    array HOFs, fold the integer weight table into the plan as an
    array literal, left-fold the exact feature sum, emit the logit.

    Output: (doc_id, feat_sum, n_feats, logit, keep) where
    logit = bias + (feat_sum/1e6)/n_feats (rounded to 9 — its inputs
    are exact, so both engines compute the identical double) and
    keep = logit > 0 is the classifier decision.
    """
    if weights is None or bias is None:
        weights, bias = train_quality_classifier(n_buckets, seed)
    if len(weights) > LITERAL_BUCKET_LIMIT:
        raise ValueError(
            f"{len(weights)} buckets exceeds the plan-literal limit "
            f"({LITERAL_BUCKET_LIMIT}); materialize a (bucket, weight) "
            "table and broadcast-join instead"
        )
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bigrams = F.when(
        F.size(ws) > 1,
        F.zip_with(
            F.slice(ws, 1, F.size(ws) - 1),
            F.slice(ws, 2, F.size(ws) - 1),
            lambda a, b: F.concat_ws("_", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(ws, bigrams)
    buckets = F.transform(
        grams,
        lambda g: (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{seed}|"), g)), 1, 8),
                16,
                10,
            ).cast("long")
            % n_buckets
        ).cast("int"),
    )
    warr = F.array(*[F.lit(int(w)) for w in weights])
    feat_sum = F.aggregate(
        buckets,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(warr, b + 1),
    )
    return (
        docs.select(
            F.col(id_col),
            feat_sum.alias("feat_sum"),
            F.size(grams).alias("n_feats"),
        )
        .select(
            "*",
            F.round(
                F.lit(float(bias))
                + (F.col("feat_sum") / F.lit(float(FIXED_POINT)))
                / F.col("n_feats"),
                9,
            ).alias("logit"),
        )
        .select("*", (F.col("logit") > 0).alias("keep"))
    )

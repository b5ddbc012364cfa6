"""Linear text-classifier inference at corpus scale.

The GPT-3/LLaMA-style "quality filter" step: score every document with
a trained linear model over bag-of-tokens features and keep what
clears a threshold. Training happens offline on a sample; what has to
scale is INFERENCE, and the scalable shape is:

  explode tokens -> broadcast-join the (model-sized) weight table ->
  per-doc sum -> sigmoid -> threshold

One corpus pass, one shuffle on doc_id for the sum (map-side
combinable), weight table broadcast (vocab-sized, never corpus-sized).
No Python in the hot path — the join and the sigmoid are Catalyst
expressions. fastText's hashed-bigram trick maps onto the same plan
with a hash-bucket join key instead of the raw token.

Weights are FIXED-POINT integers (weight_scale units per 1.0), not
doubles, for a scale reason that doubles as an oracle reason: a
floating-point sum's value depends on partial-aggregation order, so a
double-weighted score is not reproducible across retries, partition
counts, or engines. An integer sum is exact and order-free; the only
float ops are one division and one sigmoid on the finished sum —
bit-identical everywhere, so kept/dropped decisions are stable and a
SQL oracle replays them bit-for-bit. (Score is still rounded to 9
decimals before the keep decision, 6 on output, per the engine float
policy.)

Reference parity: no counterpart in the reference; added LLM-pipeline
surface (model-based quality filtering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import local_frame
from .portable import phash
from .text import normalize_text


def pseudo_weights(
    vocab: DataFrame, tok_col: str = "tok", weight_scale: int = 1000
) -> DataFrame:
    """A deterministic stand-in for trained weights: fixed-point
    w(tok) uniform over [-weight_scale, weight_scale] derived from the
    portable hash, so tests and SQL oracles replay inference without
    shipping a model file. DuckDB equivalent:
    ``(phash(tok) % (2*scale + 1)) - scale``. Swap this table for real
    (quantized) trained weights in production — the inference plan is
    identical."""
    w = (phash(tok_col) % (2 * weight_scale + 1)) - weight_scale
    return vocab.select(tok_col, w.cast("bigint").alias("weight"))


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) pairs under the engine-portable normalization."""
    return df.select(
        id_col, F.explode(F.split(normalize_text(text_col), " ")).alias("tok")
    )


def score_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    bias: float = 0.0,
    threshold: float = 0.5,
    weight_scale: int = 1000,
) -> DataFrame:
    """Score docs with a linear model over mean token weight:
    ``score = sigmoid(bias + sum(w)/(weight_scale * n_tokens))``;
    unseen (OOV) tokens contribute 0 weight but still count in the
    denominator, so scores are length-normalized. Returns
    (id, score, oov_ratio, kept).

    ``weights`` must be (tok, weight) with INTEGER fixed-point
    weights (see module docstring) and model-sized — it is broadcast.
    The only corpus-wide shuffle is the per-doc integer sum.

    TOTAL over input docs: a doc whose text is NULL (or yields no
    tokens) still gets a row — score NULL, oov_ratio NULL, kept
    FALSE — via ``explode_outer``, so intakes can route unscored docs
    to their reject channel instead of silently dropping them (a doc
    that vanishes from both kept and rejected is how corpora rot)."""
    toks = df.select(
        id_col,
        F.explode_outer(
            F.split(normalize_text(text_col), " ")
        ).alias("tok"),
    )
    joined = toks.join(F.broadcast(weights), on="tok", how="left")
    has_tok = F.col("tok").isNotNull()
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.when(has_tok, F.coalesce("weight", F.lit(0)))).alias("w_sum"),
        F.count("tok").alias("n_toks"),
        F.sum(
            F.when(has_tok & F.col("weight").isNull(), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_oov"),
    )
    # explicit n_toks > 0 guard: ANSI mode would raise on the
    # divide-by-zero a token-less doc produces; the guarded branch
    # leaves score/oov_ratio NULL and kept coalesces to FALSE.
    logit = F.when(
        F.col("n_toks") > 0,
        F.lit(bias)
        + F.col("w_sum") / (F.lit(weight_scale) * F.col("n_toks")),
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return per_doc.select(
        id_col,
        F.round(score, 6).alias("score"),
        F.when(
            F.col("n_toks") > 0,
            F.round(F.col("n_oov") / F.col("n_toks"), 6),
        ).alias("oov_ratio"),
        F.coalesce(
            F.round(score, 9) >= F.lit(threshold), F.lit(False)
        ).alias("kept"),
    )


def _round_half_away(x: float) -> int:
    """SQL-compatible rounding: Python's round() is banker's (ties to
    even), while Spark F.round and DuckDB round() tie AWAY from zero —
    a driver-side update must round the way the engines do or a
    gradient landing exactly on .5 units diverges the replay."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def train_logreg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    iters: int = 2,
    lr: float = 0.5,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Distributed full-batch logistic-regression training for the
    quality filter — the TRAINED side of ``score_documents``'s
    "training happens offline" assumption, at corpus scale.

    Model: ``p(doc) = sigmoid(sum_tok w[tok] * cnt / (scale *
    n_toks))`` — the same length-normalized mean-token-weight logit
    the inference path computes, so the trained table drops straight
    into ``score_documents``.

    Scale shape per iteration (T iterations = T jobs, like Lloyd):

    - score: broadcast the (model-sized) weight table, ONE integer
      per-doc sum — map-side combinable, exact, order-free;
    - residual: fixed-point ``r = round((p - y) / n_toks * scale)``
      per doc (one projection);
    - gradient: ONE per-token integer sum of ``r * cnt`` — again
      combiner-safe; summed as DECIMAL so a trillion-doc corpus
      cannot silently overflow int64;
    - update: the gradient table is VOCAB-sized (the k-means-partials
      contract: model state may visit the driver, corpus rows never
      do); ``w -= round(lr * g / N)`` in half-away rounding.

    Every intermediate the engines aggregate is an INTEGER (the only
    floats are per-row sigmoid/round projections and the driver-side
    update arithmetic on exactly-representable ints), so the whole
    training run replays bit-for-bit as unrolled SQL —
    queries.q_train_quality_classifier hash-checks the final weights.

    The token frame is computed once and persisted across the 2T
    passes (at 100 TB this is the materialized feature layer you'd
    write next to the corpus, not a cache)."""
    feats = (
        df.select(
            id_col,
            F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
        )
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    labels = df.select(id_col, label.cast("double").alias("__y"))
    return _gd_train(
        feats, labels, id_col, "tok", "tok string",
        iters=iters, lr=lr, weight_scale=weight_scale,
    )


def train_logreg_hashed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label: Column,
    n_buckets: int = 4096,
    iters: int = 2,
    lr: float = 0.5,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """The hash-trick variant of :func:`train_logreg` — the shape that
    survives 100 TB. A raw-token vocabulary grows with the corpus
    (billions of distinct tokens), which breaks both the model-sized
    broadcast and the vocab-sized driver collect; hashing unigrams +
    bigrams into ``n_buckets`` (the fastText trick, reusing DSIR's
    ``hashed_ngram_features``) bounds the model at a constant you
    budget, independent of corpus size. Same fixed-point GD loop,
    identical determinism guarantees. Returns (bucket, w_units).
    NULL-text docs carry no features and drop out of training (they
    have no gradient to contribute)."""
    from .selection import hashed_ngram_features

    feats = (
        hashed_ngram_features(df, text_col, id_col, n_buckets)
        .filter(F.col("bkt").isNotNull())
        .groupBy(F.col("id").alias(id_col), F.col("bkt").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    labels = df.select(id_col, label.cast("double").alias("__y"))
    return _gd_train(
        feats, labels, id_col, "bucket", "bucket bigint",
        iters=iters, lr=lr, weight_scale=weight_scale,
    )


def _gd_train(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str,
    feat_col: str,
    feat_schema: str,
    iters: int,
    lr: float,
    weight_scale: int,
) -> DataFrame:
    """The shared fixed-point full-batch GD loop over a (id, feat,
    cnt) frame. Every aggregated value is an exact integer (see
    train_logreg's docstring for the per-stage shapes)."""
    S = weight_scale
    spark = feats.sparkSession
    feats = feats.persist()
    # A NULL label would propagate to a NULL residual that F.sum
    # silently skips, quietly diverging the trained weights from any
    # total-label replay — fail loud in the same projection instead
    # (no extra pass; the error surfaces in the first scoring job).
    labels = labels.select(
        id_col,
        F.when(
            F.col("__y").isNull(),
            F.raise_error(
                "_gd_train: NULL label — coalesce the label expression "
                "(e.g. F.coalesce(cond, F.lit(False)))"
            ),
        )
        .otherwise(F.col("__y"))
        .alias("__y"),
    )
    per_doc = (
        feats.groupBy(id_col)
        .agg(F.sum("cnt").alias("__n"))
        .join(labels, id_col)
        .persist()
    )
    n_docs = per_doc.count()
    # Weight keys are discovered from iteration 1's gradient rows
    # (every feature reaches them: each belongs to a doc in per_doc,
    # and zero-gradient features still emit a SUM row), which makes
    # the old vocab-sized distinct().collect() warm-up job redundant.
    # Only an iters=0 call still needs the explicit key scan.
    w: dict = (
        {r[feat_col]: 0 for r in feats.select(feat_col).distinct().collect()}
        if iters <= 0
        else {}
    )
    try:
        for it in range(iters):
            if it == 0:
                # All weights start at 0, so the scoring pass is a
                # constant: su = 0 for every doc, logit = round(0, 9)
                # = 0.0, p = sigmoid(0) = 0.5 exactly — skip the
                # broadcast-weights join job entirely (bit-identical;
                # the oracle's unrolled s1 CTE still replays it).
                p = F.lit(0.5)
                resid = per_doc.select(
                    id_col,
                    F.round(((p - F.col("__y")) / F.col("__n")) * S, 0)
                    .cast("long")
                    .alias("__r"),
                )
            else:
                wdf = local_frame(
                    spark, sorted(w.items()), [feat_col, "__w"]
                )
                su = (
                    feats.join(F.broadcast(wdf), feat_col)
                    .groupBy(id_col)
                    .agg(F.sum(F.col("__w") * F.col("cnt")).alias("__su"))
                )
                logit = F.round(
                    F.col("__su") / (F.lit(float(S)) * F.col("__n")), 9
                )
                p = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
                resid = per_doc.join(su, id_col).select(
                    id_col,
                    F.round(((p - F.col("__y")) / F.col("__n")) * S, 0)
                    .cast("long")
                    .alias("__r"),
                )
            grads = (
                feats.join(resid, id_col)
                .groupBy(feat_col)
                .agg(
                    F.sum(
                        (F.col("__r") * F.col("cnt")).cast("decimal(38,0)")
                    ).alias("__g")
                )
                .collect()
            )
            for r in grads:
                w[r[feat_col]] = w.get(r[feat_col], 0) - _round_half_away(
                    lr * (int(r["__g"]) / n_docs)
                )
    finally:
        feats.unpersist()
        per_doc.unpersist()
    return local_frame(
        spark, sorted(w.items()), f"{feat_schema}, w_units bigint"
    )


def sigmoid_sql(logit_sql: str) -> str:
    """DuckDB rendering of the same sigmoid for oracle replay."""
    return f"(1.0 / (1.0 + exp(-({logit_sql}))))"

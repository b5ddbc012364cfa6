"""DSIR — Data Selection with Importance Resampling.

Implements the hashed-n-gram importance estimator of Xie et al. 2023
("Data Selection for Language Models via Importance Resampling"):
pick raw-corpus documents that look like a small TARGET distribution
(e.g. wiki-like text) by scoring each document with

    log w(doc) = sum over its hashed n-gram features f of
                 log p_target(f) - log p_raw(f)

where both distributions are bag-of-hashed-n-grams multinomials over
``n_buckets`` buckets with add-one smoothing. Selection takes the
top-n by weight (the deterministic variant; the paper's Gumbel
resampling adds sampling noise on top of the same weights).

Scale shape (100 TB): one explode over unigram+bigram features (the
same token explode every sketch operator pays), two bucket-count
aggregates that reduce to ``n_buckets`` rows each (map-side combine —
the shuffle is bounded by B, not the corpus), a BROADCAST join of the
B-row log-ratio table back onto the feature stream, and a per-doc
sum. No window over the corpus; the top-n selection is a TakeOrdered
(per-partition heap), not a global sort.

Portability: features are hashed with the engine-portable 60-bit md5
hash (`portable.phash`), so a SQL oracle re-derives bucket ids,
distributions, and every per-doc weight exactly (queries.q_dsir_select
replays the whole estimator in DuckDB).

Reference parity: no counterpart in the reference (2.4 kLoC pandas
harness); part of the added LLM-training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable import phash
from .text import normalize_text


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    carry: list[str] | None = None,
) -> DataFrame:
    """Explode each document into its hashed unigram + bigram feature
    stream: one row per feature OCCURRENCE (multiplicity matters for
    multinomial counts). Output: (id, bkt) + any ``carry`` columns.

    TOTAL over documents: a NULL-text doc (whose token array is NULL)
    yields one (id, bkt=NULL) row via ``explode_outer`` instead of
    vanishing — callers must exclude NULL buckets from distribution
    counts and treat them as zero-contribution features (see
    ``dsir_logweights``)."""
    toks = F.split(normalize_text(text_col), " ")
    grams = F.concat(
        toks,
        F.when(
            F.size(toks) >= 2,
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(1))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array()),
    )
    keep = [F.col(id_col).alias("id")] + [F.col(c) for c in (carry or [])]
    return df.select(*keep, F.explode_outer(grams).alias("g")).select(
        *[c for c in ["id"] + (carry or [])],
        F.pmod(phash(F.col("g")), F.lit(n_buckets)).alias("bkt"),
    )


def _log_p(cnt: Column, total: Column, n_buckets: int) -> Column:
    """Add-one-smoothed multinomial log probability."""
    return F.log((cnt + F.lit(1.0)) / (total + F.lit(float(n_buckets))))


def dsir_logweights(
    docs: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document importance log-weight of every RAW document —
    the rows NOT matching the ``target`` predicate (a boolean Column
    over ``docs``) — vs the target rows' feature distribution. As in
    the paper, target and raw are disjoint: the raw multinomial is
    estimated over the selectable pool only (folding the target into
    raw would shrink exactly the ratios the estimator exists to
    surface). Returns ``(id, logw)`` for every raw document.

    The bucket table is counted over the FULL feature stream (both
    sides in one aggregate), so every raw feature bucket is present
    in the broadcast log-ratio table; the join is left only for the
    NULL-bkt sentinel rows of featureless (NULL-text) docs, which
    contribute 0 and surface as (id, logw=0) rather than vanishing."""
    feats = hashed_ngram_features(
        docs.withColumn("__t", target), text_col, id_col, n_buckets,
        carry=["__t"],
    )
    # NULL bkt marks a featureless (NULL-text) doc's sentinel row:
    # excluded from the multinomials, zero contribution to its own
    # weight — the doc still gets a (id, logw=0) output row instead
    # of silently vanishing from the selectable pool.
    bkt_counts = feats.filter(F.col("bkt").isNotNull()).groupBy("bkt").agg(
        F.sum(F.when(~F.col("__t"), 1).otherwise(0)).alias("raw_c"),
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("tgt_c"),
    )
    totals = bkt_counts.agg(
        F.sum("raw_c").alias("raw_t"), F.sum("tgt_c").alias("tgt_t")
    )
    ratios = bkt_counts.crossJoin(F.broadcast(totals)).select(
        "bkt",
        (
            _log_p(F.col("tgt_c"), F.col("tgt_t"), n_buckets)
            - _log_p(F.col("raw_c"), F.col("raw_t"), n_buckets)
        ).alias("lr"),
    )
    return (
        feats.filter(~F.col("__t"))
        .join(F.broadcast(ratios), "bkt", "left")
        .groupBy("id")
        .agg(F.sum(F.coalesce("lr", F.lit(0.0))).alias("logw"))
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """The n raw-corpus documents most target-like by DSIR weight:
    ``(id, logw)`` ordered by weight desc. Weights are rounded to 6
    decimals BEFORE ranking (cross-engine log/sum drift is ~1e-13;
    rounding pins the cut line, ties resolve by id) — a TakeOrdered,
    no global sort."""
    w = dsir_logweights(docs, target, text_col, id_col, n_buckets)
    return (
        w.select("id", F.round("logw", 6).alias("logw"))
        .orderBy(F.col("logw").desc(), F.col("id"))
        .limit(n)
    )

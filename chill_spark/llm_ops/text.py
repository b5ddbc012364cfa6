"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` —
JVM-side, codegen-friendly, no Python per row. Each operator is a
Column factory so it composes into any plan (and pushes column
pruning to the scan).

Operators: token counting (whitespace + BPE-ish regex), quality
scoring (length/punct/stopword/caps ratios), language ID (stopword
n-gram heuristic), document fingerprinting (normalized md5 + rolling
shingle hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization / counting
# ---------------------------------------------------------------------------

# BPE-ish lexer: word pieces or single non-space punctuation — a cheap
# deterministic proxy for subword token counts.
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

_STOPWORDS_EN = (
    "the|and|of|to|a|in|is|it|that|was|for|on|are|with|as|at|be|this|have|from"
)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?\"'\(\)\[\]]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n.cast("double"))


def caps_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    letters = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    caps = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return F.when(letters == 0, F.lit(0.0)).otherwise(caps / letters.cast("double"))


def stopword_ratio(col: Column | str, stopwords: str = _STOPWORDS_EN) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    words = whitespace_token_count(c)
    hits = F.size(
        F.regexp_extract_all(F.lower(c), F.lit(rf"\b({stopwords})\b"), 0)
    )
    return F.when(words == 0, F.lit(0.0)).otherwise(hits / words.cast("double"))


# Gopher-style repetition-free quality rules (Rae et al. 2021, public
# "Scaling Language Models: ... Gopher" appendix A; C4 filtering rules,
# Raffel et al. 2020). Word-level only — the synthetic corpus carries no
# newlines, so line-based rules (bullet/ellipsis lines) are omitted.
GOPHER_SYMBOL_CLASS = r"[#{}<>|\\]"
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8


def gopher_quality_flags(col: Column | str) -> dict[str, Column]:
    """Per-document quality-rule flags, Gopher/C4-style, as a dict of
    named boolean Columns plus the conjunction ``keep``.

    Everything is built-in Column expressions over ONE pass of the text
    column — at 100 TB this is a map-only stage fused into the scan by
    whole-stage codegen; no shuffle, no UDF. The reference has no text
    analytics; this belongs to the north-star LLM-pipeline surface.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_words = whitespace_token_count(c)
    words_d = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = (
        F.length(F.regexp_replace(c, r"\s+", "")).cast("double") / words_d
    )
    symbol_ratio = (
        F.length(F.regexp_replace(c, r"[^#{}<>|\\]", "")).cast("double")
        / F.greatest(F.length(c), F.lit(1)).cast("double")
    )
    stop_hits = F.size(
        F.regexp_extract_all(F.lower(c), F.lit(rf"\b({_STOPWORDS_EN})\b"), 0)
    )
    alpha_words = F.size(
        F.regexp_extract_all(c, F.lit(r"\S*[A-Za-z]\S*"), 0)
    )
    alpha_ratio = alpha_words.cast("double") / words_d
    flags = {
        "r_words": (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS),
        "r_mean_len": (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN),
        "r_symbol": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "r_stop": stop_hits >= GOPHER_MIN_STOPWORD_HITS,
        "r_alpha": alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO,
    }
    keep = F.lit(True)
    for f in flags.values():
        keep = keep & f
    flags["keep"] = keep
    return flags


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: reasonable length, sane
    punctuation, native-ish stopword density, not shouting. Weights are
    deliberately simple — the operator shape (pure Column expr over one
    scan) is what matters at 100 TB."""
    c = F.col(col) if isinstance(col, str) else col
    n_words = whitespace_token_count(c).cast("double")
    length_term = F.least(n_words / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(c) * 3, F.lit(1.0))
    caps_term = F.lit(1.0) - F.least(caps_ratio(c) * 2, F.lit(1.0))
    return F.round(
        (length_term + punct_term + stop_term + caps_term) / 4.0, 6
    )


# ---------------------------------------------------------------------------
# Language identification (stopword heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|is|of|to|in|that|you|for|with)\b",
    "es": r"\b(el|la|los|las|es|de|que|en|por|una|un|para)\b",
    "fr": r"\b(le|la|les|est|des|une|dans|que|pour|avec|sur)\b",
    "de": r"\b(der|die|das|und|ist|ein|eine|nicht|mit|für)\b",
    "it": r"\b(il|la|che|di|è|un|una|per|non|sono|con)\b",
}


def lang_scores(col: Column | str) -> Column:
    """Array of (lang, hits-per-word) structs, one per candidate lang."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    words = F.greatest(whitespace_token_count(c), F.lit(1)).cast("double")
    entries = [
        F.struct(
            (F.size(F.regexp_extract_all(c, F.lit(rx), 0)) / words).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, rx in LANG_MARKERS.items()
    ]
    return F.array(*entries)


def lang_id(col: Column | str, min_score: float = 0.02) -> Column:
    """Best-scoring language, 'und' when nothing clears ``min_score``.

    argmax via array_max over (score, lang) structs — ties break on
    lang name, deterministic. Pure Column expr: one scan, no UDF.
    """
    best = F.array_max(lang_scores(col))
    return F.when(best["score"] >= min_score, best["lang"]).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace,
    trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of normalized
    text) — engine-portable (DuckDB md5 matches)."""
    return F.md5(normalize_text(col))


def shingle_fingerprints(
    col: Column | str, k: int = 5, col_is_tokens: bool = False
) -> Column:
    """Rolling-hash document sketch: xxhash64 of each k-token shingle.

    Built entirely from array functions: tokenize -> sliding windows
    via transform(sequence) -> hash each window. Input to minhash and
    winnowing-style fingerprint selection.

    WARNING: when given raw text, the tokenizer expression sits inside
    the window lambda and is re-evaluated per shingle (interpreted
    higher-order functions do no CSE). Anchor the token array in its
    own projection and pass it with ``col_is_tokens=True`` — see
    q_winnowing_fingerprints / shingle_sets.
    """
    toks = (
        (F.col(col) if isinstance(col, str) else col)
        if col_is_tokens
        else F.split(normalize_text(col), " ")
    )
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )


def ngram_counts(col: Column | str, n: int = 3) -> tuple[Column, Column]:
    """(total, distinct) n-gram counts over normalized whitespace
    tokens — the Gopher-style within-document repetition signal.
    Documents shorter than n tokens count as one gram (the whole
    text), mirroring the shingle convention. Pure array exprs.

    WARNING: per-row convenience — the gram lambda re-evaluates the
    tokenizer per gram. For datasets use ``with_repetition_stats``
    (anchored projections, ~9x faster warm)."""
    toks = F.split(normalize_text(col), " ")
    starts = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.size(grams), F.size(F.array_distinct(grams))


def repetition_ratio(col: Column | str, n: int = 3) -> Column:
    """Fraction of duplicated n-grams: 1 - distinct/total. High values
    flag boilerplate / degenerate repetition for corpus filtering."""
    total, distinct = ngram_counts(col, n)
    return 1 - distinct / total


def frequent_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-wide boilerplate detector: the ``top_k`` most frequent
    n-token spans with total occurrence and distinct-document counts —
    the report that surfaces shared headers/footers/licence blocks
    before a dedup or span-removal pass.

    Scale shape: one token explode, then a (gram, doc) pre-aggregate
    BEFORE the per-gram rollup — distinct-doc counting becomes a plain
    count over the pre-aggregate instead of a count(DISTINCT) carrying
    doc ids through the gram shuffle; both aggregates partially
    combine map-side, and the top-k is a TakeOrdered (per-partition
    heap), never a global sort. Short documents (< n tokens) yield
    their whole text as one truncated span, mirroring the shingle
    convention used by the sketch family."""
    toks = F.split(normalize_text(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    per_doc = (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .groupBy("gram", "id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(
            F.sum("c").alias("occurrences"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy(F.col("occurrences").desc(), "gram")
        .limit(top_k)
    )


def bm25_scores(
    df,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 scores for a term query over the corpus.

    Shape for scale: one explode of matching tokens only (the isin
    filter cuts the exploded stream before the shuffle), tf grouped
    per (doc, term); document frequencies and the (n_docs, avgdl)
    scalars are tiny aggregates broadcast back — the corpus itself is
    never re-shuffled. Returns (id, bm25) for every matching doc;
    rank/limit downstream.
    """
    toks = F.split(normalize_text(text_col), " ")
    d = df.select(
        F.col(id_col).alias("id"), toks.alias("t"), F.size(toks).alias("dl")
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("id", "dl", F.explode("t").alias("tok"))
        .filter(F.col("tok").isin(list(query_terms)))
        .groupBy("id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count_distinct("id").alias("df_t"))
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    score = idf * (F.col("tf") * (k1 + 1)) / denom
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
    )


def with_repetition_stats(df, text_col: str, n: int = 3):
    """Two-projection repetition stats: adds ``n_tok``, ``n_grams``,
    ``n_distinct`` and ``rep_ratio`` columns.

    The gram array is built WITHOUT a higher-order lambda:
    ``transform(starts, i -> concat_ws(slice(t, i, n)))`` evaluates an
    interpreted expression tree per gram (millions of evals per
    partition). ``arrays_zip`` of n shifted slices produces the same
    grams as token-tuple structs in a handful of vectorized collection
    ops — and distinct-counting structs equals distinct-counting the
    joined strings, since tokens cannot contain the joiner (space)
    after the split. arrays_zip pads the shorter shifted slices with
    null, which reproduces the transform version's single short gram
    for rows with fewer than n tokens."""
    toks = F.split(normalize_text(text_col), " ")
    with_t = df.withColumn("__t", toks)
    t = F.col("__t")
    m = F.greatest(F.size(t) - (n - 1), F.lit(1))
    grams = F.arrays_zip(*[F.slice(t, i + 1, m) for i in range(n)])
    return (
        with_t.withColumn("n_tok", F.size(t))
        .withColumn("__g", grams)
        .withColumn("n_grams", F.size("__g"))
        .withColumn("n_distinct", F.size(F.array_distinct("__g")))
        .withColumn(
            "rep_ratio", 1 - F.col("n_distinct") / F.col("n_grams")
        )
        .drop("__t", "__g")
    )


# ---------------------------------------------------------------------------
# Unigram-LM perplexity scoring (CCNet-style quality filtering)
# ---------------------------------------------------------------------------

def unigram_lm(
    ref_df: DataFrame,
    text_col: str,
    k_smoothing: float = 0.5,
) -> tuple[DataFrame, Column]:
    """Train an add-k-smoothed unigram language model on a reference
    corpus: one pass building (token, logp), the CCNet recipe's cheap
    stand-in for KenLM (public pipeline: score every crawled doc by
    LM cross-entropy against an in-domain reference, keep the
    low-perplexity head).

    Returns ``(lm_df, oov_logp)``: lm_df has columns (tok, logp);
    oov_logp is the literal Column for unseen tokens,
    ln(k / (N + k*(V+1))). At 100 TB the LM is vocab-sized (a few
    hundred MB at web scale) — broadcast it or let AQE pick; the
    reference pass is one explode + one hash aggregate."""
    toks = F.explode(
        F.split(normalize_text(text_col), " ")
    ).alias("tok")
    counts = (
        ref_df.select(toks)
        .filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()  # the totals action below would otherwise re-run the
    # reference explode+aggregate when the returned lm is consumed;
    # unpersist after scoring if the session is long-lived
    totals = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n_tok, vocab = (
        (int(totals["n"] or 0), int(totals["v"] or 0))
        if totals is not None
        else (0, 0)
    )
    if n_tok == 0:
        raise ValueError(
            "unigram_lm: empty reference corpus — every doc would "
            "score a degenerate cross-entropy of 0; pick a non-empty "
            "reference slice"
        )
    denom = float(n_tok) + k_smoothing * (vocab + 1)
    lm = counts.select(
        "tok",
        F.log((F.col("c") + F.lit(k_smoothing)) / F.lit(denom)).alias("logp"),
    )
    import math

    oov = F.lit(math.log(k_smoothing / denom))
    return lm, oov


#: beginning-of-sentence sentinel for the bigram LM — a token the
#: whitespace tokenizer can never produce (contains a control char).
BOS = "\x02bos"


def bigram_cross_entropy(
    df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    k_smoothing: float = 0.5,
    lam: float = 0.7,
) -> DataFrame:
    """Per-document cross-entropy under a Jelinek-Mercer interpolated
    bigram LM trained on ``ref_df`` — the CCNet-grade upgrade over
    the unigram stand-in (context makes boilerplate/in-domain text
    separate far more sharply than token frequency alone):

        p(w | prev) = lam * p_bi + (1 - lam) * p_uni
        p_bi = (c(prev, w) + k) / (c(prev, ·) + k * (V + 1))
        p_uni = (c(w) + k) / (N + k * (V + 1))

    Every document contributes a BOS-anchored first pair, so position
    one is scored under its own context like every other token.
    Unseen (prev, w) backs off to k / (c(prev, ·) + k(V+1)); an
    unseen context degenerates to the uniform 1/(V+1) in the bigram
    leg and the unigram leg carries the estimate.

    Scale shape: training = one reference pass for three count tables
    (unigram / bigram / context — all vocab- or bigram-vocab-sized,
    broadcast-eligible); scoring = one pair projection over the
    corpus + three broadcast left joins + one doc-keyed agg. Returns
    (id, n_tokens, cross_entropy, perplexity); token-less docs score
    NULL rather than vanishing."""
    import math

    def pairs_of(frame: DataFrame, *keep) -> DataFrame:
        t = F.split(normalize_text(text_col), " ")
        anchored = frame.select(*keep, t.alias("__t"))
        tt = F.col("__t")
        prevs = F.slice(
            F.concat(F.array(F.lit(BOS)), tt), 1, F.size(tt)
        )
        return (
            anchored.select(
                *[c for c in keep],
                F.explode(
                    F.zip_with(
                        prevs, tt,
                        lambda p, w: F.struct(
                            p.alias("prev"), w.alias("tok")
                        ),
                    )
                ).alias("__pr"),
            )
            .select(
                *[c for c in keep],
                F.col("__pr.prev").alias("prev"),
                F.col("__pr.tok").alias("tok"),
            )
            .filter(F.length("tok") > 0)
        )

    ref_pairs = pairs_of(ref_df).persist()
    uni = ref_pairs.groupBy("tok").agg(F.count(F.lit(1)).alias("c1"))
    bi = ref_pairs.groupBy("prev", "tok").agg(
        F.count(F.lit(1)).alias("c2")
    )
    ctx = ref_pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("cc"))
    totals = uni.agg(
        F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n_tok = int(totals["n"] or 0) if totals is not None else 0
    vocab = int(totals["v"] or 0) if totals is not None else 0
    ref_pairs.unpersist()
    if n_tok == 0:
        raise ValueError(
            "bigram_cross_entropy: empty reference corpus — pick a "
            "non-empty reference slice"
        )
    kv1 = k_smoothing * (vocab + 1)
    doc_pairs = pairs_of(df, id_col)
    scored = (
        doc_pairs.join(F.broadcast(bi), ["prev", "tok"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .join(F.broadcast(uni), "tok", "left")
        .select(
            id_col,
            F.log(
                F.lit(lam)
                * (
                    (F.coalesce("c2", F.lit(0)) + k_smoothing)
                    / (F.coalesce("cc", F.lit(0)) + F.lit(kv1))
                )
                + F.lit(1.0 - lam)
                * (
                    (F.coalesce("c1", F.lit(0)) + k_smoothing)
                    / F.lit(float(n_tok) + kv1)
                )
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("lp")).alias("cross_entropy"),
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "cross_entropy",
        F.exp("cross_entropy").alias("perplexity"),
    )


def lm_cross_entropy(
    df: DataFrame,
    lm_df: DataFrame,
    oov_logp: Column,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-document cross-entropy (and perplexity) under a unigram LM:
    explode tokens, left-join the vocab-sized LM (broadcast-eligible),
    -avg(logp) per doc. Two shuffles total (LM join + doc re-agg);
    empty docs get null scores rather than vanishing."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.split(normalize_text(text_col), " ")
        ).alias("tok"),
    ).filter(F.length("tok") > 0)
    scored = toks.join(F.broadcast(lm_df), "tok", "left").select(
        "__id", F.coalesce(F.col("logp"), oov_logp).alias("lp")
    )
    per_doc = scored.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg("lp")).alias("cross_entropy"),
    )
    return df.select(F.col(id_col)).join(
        per_doc, df[id_col] == per_doc["__id"], "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.col("cross_entropy"),
        F.exp("cross_entropy").alias("perplexity"),
    )

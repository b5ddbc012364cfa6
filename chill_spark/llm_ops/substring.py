"""Cross-document exact-substring span dedup.

Finds every maximal run of >= L consecutive tokens that occurs more
than once in the corpus (across documents OR repeated inside one) and
marks all but one canonical occurrence for removal — the
"deduplicating training data" substring pass (Lee et al. 2022),
re-expressed for Spark.

Scale design (the suffix-array of the paper is a single-machine
structure; this is the distributed equivalent):

1. **Offset fingerprints.** Each document emits one 60-bit portable
   fingerprint per token offset — the L-token gram starting there —
   built entirely from array expressions (tokenize once, slide with
   ``transform(sequence)``), so the scan is one projection, no UDF.
2. **Keeper election by reduction, not window.** ``groupBy(fp).agg(
   min(struct(id, off)), count)`` finds duplicated grams and elects
   the canonical keeper in one partial-aggregating pass — a
   boilerplate gram repeated billions of times collapses map-side
   instead of pinning one window partition. The tiny
   duplicated-grams frame joins back on the 8-byte fingerprint
   (AQE skew-splittable), linear in corpus tokens, no candidate-pair
   blowup.
3. **One shuffle on the document.** Non-keeper offsets of duplicated
   grams collapse into maximal spans with a gaps-and-islands window
   per document (overlapping/adjacent L-grams merge), then a final
   group-by emits (span_start, span_end).

Both shuffles hash-distribute evenly at 100 TB (fingerprints are
uniform; per-document island state is tiny). The fingerprint is
``phash`` (md5-prefix), reproduced verbatim by the DuckDB oracle, so
the span output is engine-exact — a production run can swap in
``xxhash64`` for ~2x scan speed without touching the plan shape.

Offsets are 1-based token positions; ``span_end`` is exclusive, so
``span_end - span_start`` is the number of tokens removed. Documents
shorter than L tokens emit no grams: they cannot share an L-token
span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .portable import phash
from .text import normalize_text

def gram_offsets(
    df: DataFrame, text_col: str, id_col: str, L: int
) -> DataFrame:
    """(id, off, fp): one portable fingerprint per token offset.

    The token array is anchored in its own projection so the
    tokenizer runs once per document, not once per gram (interpreted
    higher-order functions do no CSE — same hazard as
    ``shingle_fingerprints``).

    The input is fanned out first when its planned scan is narrower
    than the session's parallelism (``session.spread_if_narrow``): the
    per-offset fingerprint transform is an interpreted HOF — the most
    expensive map work in the whole substring family — and an
    unsplittable input (single-row-group parquet) would otherwise run
    it on ONE task per consumer subtree. At scale the scan is already
    wide and no exchange is added.
    """
    from ..session import spread_if_narrow

    df = spread_if_narrow(df)
    toks = F.split(normalize_text(text_col), " ")
    with_t = df.select(F.col(id_col), toks.alias("__t"))
    t = F.col("__t")
    starts = F.when(
        F.size(t) >= L, F.sequence(F.lit(1), F.size(t) - L + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = with_t.select(
        id_col,
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("off"),
                    phash(F.concat_ws(" ", F.slice(t, i, L))).alias("fp"),
                ),
            )
        ).alias("g"),
    )
    return grams.select(id_col, F.col("g.off").alias("off"), F.col("g.fp").alias("fp"))


def duplicate_offsets(
    df: DataFrame, text_col: str, id_col: str, L: int
) -> DataFrame:
    """(id, off) of every NON-canonical occurrence of a duplicated
    L-gram. Canonical keeper = first occurrence in (id, off) order —
    deterministic because (id, off) is unique per fingerprint.

    Hot-key-safe shape (same rationale as segment/span dedup): keeper
    election is ``groupBy(fp).agg(min(struct(id, off)), count)`` — a
    partial-aggregating reduction that collapses a corpus-scale
    boilerplate gram map-side — never a window keyed by the
    fingerprint (window partitions must colocate; AQE skew splitting
    does not apply to them). The duplicated-gram frame (one row per
    distinct duplicated fp) then equi-joins back, where AQE skew
    handling DOES apply."""
    return local_keeper_dups(gram_offsets(df, text_col, id_col, L), id_col)


def local_keeper_dups(g: DataFrame, id_col: str) -> DataFrame:
    """The keeper-election reduction over an (id, off, fp) frame:
    (id, off) of every non-first occurrence of a duplicated fp (first
    by (id, off) order). Shared by the batch and incremental paths —
    the incremental probe runs it on store-missed grams only."""
    firsts = (
        g.groupBy("fp")
        .agg(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("off").alias("o"))
            ).alias("__k"),
            F.count(F.lit(1)).alias("__cnt"),
        )
        .filter(F.col("__cnt") > 1)
        .select("fp", "__k")
    )
    return (
        g.join(firsts, "fp")
        .filter(
            ~(
                (F.col(id_col) == F.col("__k.i"))
                & (F.col("off") == F.col("__k.o"))
            )
        )
        .select(id_col, "off")
    )


def duplicate_spans(
    df: DataFrame, text_col: str, id_col: str, L: int
) -> DataFrame:
    """Maximal duplicated spans per document: (id, span_start,
    span_end, span_tokens), span_end exclusive. Overlapping or
    adjacent duplicated L-grams merge into one span (gaps-and-islands
    on the running max of span end)."""
    return merge_spans(duplicate_offsets(df, text_col, id_col, L), id_col, L)


def merge_spans(dup: DataFrame, id_col: str, L: int) -> DataFrame:
    """Gaps-and-islands merge of duplicated L-gram offsets (id, off)
    into maximal spans — the per-document window half of the span
    pipeline, shared by the batch and incremental paths."""
    dup = dup.select(id_col, "off", (F.col("off") + L).alias("__e"))
    w = Window.partitionBy(id_col).orderBy("off")
    prev_max = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.select(
        id_col,
        "off",
        "__e",
        F.when(F.col("off") > F.coalesce(prev_max, F.lit(-1)), 1)
        .otherwise(0)
        .alias("__new"),
    ).select(
        id_col,
        "off",
        "__e",
        F.sum("__new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__g"),
    )
    return (
        isl.groupBy(id_col, "__g")
        .agg(
            F.min("off").alias("span_start"),
            F.max("__e").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def substring_dedup_stats(
    df: DataFrame, text_col: str, id_col: str, L: int
) -> DataFrame:
    """Per-document removal accounting over ALL documents: (id,
    total_tokens, dup_tokens, n_spans, dup_frac). Documents with no
    duplicated span report zeros — the keep-fraction view a pipeline
    gates on before committing the rewrite."""
    spans = duplicate_spans(df, text_col, id_col, L)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_tokens").alias("dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    totals = df.select(
        id_col,
        F.size(F.split(normalize_text(text_col), " ")).alias("total_tokens"),
    )
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "total_tokens",
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest("total_tokens", F.lit(1)),
            6,
        ).alias("dup_frac"),
    )


def benchmark_overlap_spans(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    L: int,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Span-level contamination: every maximal run of >= L consecutive
    tokens in the TRAINING docs that appears verbatim anywhere in the
    BENCHMARK corpus — the substring pass turned cross-corpus. Unlike
    dedup there is no keeper election: benchmark text is frozen
    evidence, so EVERY training occurrence is contaminated.

    Scale shape: the benchmark reduces to its DISTINCT gram
    fingerprints (eval-suite-sized, not corpus-sized — broadcast by
    default; pass ``broadcast_bench=False`` for GB-scale suites and
    let the equi-join shuffle on the uniform fp key), the corpus side
    is one offset-fingerprint projection + the probe join + the
    per-doc islands merge. Linear in corpus tokens, same as the dedup
    pass. Returns (id, span_start, span_end, span_tokens).

    This is the scrub-don't-drop decontamination: where the Bloom
    gate flags whole documents (doc-level verdicts,
    ``llm_ops/bloom.py``), this locates the exact overlapping spans
    so the rest of the document survives
    (``scrub_benchmark_spans``)."""
    fps = gram_offsets(bench, text_col, id_col, L).select("fp").distinct()
    if broadcast_bench:
        fps = F.broadcast(fps)
    hits = (
        gram_offsets(docs, text_col, id_col, L)
        .join(fps, "fp")
        .select(id_col, "off")
    )
    return merge_spans(hits, id_col, L)


def contamination_attribution(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    L: int,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-benchmark-document contamination attribution: for EACH eval
    doc, how much of it leaked into the training corpus — the report
    you read before deciding which eval suites are still trustworthy
    (``benchmark_overlap_spans`` answers "what do I scrub"; this
    answers "which benchmark is burned"). TOTAL over benchmark docs
    that have at least one L-gram:

    (bench_id, n_grams, hit_grams, n_occurrences, n_corpus_docs,
     contaminated_frac)

    where ``hit_grams`` counts the doc's distinct grams found anywhere
    in the corpus, ``n_occurrences`` every corpus occurrence of them,
    and ``n_corpus_docs`` the distinct corpus docs touched. A gram
    shared by several benchmark docs attributes to each (the honest
    report — both eval items are burned).

    Scale shape: the benchmark side is its per-doc distinct gram set
    (eval-suite-sized, broadcast by default); the corpus pays one
    offset projection + the probe join; the reduction is keyed by
    bench_id, so the output and the distinct-count state are
    benchmark-sized."""
    bid = "bench_id"
    bg = (
        gram_offsets(bench, text_col, id_col, L)
        .select(F.col(id_col).alias(bid), "fp")
        .distinct()
    )
    ng = bg.groupBy(bid).agg(F.count(F.lit(1)).alias("n_grams"))
    probe = F.broadcast(bg) if broadcast_bench else bg
    hits = gram_offsets(docs, text_col, id_col, L).join(probe, "fp")
    rep = hits.groupBy(bid).agg(
        F.countDistinct("fp").alias("hit_grams"),
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_corpus_docs"),
    )
    # both sides of the final join are benchmark-sized; broadcast the
    # report so Spark never sort-merges two suite-sized frames
    return ng.join(F.broadcast(rep), bid, "left").select(
        bid,
        "n_grams",
        F.coalesce("hit_grams", F.lit(0)).alias("hit_grams"),
        F.coalesce("n_occurrences", F.lit(0)).alias("n_occurrences"),
        F.coalesce("n_corpus_docs", F.lit(0)).alias("n_corpus_docs"),
        F.round(
            F.coalesce("hit_grams", F.lit(0)) / F.col("n_grams"), 6
        ).alias("contaminated_frac"),
    )


def scrub_benchmark_spans(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    L: int,
    broadcast_bench: bool = True,
) -> DataFrame:
    """(id, cleaned): training docs with every benchmark-overlapping
    span's tokens removed — the rewrite half of
    ``benchmark_overlap_spans``, through the shared
    ``apply_span_removal`` array-filter (corpus never exploded)."""
    return apply_span_removal(
        docs,
        benchmark_overlap_spans(
            docs, bench, text_col, id_col, L,
            broadcast_bench=broadcast_bench,
        ),
        text_col,
        id_col,
    )


def remove_spans(
    df: DataFrame, text_col: str, id_col: str, L: int
) -> DataFrame:
    """Rewrite: (id, cleaned) with every duplicated span's tokens
    dropped (canonical occurrences survive)."""
    return apply_span_removal(
        df, duplicate_spans(df, text_col, id_col, L), text_col, id_col
    )


def apply_span_removal(
    df: DataFrame, spans: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, cleaned) with the GIVEN spans' tokens dropped — the
    apply half of ``remove_spans``, reused by the incremental and
    streaming paths whose spans come from a store probe. The span
    list per doc is tiny (bounded by doc length / L), so it rides
    back to the documents as an equi-join on the id and the token
    filter is one array expression — no explode of the corpus
    tokens. Docs with no spans keep their normalized text; a NULL
    text renders as '' (concat_ws never returns NULL) — callers that
    must preserve NULLs route them around the rewrite."""
    from ..session import spread_if_narrow

    spans = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    # fan a narrow input out before the rewrite: tokenize + the
    # per-token span filter is the second expansion-heavy map of the
    # span pipeline and must not serialize onto an unsplittable scan
    toks = spread_if_narrow(df).select(
        id_col, F.split(normalize_text(text_col), " ").alias("__t")
    ).join(spans, id_col, "left")
    t, sp = F.col("__t"), F.col("__spans")
    # keep token at 1-based position p unless some span covers it
    kept = F.filter(
        F.transform(t, lambda x, i: F.struct(x.alias("tok"), (i + 1).alias("p"))),
        lambda s: ~F.coalesce(
            F.exists(
                sp,
                lambda r: (s["p"] >= r["span_start"]) & (s["p"] < r["span_end"]),
            ),
            F.lit(False),
        ),
    )
    return toks.select(
        id_col,
        F.concat_ws(" ", F.transform(kept, lambda s: s["tok"])).alias("cleaned"),
    )

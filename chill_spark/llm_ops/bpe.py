"""Byte-pair-encoding vocabulary induction, Spark-first.

Classic BPE (Sennrich et al. 2016, public) trains on the *word
frequency table*, not the raw corpus — so the distributed part is one
corpus pass building (word, freq), after which each merge iteration
runs over that (comparatively tiny but still distributed) table:

  1. pair counts: explode adjacent symbol pairs, weight by word freq,
     hash-aggregate — one small shuffle per iteration
  2. best pair -> driver (a 1-row TakeOrdered)
  3. apply the merge: a fold (``F.aggregate``) over each word's symbol
     array — greedy left-to-right non-overlapping, the standard BPE
     application order; pure Column exprs, no UDF

At 100 TB the corpus pass dominates and happens ONCE; the iteration
state is |vocab| rows (millions at worst) cached in memory. This is
the engine-shaped version of the tokenizer-training preprocessing an
LLM data pipeline runs next to dedup/quality filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freqs(df: DataFrame, text_col: str, lowercase: bool = True) -> DataFrame:
    """(word, freq) from one corpus pass — the only full-data scan."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return (
        df.select(F.explode(F.split(F.trim(c), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _init_state(freqs: DataFrame) -> DataFrame:
    # word -> array of single-char symbols + end-of-word marker
    syms = F.concat(
        F.split(F.col("w"), ""), F.array(F.lit(END_OF_WORD))
    )
    return freqs.select("freq", syms.alias("syms"))


def _merge_fold(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) -> a+b as an
    array fold; a freshly merged symbol does not re-merge within the
    same pass (standard BPE application)."""
    merged = a + b

    def step(acc, x):
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return lambda syms: F.aggregate(
        syms, F.array().cast("array<string>"), step
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    lowercase: bool = True,
    checkpoint_every: int = 10,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, pair_freq)]
    in merge order. Deterministic: ties broken lexicographically.

    Every ``checkpoint_every`` merges the vocab state is
    ``localCheckpoint``ed (same discipline as components.py's label
    propagation): each merge adds one fold to the logical plan, and
    without truncation a multi-hundred-merge run spends its time in
    plan analysis, not work."""
    spark = df.sparkSession
    state = _init_state(word_freqs(df, text_col, lowercase)).cache()
    state.count()  # materialize once
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        pairs = (
            state.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.0").alias("a"), F.col("p.1").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < 2:
            break
        a, b, n = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["n"])
        merges.append((a, b, n))
        new_state = state.select(
            "freq", _merge_fold(a, b)(F.col("syms")).alias("syms")
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_state = new_state.localCheckpoint(eager=True)
        else:
            new_state = new_state.cache()
            new_state.count()
        state.unpersist()
        state = new_state
    state.unpersist()
    return merges


def bpe_segment(col, merges: list[tuple[str, str, int]]):
    """Apply learned merges to a word column (array<string> of symbols
    out). Merges apply in training order — same fold, chained."""
    syms = F.concat(F.split(col, ""), F.array(F.lit(END_OF_WORD)))
    for a, b, _ in merges:
        syms = _merge_fold(a, b)(syms)
    return syms


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-priority merge application (the production-vocab shape):
    repeatedly merge the LOWEST-rank adjacent pair present in the
    word, greedy left-to-right non-overlapping per pass.

    Equivalent to ``bpe_segment``'s one-pass-per-merge fold
    (differential-tested): a merge at rank r only creates pairs
    containing the new symbol a+b, and any rule involving a+b was
    necessarily learned AFTER r — so picking the present minimum-rank
    pair each round visits rules in the same order the fold does,
    skipping absent ones. Cost is O(passes x len) with passes bounded
    by the word length, independent of vocab size — a 32k-merge vocab
    costs the same per word as a 50-merge one, where the per-merge
    pass was O(n_merges x len)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank: int | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        a, b = best
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_docs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-level tokenizer application: (id, tokens, n_tokens) with
    the learned merges — the encode half of the tokenizer story (what
    you run over 100 TB once the vocab is frozen).

    Arrow-batched ``mapInPandas`` is the right tool here, not Column
    exprs: per-word merge application is inherently iterative (one
    fold per merge), and a ``transform``-of-50-chained-``aggregate``s
    column tree is interpreted per element. The merge table ships as a
    closure constant (tokenizer vocabs are small); bytes stay on the
    executor. Agreement with the declarative ``bpe_segment`` fold is
    differential-tested."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    )

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    schema = StructType(
        [
            StructField("id", LongType(), False),
            StructField("tokens", ArrayType(StringType()), True),
            StructField("n_tokens", IntegerType(), True),
        ]
    )

    import re

    # ASCII \s to match Spark/Java's \s+ exactly: Python's default
    # \s (and str.split()) also split on Unicode whitespace like
    # U+00A0, which Spark's tokenizer keeps inside words — a mismatch
    # would break both the round-trip contract and agreement with
    # word_freqs/bpe_segment
    ws = re.compile(r"\s+", re.ASCII)

    def run(batches):
        word_cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for i, text in zip(pdf["id"], pdf["text"]):
                t = text or ""
                if lowercase:
                    t = t.lower()
                t = ws.sub(" ", t).strip(" ")
                toks: list[str] = []
                for w in t.split(" ") if t else []:
                    enc = word_cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        word_cache[w] = enc
                    toks.extend(enc)
                out.append({"id": i, "tokens": toks, "n_tokens": len(toks)})
            yield pd.DataFrame(out, columns=["id", "tokens", "n_tokens"])

    return (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
        .mapInPandas(run, schema=schema)
    )


def decode_tokens(tokens_col) -> "F.Column":
    """Reconstruct normalized text from BPE tokens: concatenate and
    turn end-of-word markers back into spaces. Exact inverse of
    ``bpe_encode_docs`` on whitespace-normalized text — the
    round-trip is the encoder's correctness contract."""
    joined = F.array_join(tokens_col, "")
    return F.trim(F.replace(joined, F.lit(END_OF_WORD), F.lit(" ")))

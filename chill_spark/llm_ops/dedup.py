"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design: every near-dup path is **candidate generation by
LSH-style blocking + exact verification within candidates** — the
O(n²) pairwise space is never materialized. Blocking keys are plain
columns, so candidate generation is an equi-join Catalyst shuffles on
the bucket key (AQE handles skewed buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import doc_fingerprint, normalize_text, shingle_fingerprints

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(
    df: DataFrame,
    text_col: str,
    id_col: str,
    keep: str = "min",
    priority_col: Column | str | None = None,
) -> DataFrame:
    """Keep one row per identical normalized text — the survivor is the
    min (or max) id, or, with ``priority_col``, the row with the
    smallest (priority, id) pair (source-preference dedup: keep the
    curated copy over the crawl copy). Single hash-shuffle on the
    fingerprint; survivor selection is min_by over a struct ordering
    (lexicographic) — no window, no second shuffle either way."""
    fp = doc_fingerprint(text_col)
    if priority_col is not None:
        p = F.col(priority_col) if isinstance(priority_col, str) else priority_col
        order = F.struct(p.alias("p"), F.col(id_col).alias("i"))
        agg = F.min_by(F.struct(*df.columns), order)
    elif keep == "min":
        agg = F.min_by(F.struct(*df.columns), F.col(id_col))
    else:
        agg = F.max_by(F.struct(*df.columns), F.col(id_col))
    return (
        df.groupBy(fp.alias("__fp"))
        .agg(agg.alias("__row"))
        .select("__row.*")
    )


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of exact duplicates: fingerprint, group size, member ids.
    (The reporting side of exact dedup.)"""
    return (
        df.groupBy(doc_fingerprint(text_col).alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

# Hash family i: xxhash64(shingle_hash, i) — deterministic, no
# arithmetic (ANSI-safe: no long overflow), JVM-side.

def minhash_signature(
    col: Column | str, num_hashes: int = 32, shingle_k: int = 5
) -> Column:
    """Array of ``num_hashes`` minhash values over k-token shingles.

    Entirely array expressions: one pass, no UDF, no shuffle. Empty
    docs get null signatures.

    WARNING — per-row Column convenience only: the shingle expression
    is re-evaluated inside every per-hash lambda (interpreted, no CSE
    across lambdas), so cost grows ~num_hashes x shingle cost per row.
    The production pipeline (``minhash_candidates``) instead shingles
    once via ``shingle_sets`` (anchored projections) and computes
    signatures explode-and-aggregate — use that for anything big.
    """
    shingles = shingle_fingerprints(col, k=shingle_k)

    def perm(i: int):
        # closure factory: pyspark introspects lambda arity, so the
        # lambda must take exactly one arg
        return lambda h: F.xxhash64(h, F.lit(i))

    sigs = [
        F.array_min(F.transform(shingles, perm(i))) for i in range(num_hashes)
    ]
    return F.array(*sigs)


def shingle_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 5,
    portable: bool = False,
) -> DataFrame:
    """(id, distinct shingle-hash array) — the shared input of both
    LSH candidate generation and exact Jaccard verification. Persist
    it when running the full pipeline so the shingling (the dominant
    per-row cost) happens once.

    Two-projection shape, deliberately: tokens are hashed to longs in
    the first projection and shingled in the second. Higher-order
    lambdas are interpreted, not codegen'd, so if the tokenizer sat
    inside the per-window lambda the regexp+split would re-run per
    shingle — the hashed token array is referenced multiple times
    (k slices), which keeps CollapseProject from inlining it back.

    Windows come from ``arrays_zip`` of the k shifted slices of the
    token-hash array, hashed with one flat ``xxhash64(h0..hk-1)`` per
    window — 2.4x faster than the earlier per-window
    ``xxhash64(slice(...))`` (no per-window array allocation inside
    the interpreted lambda), and ~6x over hashing k-token string
    concats. Jaccard over the resulting sets is unchanged (hash sets
    have the same cardinalities).

    ``portable=True`` swaps xxhash64 for the engine-portable integer
    family (``portable``: md5 once per token, polynomial window
    combine mod 2^31-1) — bit-for-bit reproducible in DuckDB/ANSI
    SQL, so the whole MinHash pipeline downstream becomes
    oracle-checkable. Same plan shape; md5-per-token is the only cost
    over xxhash64."""
    toks = F.split(normalize_text(text_col), " ")
    if portable:
        from .portable import P31, SHINGLE_B, token_hash30

        th_df = df.select(
            F.col(id_col).alias("id"),
            F.transform(toks, lambda t: token_hash30(t)).alias("th"),
        )
        n = F.greatest(F.size("th") - (shingle_k - 1), F.lit(1))
        z = F.arrays_zip(
            *[F.slice(F.col("th"), i + 1, n) for i in range(shingle_k)]
        )

        def window_hash(s: Column) -> Column:
            acc = s["0"]
            for i in range(1, shingle_k):
                # concat_ws-style null skip isn't needed: coalesce
                # ragged tail windows' missing slots to 0 so short
                # docs still hash deterministically
                acc = (acc * SHINGLE_B + F.coalesce(s[str(i)], F.lit(0))) % P31
            return acc

        sh = F.transform(z, window_hash)
        return th_df.select("id", F.array_distinct(sh).alias("sh"))
    th_df = df.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("th"),
    )
    n = F.greatest(F.size("th") - (shingle_k - 1), F.lit(1))
    z = F.arrays_zip(
        *[F.slice(F.col("th"), i + 1, n) for i in range(shingle_k)]
    )
    sh = F.transform(
        z, lambda s: F.xxhash64(*[s[str(i)] for i in range(shingle_k)])
    )
    return th_df.select("id", F.array_distinct(sh).alias("sh"))


DEFAULT_MAX_BUCKET_SIZE = 1000


def pairs_within_buckets(
    df: DataFrame,
    bucket_cols: list[str],
    id_col: str = "id",
    payload_cols: list[str] | None = None,
    dedup_pairs: bool = True,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing a bucket.

    One shuffle (groupBy the bucket key) instead of the two a
    self-equi-join costs: collect the sorted member structs per
    bucket, expand in-bucket pairs with nested ``transform``
    (JVM-side, no UDF), explode, distinct. Pair expansion is
    quadratic in bucket size — fine for LSH buckets, whose whole
    design keeps buckets small, but web corpora always have a few
    degenerate keys (boilerplate / empty-doc signatures) whose
    buckets would expand to millions of pairs and OOM one task.
    ``max_bucket_size`` drops those buckets outright (the standard
    corpus-dedup policy: a signature shared by thousands of docs is
    boilerplate, not near-duplication, and exact dedup already
    handles identical texts). Pass ``observation`` (a
    ``pyspark.sql.Observation``) to surface how much was skipped —
    ``oversize_buckets`` / ``oversize_members`` — on the same action,
    zero extra jobs, matching the repo's no-silent-skip policy.
    Caveat: AQE's empty-relation propagation drops the CollectMetrics
    node when the capped result is EMPTY (all buckets oversize) — use
    ``minhash_bucket_stats`` for a loss-proof standalone count.

    ``payload_cols`` ride along inside the member struct, so the
    verify stage (Hamming / cosine) reads them straight off the pair
    — no join back to the sketch table. Output columns: ``id_a``,
    ``id_b``, and ``<payload>_a`` / ``<payload>_b``.
    """
    payload_cols = payload_cols or []
    member = F.struct(
        F.col(id_col).alias("i"), *[F.col(c).alias(c) for c in payload_cols]
    )
    buckets = (
        df.groupBy(*[F.col(c) for c in bucket_cols])
        .agg(F.sort_array(F.collect_set(member)).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    if max_bucket_size is not None:
        oversize = F.size("ms") > max_bucket_size
        if observation is not None:
            buckets = buckets.observe(
                observation,
                F.sum(F.when(oversize, 1).otherwise(0)).alias("oversize_buckets"),
                F.sum(F.when(oversize, F.size("ms")).otherwise(0)).alias(
                    "oversize_members"
                ),
            )
        buckets = buckets.filter(~oversize)
    pair_lists = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + 2, F.size(F.col("ms"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = buckets.select(F.explode(pair_lists).alias("p")).select(
        F.col("p.a.i").alias("id_a"),
        F.col("p.b.i").alias("id_b"),
        *[F.col(f"p.a.{c}").alias(f"{c}_a") for c in payload_cols],
        *[F.col(f"p.b.{c}").alias(f"{c}_b") for c in payload_cols],
    )
    # With a single blocking key a pair collides in at most one
    # bucket; only multi-band schemes need the extra dedup shuffle.
    return pairs.dropDuplicates(["id_a", "id_b"]) if dedup_pairs else pairs


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    sets_df: DataFrame | None = None,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    portable: bool = False,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) colliding in >=1 LSH band.

    Plan shape: explode distinct shingles to rows -> one vectorized
    hash-aggregate computing all ``num_hashes`` minhashes (map-side
    combine; each min is a tiny codegen-friendly expr, unlike a
    32-pass array_min over the shingle array, which falls out of
    whole-stage codegen and runs ~100x slower) -> band buckets from
    the signature columns -> explode bands -> one groupBy-the-bucket
    shuffle expanding in-bucket pairs (``pairs_within_buckets``) ->
    distinct pairs. No cross join anywhere.

    ``portable=True``: hash family = the overflow-free integer family
    ``(a_i * s + b_i) % (2^31-1)`` (``portable.minhash_coeffs``) and
    band buckets = md5 of the ':'-joined signature slice — both
    replayable in DuckDB SQL (see queries.q_dedup_minhash's oracle),
    making LSH candidate generation itself hash-checkable. The
    caller's ``sets_df`` must then also be portable.
    """
    banded = banded_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_k,
        sets_df=sets_df, portable=portable,
    )
    return pairs_within_buckets(
        banded, ["band", "bucket"], "id",
        max_bucket_size=max_bucket_size, observation=observation,
    )


def banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    sets_df: DataFrame | None = None,
    portable: bool = False,
) -> DataFrame:
    """(id, band, bucket) rows: minhash signatures folded into per-band
    bucket keys — the shared front half of candidate generation and
    bucket diagnostics."""
    rows_per_band = num_hashes // bands
    if sets_df is None:
        sets_df = shingle_sets(df, text_col, id_col, shingle_k, portable=portable)
    shingle_rows = sets_df.select("id", F.explode("sh").alias("sh"))
    if portable:
        from .portable import P31, minhash_coeffs

        coeffs = minhash_coeffs(num_hashes)
        sig = shingle_rows.groupBy("id").agg(
            *[
                F.min((F.lit(a) * F.col("sh") + F.lit(b)) % P31).alias(f"h{i}")
                for i, (a, b) in enumerate(coeffs)
            ]
        )
    else:
        sig = shingle_rows.groupBy("id").agg(
            *[
                F.min(F.xxhash64("sh", F.lit(i))).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        )

    def _bucket(b: int) -> Column:
        cols = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        if portable:
            return F.md5(F.concat_ws(":", *[c.cast("string") for c in cols]))
        return F.xxhash64(*cols).cast("string")

    band_structs = [
        F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
        for b in range(bands)
    ]
    return sig.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))


def minhash_bucket_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    sets_df: DataFrame | None = None,
    portable: bool = False,
) -> dict[str, int]:
    """Standalone oversize-bucket diagnostics: {"oversize_buckets",
    "oversize_members"} above ``max_bucket_size``.

    The free path is the ``observation`` hook on the main dedup job,
    but AQE's empty-relation propagation drops the CollectMetrics node
    whenever the capped pipeline yields ZERO pairs — exactly the
    degenerate all-boilerplate corpus where the number matters. This
    runs the count as its own tiny job (pass the persisted ``sets_df``
    from the main run so shingling isn't repeated; the extra cost is
    one signature+band aggregation)."""
    if max_bucket_size is None:
        # no cap -> the dedup pipeline skips nothing, by definition
        return {"oversize_buckets": 0, "oversize_members": 0}
    banded = banded_signatures(
        df, text_col, id_col, num_hashes, bands, shingle_k,
        sets_df=sets_df, portable=portable,
    )
    row = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket_size)
        .agg(
            F.count(F.lit(1)).alias("oversize_buckets"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("oversize_members"),
        )
        .first()
    )
    return {k: int(row[k]) for k in ("oversize_buckets", "oversize_members")}


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 5,
    threshold: float = 0.7,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs; keeps pairs with
    similarity >= threshold. Shingle sets join in by id (2 shuffles on
    id), intersection/union are array ops — no UDF."""
    if sets_df is None:
        sets_df = shingle_sets(df, text_col, id_col, shingle_k)
    a = sets_df.alias("sa")
    b = sets_df.alias("sb")
    joined = (
        pairs.join(a, pairs["id_a"] == F.col("sa.id"))
        .join(b, pairs["id_b"] == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sa.sh", "sb.sh"))
                / F.size(F.array_union("sa.sh", "sb.sh"))
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= threshold)


def dedup_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    portable: bool = False,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dedup: drop rows Jaccard-similar (>= threshold) to a
    surviving lower-id row. Survivors = rows that are not the higher id
    of any verified pair (greedy min-id representative). Oversize LSH
    buckets are capped (``max_bucket_size``) — pass ``observation`` to
    surface the skip counts; the CLI path prints them.

    The shingle sets are computed once and persisted (MEMORY_AND_DISK,
    evicted LRU / reused across identical plans by Spark's cache
    manager) — candidate generation and Jaccard verification all read
    them; without this the shingling runs 3x (signature + both verify
    sides). At 100 TB this cache is the materialized sketch layer and
    belongs on disk next to the corpus."""
    if sets_df is None:
        sets_df = shingle_sets(
            df, text_col, id_col, shingle_k, portable=portable
        ).persist()
    cands = minhash_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_k, sets_df=sets_df,
        portable=portable, max_bucket_size=max_bucket_size,
        observation=observation,
    )
    dups = jaccard_pairs(
        df, cands, text_col, id_col, shingle_k, threshold, sets_df=sets_df
    )
    doomed = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(doomed, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column | str, bits: int = 64) -> Column:
    """SimHash over whitespace tokens, pure array expressions.

    For each bit b: sum over tokens of +1/-1 by token-hash bit b; the
    sign of the sum sets the output bit. Built as transform(sequence)
    + aggregate — JVM-side, no UDF; cost O(tokens x bits) per row.

    WARNING: per-row convenience — the token-hash array is
    re-evaluated inside each of the ``bits`` aggregates. The dedup
    pipeline (``simhash_near_dups``) computes the same sketch
    explode-and-aggregate; use that for datasets.
    """
    toks = F.split(normalize_text(col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def vote(b: int):
        # closure factory (shift amounts must be static ints)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for b in range(bits):
        votes = F.aggregate(hashes, F.lit(0), vote(b))
        bit = F.when(
            votes > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(bit)
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    block_bits: int = 16,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top ``block_bits`` bits
    (a rotation-free approximation of the classic 4-table scheme),
    verify Hamming distance within blocks.

    The sketch is computed explode-and-aggregate (token rows -> 64
    vectorized vote sums -> bit assembly) rather than via the
    64-aggregate ``simhash`` Column expr — same result, but each agg
    is a small codegen-friendly expression.

    ``portable=True``: token hash = md5-based 60-bit ``portable.phash``
    and the sketch uses 60 bits (bits 0..59, block = top ``block_bits``
    of 60) — every step (shift/AND votes, bit assembly, xor+bit_count
    Hamming) is plain integer SQL, so the whole pipeline replays in
    DuckDB (queries.q_dedup_simhash's oracle)."""
    bits = 60 if portable else 64
    if portable:
        from .portable import phash

        th = phash(F.col("tok"))
    else:
        th = F.xxhash64("tok")
    tok_rows = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    ).withColumn("th", th)
    votes = tok_rows.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sh = F.lit(0).cast("long")
    for b in range(bits):
        sh = sh.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
        )
    h = votes.select(F.col("id"), sh.alias("sh")).withColumn(
        "blk", F.shiftrightunsigned(F.col("sh"), bits - block_bits)
    )
    pairs = pairs_within_buckets(
        h, ["blk"], "id", payload_cols=["sh"], dedup_pairs=False,
        max_bucket_size=max_bucket_size, observation=observation,
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            hamming64(F.col("sh_a"), F.col("sh_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

_COSINE_KERNEL = None


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays — one vectorized Arrow
    pass (vecassign.cosine_cols_udf), bit-identical to the
    zip_with/aggregate fold it replaces (same dimension-order
    accumulation, NULL for null/length-mismatched pairs, raises on a
    zero-norm side exactly like ANSI division). The interpreted
    higher-order-function form paid ~3*dim interpreted lambda steps
    per row/pair (CodegenFallback — optimization guide §4.2)."""
    global _COSINE_KERNEL
    if _COSINE_KERNEL is None:
        from .vecassign import cosine_cols_udf

        _COSINE_KERNEL = cosine_cols_udf()
    return _COSINE_KERNEL(a, b)


def cosine_sim_expr(a: Column, b: Column) -> Column:
    """The original pure-Column cosine (zip_with dot + aggregate
    norms, JVM-side) — kept as the differential-test reference and
    for callers that must stay expression-only."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def _mode_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimension as the MODE of row sizes — robust to a null or
    wrong-dim vector being the first row returned (a bare first()
    would crash on null or silently null out every valid row)."""
    row = df.select(F.mode(F.size(F.col(vec_col))).alias("d")).first()
    return int(row["d"]) if row and row["d"] is not None else 0


def hyperplane_vectors(
    dim: int, planes: int, bands: int = 1, seed: int = 42
) -> list[list[list[float]]]:
    """bands x planes x dim deterministic gaussian hyperplanes from one
    seeded RNG stream. Plain floats (not engine state), so a SQL
    oracle can inline the identical planes and replay the bucketing;
    with bands=1 the stream matches the original single-band layout."""
    import random

    rng = random.Random(seed)
    return [
        [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(planes)]
        for _ in range(bands)
    ]


def _hyperplane_bucket(v: Column, plane_vecs: list[list[float]]) -> Column:
    """Sign-bit bucket id of ``v`` (array<double>) under the given
    planes: bit i = (v . plane_i >= 0)."""
    bucket = None
    for i, p in enumerate(plane_vecs):
        dot = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(x)) for x in p]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**i)
        bucket = bit if bucket is None else bucket + bit
    return bucket


def embedding_near_dups(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 42,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs by embedding cosine: random-hyperplane LSH bucket
    (sign bits of dot products with ``planes`` fixed random vectors)
    -> in-bucket pair expansion (one shuffle) -> exact cosine verify.

    Single-table blocking: a pair is found only if it agrees on ALL
    ``planes`` sign bits, so recall at a given cosine threshold decays
    as (1 - angle/pi)^planes. Use ``embedding_near_dups_banded`` when
    recall matters — this variant remains for the cheapest
    one-shuffle screen."""
    if dim is None:
        dim = _mode_dim(df, vec_col)
    v = F.col(vec_col)
    bucket = _hyperplane_bucket(
        v.cast("array<double>"), hyperplane_vectors(dim, planes, 1, seed)[0]
    )
    h = df.select(
        F.col(id_col).alias("id"),
        v.cast("array<double>").alias("v"),
        bucket.alias("bkt"),
    )
    pairs = pairs_within_buckets(
        h, ["bkt"], "id", payload_cols=["v"], dedup_pairs=False,
        max_bucket_size=max_bucket_size, observation=observation,
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine_sim(F.col("v_a"), F.col("v_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _banded_bucket_udf(allv: list[list[list[float]]]):
    """All band buckets in ONE Arrow-batched matmul: (batch x dim) @
    (dim x bands*planes) -> sign bits -> per-band bucket ids. The
    Column-expression route (bands x planes chained zip_with/aggregate
    higher-order functions) is interpreted per element — measured
    ~50x slower at 48 plane-dots per row — and the flat
    element_at-sum expansion overflows janino codegen at 3000+ terms.
    Dense linear algebra over embeddings is exactly the vectorized-
    pandas case; fp64 matmul keeps sign decisions identical to the
    SQL oracle's per-plane dot products."""
    from pyspark.sql.functions import pandas_udf

    P = np.array(
        [p for band in allv for p in band], dtype=np.float64
    )  # (bands*planes, dim)
    n_bands, n_planes = len(allv), len(allv[0])
    w = (2 ** np.arange(n_planes)).astype(np.int64)

    dim = P.shape[1]

    @pandas_udf("array<long>")
    def f(vs: pd.Series) -> pd.Series:
        vals = vs.to_numpy()
        # null / wrong-dim vectors get a null bucket array (posexplode
        # then drops them from candidates — the graceful degradation
        # the Column path had) instead of crashing np.stack
        ok = np.array([v is not None and len(v) == dim for v in vals])
        out = np.full(len(vals), None, dtype=object)
        if ok.any():
            x = np.stack(vals[ok]).astype(np.float64)
            bits = (x @ P.T >= 0).astype(np.int64)
            bkts = bits.reshape(len(x), n_bands, n_planes) @ w
            for j, row in zip(np.nonzero(ok)[0], bkts):
                out[j] = row
        return pd.Series(out)

    return f


def cosine_pairs_arrow(v_a, v_b):
    """Row-wise cosine of two array columns as one Arrow batch
    (einsum + vectorized norms). Same math as ``cosine_sim`` —
    used on the pair-verify hot path where the interpreted
    zip_with/aggregate tree costs ~100x per row."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        av, bv = a.to_numpy(), b.to_numpy()
        ok = np.array([
            x is not None and y is not None and len(x) == len(y)
            for x, y in zip(av, bv)
        ])
        out = np.full(len(av), np.nan)
        if ok.any():
            x = np.stack(av[ok]).astype(np.float64)
            y = np.stack(bv[ok]).astype(np.float64)
            dots = np.einsum("ij,ij->i", x, y)
            out[ok] = dots / (
                np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1)
            )
        return pd.Series(out)

    return f(v_a, v_b)


def segment_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 16,
) -> DataFrame:
    """Corpus-wide exact segment dedup — the CCNet/C4 paragraph-dedup
    shape applied to fixed token windows (the corpus has no paragraph
    breaks): every document is cut into ``seg_tokens``-token segments;
    a segment occurring at multiple positions across the corpus
    survives only at its FIRST occurrence (min (doc_id, seg_idx)) and
    is dropped everywhere else; documents are reassembled from their
    surviving segments. Documents reduced to nothing disappear.

    Output: (id, n_segments, n_kept, text_kept), one row per doc with
    at least one surviving segment.

    Shape: one explode -> ONE aggregation shuffle keyed by the segment
    text (``min(struct(id, seg_idx))`` picks the first occurrence;
    the doc's segment count rides the struct, so no join-back) -> one
    per-doc regroup. Never a self-join and never a window: a window
    over ``seg_text`` would colocate every occurrence of a hot
    segment in one task (AQE's skew splitting applies to join and
    aggregate shuffles, NOT to window partitions), so a corpus-scale
    boilerplate segment — billions of identical 16-token windows at
    100 TB — would serialize. The aggregate form partial-aggregates
    map-side: each input partition emits at most one candidate per
    distinct segment, collapsing hot keys before the shuffle.
    Reference analog: none (the reference has no corpus-level dedup);
    the operator mirrors CCNet's shard-level paragraph dedup.
    """
    from .chunking import tokenize_ws
    from .text import normalize_text

    toks = tokenize_ws(normalize_text(text_col))
    d = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__t"),
        F.size(toks).alias("__n"),
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("__n") - 1, F.lit(0)), F.lit(seg_tokens)
    )
    segs = d.select(
        "id",
        F.size(starts).alias("n_segments"),
        F.explode(starts).alias("seg_idx"),
        F.col("__t"),
    ).select(
        "id",
        "n_segments",
        "seg_idx",
        F.array_join(
            F.slice(F.col("__t"), F.col("seg_idx") + 1, seg_tokens), " "
        ).alias("seg_text"),
    )
    # struct min orders by (id, seg_idx) — n_segments is functionally
    # dependent on id, so it never influences the ordering; it rides
    # along to spare a join back to the per-doc frame
    kept = (
        segs.groupBy("seg_text")
        .agg(F.min(F.struct("id", "seg_idx", "n_segments")).alias("__w"))
        .select(
            F.col("__w.id").alias("id"),
            F.col("__w.seg_idx").alias("seg_idx"),
            F.col("__w.n_segments").alias("n_segments"),
            "seg_text",
        )
    )
    member = F.struct(F.col("seg_idx"), F.col("seg_text"))
    return (
        kept.groupBy("id", "n_segments")
        .agg(F.sort_array(F.collect_list(member)).alias("__ms"))
        .select(
            "id",
            "n_segments",
            F.size("__ms").alias("n_kept"),
            F.array_join(
                F.transform(F.col("__ms"), lambda m: m["seg_text"]), " "
            ).alias("text_kept"),
        )
    )


def segment_dedup_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 16,
) -> str:
    """DuckDB SQL mirroring ``segment_dedup`` exactly (same
    normalization, same window-of-first-occurrence rule). This is the
    single source of truth — queries.q_segment_dedup builds its oracle
    from it (BIGINT casts keep pandas dtypes aligned with Spark's
    long counters)."""
    return f"""
    WITH segs AS (
        SELECT id, n_segments, seg_idx,
               array_to_string(t[seg_idx + 1 : seg_idx + {seg_tokens}], ' ')
                   AS seg_text
        FROM (
            SELECT id, t,
                   len(range(0, greatest(len(t) - 1, 0) + 1, {seg_tokens}))
                       AS n_segments,
                   unnest(range(0, greatest(len(t) - 1, 0) + 1, {seg_tokens}))
                       AS seg_idx
            FROM (
                SELECT {id_col} AS id,
                       string_split(
                           trim(regexp_replace(lower({text_col}),
                                               '\\s+', ' ', 'g')), ' ') AS t
                FROM {table}
            )
        )
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY seg_text ORDER BY id, seg_idx) AS rn
        FROM segs
    )
    SELECT id, CAST(n_segments AS BIGINT) AS n_segments,
           CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(seg_text, ' ' ORDER BY seg_idx) AS text_kept
    FROM ranked
    WHERE rn = 1
    GROUP BY id, n_segments
    """


def hyperplane_recall(threshold: float, planes: int, bands: int) -> float:
    """Analytic recall of sign-bit banded LSH for a pair at exactly
    ``cosine == threshold``: per-plane agreement p = 1 - theta/pi,
    one-band collision p^planes, any-band 1-(1-p^planes)^bands.
    Pairs above the threshold do better (p grows with cosine), so
    this is the recall FLOOR over the supported regime."""
    import math

    t = max(-1.0, min(1.0, threshold))
    p = 1.0 - math.acos(t) / math.pi
    return 1.0 - (1.0 - p ** planes) ** bands


def plan_hyperplane_lsh(
    threshold: float,
    target_recall: float = 0.95,
    planes: int | None = None,
    max_bands: int = 64,
    max_planes: int = 64,
) -> tuple[int, int]:
    """Pick (planes, bands) meeting ``target_recall`` at the declared
    cosine ``threshold`` — the knob the r3 defaults lacked: 8 bands x
    6 planes gives ~99% recall at cosine>=0.9 but only ~46% at the
    laxer >=0.4 regime, and nothing failed loudly when a caller ran
    outside the designed operating point.

    ``planes`` is the precision knob (more planes -> fewer random
    collisions per band -> smaller buckets, but more bands needed for
    the same recall). When omitted, the largest planes count <=
    ``max_planes`` whose band requirement fits ``max_bands`` is
    chosen — most selective buckets for the band budget. The
    ``max_planes`` ceiling (default 64 — one packed long of sign
    bits per band) exists because at tight thresholds the band
    requirement stays flat for a long run of plane counts and the
    "largest fitting" answer would otherwise be unbounded. Raises
    when even planes=1 can't meet the target within ``max_bands``
    (the threshold is too lax for sign-bit LSH; use more bands or a
    different blocking)."""
    import math

    if not 0 < target_recall < 1:
        raise ValueError("target_recall must be in (0, 1)")
    t = max(-1.0, min(1.0, threshold))
    p = 1.0 - math.acos(t) / math.pi
    if p <= 0.0:
        raise ValueError(f"threshold {threshold} gives zero plane agreement")

    def bands_for(n_planes: int) -> int:
        q = p ** n_planes
        if q >= 1.0:
            return 1
        return max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - q)))

    if planes is not None:
        b = bands_for(planes)
        if b > max_bands:
            raise ValueError(
                f"{planes} planes needs {b} bands for recall "
                f"{target_recall} at cosine>={threshold} (max_bands="
                f"{max_bands}) — lower planes or raise the budget"
            )
        return planes, b
    for n in range(max_planes, 0, -1):
        b = bands_for(n)
        if b <= max_bands:
            return n, b
    raise ValueError(
        f"no (planes, bands) within {max_bands} bands reaches recall "
        f"{target_recall} at cosine>={threshold}"
    )


def embedding_near_dups_banded(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    planes: int = 6,
    bands: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    dim: int | None = None,
) -> DataFrame:
    """Multi-band hyperplane LSH (the recall-bearing scale path, same
    shape as MinHash banding): ``bands`` independent plane sets; a
    pair becomes a candidate when it collides in ANY band, lifting
    recall from p^planes to 1-(1-p^planes)^bands for per-plane
    agreement p. One explode to (band, bucket) keys -> one shuffle ->
    in-bucket pair expansion -> cross-band dedup -> exact cosine
    verify. Verified pairs are exact cosines, so banding only ever
    ADDS true pairs; the recall floor vs the all-pairs baseline is
    pinned in tests/test_llm_ops.py.

    Supported regime of the DEFAULTS (6 planes x 4 bands): designed
    for tight thresholds — ~95% analytic recall at cosine>=0.95, ~87%
    at >=0.9, decaying fast below (~23% at >=0.4). Callers targeting a
    laxer threshold or a recall floor should derive (planes, bands)
    from ``plan_hyperplane_lsh(threshold, target_recall)`` instead of
    trusting the defaults; ``hyperplane_recall`` gives the analytic
    floor for any setting."""
    if dim is None:
        dim = _mode_dim(df, vec_col)
    allv = hyperplane_vectors(dim, planes, bands, seed)
    v = F.col(vec_col).cast("array<double>")
    # ids ONLY through expansion + cross-band dedup: multi-band
    # candidate volume is bands x the single-band count and mostly
    # random collisions, so dragging two dim-sized vectors per
    # candidate through the bucket shuffle and the dedup shuffle
    # multiplies bytes moved by ~1000x (measured 9.3s vs 1.3s at
    # sf0.1). Vectors join back per UNIQUE pair for the verify.
    bucket_f = _banded_bucket_udf(allv)
    h = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(bucket_f(v)).alias("band", "bkt"),
    )
    pairs = pairs_within_buckets(
        h, ["band", "bkt"], "id", dedup_pairs=True,
        max_bucket_size=max_bucket_size, observation=observation,
    )
    vecs = df.select(F.col(id_col).alias("id"), v.alias("v"))
    a = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_pairs_arrow(F.col("v_a"), F.col("v_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dedup_minhash_cc(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    portable: bool = False,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    observation=None,
    sets_df: DataFrame | None = None,
) -> DataFrame:
    """Transitively-correct near-dedup: MinHash+LSH candidates ->
    exact Jaccard verify -> connected components -> keep the min-id
    doc per duplicate *cluster*.

    ``dedup_minhash``'s greedy one-hop rule under-dedups chains: with
    verified pairs (1,3),(2,3) it dooms only 3, keeping both 1 and 2
    although they're transitive duplicates. The closure collapses the
    whole component (the standard corpus-dedup policy, cf. the
    big-web-crawl dedup pipelines). Costs the CC iteration's keyed
    shuffles on the (tiny) verified-pair edge list on top of the LSH
    pipeline — edges, not corpus, dominate nothing at 100 TB."""
    from .components import component_survivors, connected_components

    if sets_df is None:
        sets_df = shingle_sets(
            df, text_col, id_col, shingle_k, portable=portable
        ).persist()
    cands = minhash_candidates(
        df, text_col, id_col, num_hashes, bands, shingle_k, sets_df=sets_df,
        portable=portable, max_bucket_size=max_bucket_size,
        observation=observation,
    )
    dups = jaccard_pairs(
        df, cands, text_col, id_col, shingle_k, threshold, sets_df=sets_df
    )
    comps = connected_components(dups.select("id_a", "id_b"), "id_a", "id_b")
    return component_survivors(df, comps, id_col)

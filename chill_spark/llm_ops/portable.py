"""Engine-portable hashing for sketch operators.

The default sketch hash is ``xxhash64`` — JVM-side, fastest, but not
reproducible outside Spark, which makes MinHash/SimHash pipelines
uncheckable by an external SQL oracle. ``phash`` is the portable
alternative: the first 15 hex chars of md5 as a 60-bit non-negative
BIGINT. Exactly reproducible in DuckDB as::

    ('0x' || substring(md5(x), 1, 15))::BIGINT

(15 hex chars = 60 bits, so the value fits signed 64-bit in every
engine; md5 of UTF-8 text matches across Spark/DuckDB/Postgres/
Snowflake). Collision behavior at 60 bits is indistinguishable from
64 for dedup purposes.

Cost: md5 is ~5-10x slower than xxhash64 per call, but the sketch
stages it feeds are dominated by tokenization/shuffle, so portable
pipelines stay within the same bench band. Production pipelines that
never need cross-engine replay can keep ``portable=False``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB expression template mirroring :func:`phash` — `{x}` is the
#: (VARCHAR) operand SQL.
PHASH_SQL = "('0x' || substring(md5({x}), 1, 15))::BIGINT"


def phash(col: Column | str) -> Column:
    """60-bit engine-portable hash of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def phash_seeded(col: Column | str, seed: int) -> Column:
    """Seeded family member: H_i(x) = phash(x || ':' || i) over the
    decimal rendering of a BIGINT input — the MinHash permutation
    family. DuckDB: phash(x::VARCHAR || ':' || i)."""
    c = F.col(col) if isinstance(col, str) else col
    return phash(F.concat_ws(":", c.cast("string"), F.lit(str(seed))))


# ---------------------------------------------------------------------------
# Overflow-free integer hash family (the fast portable path)
#
# md5 per *seed* per *shingle* makes portable MinHash ~2x the xxhash64
# baseline. This family pays md5 once per TOKEN and derives everything
# else with plain 64-bit integer arithmetic whose intermediates are
# bounded < 2^62 — identical (and overflow-safe) under Spark ANSI and
# DuckDB strict BIGINT semantics:
#
#   token:   t  = phash(tok) & (2^30 - 1)                    (30 bits)
#   shingle: s  = fold over window: (acc * B + t) % P        (31 bits)
#   seed i:  h_i = (a_i * s + b_i) % P                       (31 bits)
#
# with P = 2^31 - 1 (prime), B = 1_000_003, and (a_i, b_i) drawn from
# a fixed seeded PRNG (same constants inlined into the SQL oracle).
# Bounds: acc < P < 2^31, so acc*B < 2^51; a_i < P, s < P so
# a_i*s + b_i < 2^62.  31-bit shingle ids collide ~n^2/2^32 — a few
# hundred at 10^6 distinct shingles, noise for Jaccard estimation.
# ---------------------------------------------------------------------------

P31 = 2_147_483_647  # 2^31 - 1, prime
SHINGLE_B = 1_000_003
TOKEN_MASK = (1 << 30) - 1


def token_hash30(col: Column | str) -> Column:
    """30-bit portable token hash: phash masked to 30 bits.
    DuckDB: ``phash(tok) & 1073741823``."""
    return phash(col).bitwiseAND(F.lit(TOKEN_MASK))


def minhash_coeffs(num_hashes: int, seed: int = 9) -> list[tuple[int, int]]:
    """The (a_i, b_i) constants — derived from a fixed PRNG so the
    Spark plan and the SQL oracle inline identical literals."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, P31), rng.randrange(0, P31))
        for _ in range(num_hashes)
    ]

"""Deduplication families for web-scale training-data pipelines.

Five strategies, cheapest-first, all expressed as DataFrame plans (the
north-rule generalization of the reference's exact row-dedup,
``core/quality_checks.py:861-883`` in /root/reference, which computed
``len(df) - len(df.drop_duplicates())`` on a driver-materialized frame):

- **exact**        — 64-bit text signature, groupBy/window. One shuffle on
                     the hash; keep-first deterministic by id.
- **n-gram Jaccard** — shingle inverted index + self-join; exact
                     similarity, quadratic only within shared shingles.
- **MinHash + LSH** — per-doc signature (num_hashes permutations via
                     seeded xxhash64), banded bucket join; candidate
                     pairs only where a band collides. The scale path:
                     shuffle volume is O(docs × bands), never O(docs²).
- **SimHash**      — 64-bit weighted-bit fingerprint; near-dups =
                     Hamming distance ≤ k, found via pigeonhole banding
                     (split into k+1 chunks; a pair within distance k
                     must agree exactly on ≥1 chunk).
- **embedding cosine** — delegated to dq.similarity (hyperplane-LSH
                     bucketed or brute-force top-k).

Everything is a native Column expression — signatures are computed
row-local inside whole-stage codegen; the only shuffles are the explicit
groupBy/join on candidate keys. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dq.textstats import tokens

SHINGLE_SEP = "␟"        # ␟ — never appears in whitespace-split tokens


# ---------------------------------------------------------------- exact ---

def exact_signature(text: Column, id_col: Column) -> Column:
    """64-bit signature; NULL/empty text falls back to a per-row value so
    the null bucket cannot skew the shuffle (they dedup to themselves)."""
    return F.when(
        text.isNotNull() & (F.trim(text) != ""), F.xxhash64(text)
    ).otherwise(F.xxhash64(id_col, F.lit("__null__")))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the first (smallest id) row of every exact-duplicate group.

    Adds ``is_dup_copy`` (True = shadowed copy). Window over the 64-bit
    signature → single hash shuffle; AQE splits any skewed bucket.
    """
    sig = exact_signature(F.col(text_col), F.col(id_col))
    w = Window.partitionBy("_sig").orderBy(id_col)
    return (df.withColumn("_sig", sig)
              .withColumn("is_dup_copy", F.row_number().over(w) > 1)
              .drop("_sig"))


def exact_dup_stats(df: DataFrame, group_cols: list[str],
                    text_col: str = "text") -> DataFrame:
    """Per-group duplicate tallies: total, distinct texts, dup rows."""
    return (df.groupBy(*group_cols)
              .agg(F.count(F.lit(1)).alias("total_rows"),
                   F.count_distinct(F.col(text_col)).alias("distinct_texts"))
              .withColumn("duplicate_rows",
                          F.col("total_rows") - F.col("distinct_texts")))


# ------------------------------------------------------------- shingles ---

def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-gram token shingles as an array<string> (row-local)."""
    toks = tokens(text)
    cnt = F.size(toks)
    starts = F.when(cnt >= n, F.sequence(F.lit(1), cnt - n + 1)) \
              .otherwise(F.array().cast("array<int>"))
    return F.array_distinct(F.transform(
        starts, lambda i: F.array_join(F.slice(toks, i, n), SHINGLE_SEP)))


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  min_num: int = 1, min_den: int = 2) -> DataFrame:
    """Exact n-gram Jaccard similar pairs with sim ≥ min_num/min_den.

    Plan: explode distinct shingles → inverted index → self-equi-join on
    shingle (only docs sharing ≥1 shingle ever meet) → count intersection
    → integer cross-multiplied threshold (no floats; bit-reproducible in
    a SQL oracle). Output: (id_a, id_b, intersection, size_a, size_b,
    union_size) with id_a < id_b.

    Scale: the join fans out by shingle document-frequency; for web-scale
    corpora cap hot shingles upstream (drop shingles with df > cap) or
    use :func:`minhash_lsh_pairs` — this operator is the *exact* oracle
    the approximate ones are validated against.
    """
    base = df.select(F.col(id_col).alias("_id"),
                     shingles(F.col(text_col), n).alias("_sh"))
    sizes = base.select("_id", F.size("_sh").alias("_size"))
    inv = base.select("_id", F.explode("_sh").alias("_s"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (a.join(b, (F.col("a._s") == F.col("b._s"))
                    & (F.col("a._id") < F.col("b._id")))
             .groupBy(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("intersection")))
    out = (inter
           .join(sizes.select(F.col("_id").alias("id_a"),
                              F.col("_size").alias("size_a")), "id_a")
           .join(sizes.select(F.col("_id").alias("id_b"),
                              F.col("_size").alias("size_b")), "id_b"))
    union = F.col("size_a") + F.col("size_b") - F.col("intersection")
    return (out.withColumn("union_size", union)
               .filter(F.col("intersection") * min_den
                       >= F.col("union_size") * min_num))


# -------------------------------------------------------------- minhash ---

def minhash_signature(text: Column, num_hashes: int = 64,
                      n: int = 3) -> Column:
    """Array of ``num_hashes`` minima over seeded xxhash64 of shingles.

    One pass over the shingle array per hash function — all inside
    codegen, no shuffle. Empty shingle sets yield an empty array (callers
    must filter; such docs have no content to collide on).
    """
    sh = shingles(text, n)
    return F.when(F.size(sh) > 0, F.array(*[
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])).otherwise(F.array().cast("array<bigint>"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      bands: int = 16, n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    Signature of ``num_hashes`` minhashes split into ``bands`` bands of
    ``num_hashes // bands`` rows; docs agreeing on ALL rows of ≥1 band
    become a candidate pair. With r rows/band, P(candidate) ≈
    1-(1-s^r)^b — the classic S-curve (Mining of Massive Datasets §3.4).

    Plan shape: explode to (band_id, band_hash) keys → self-join on the
    band key → distinct pairs. Shuffle is O(docs × bands); within-bucket
    blowup is bounded by collision rate, and AQE skew-join splits any
    pathological bucket. Returns (id_a, id_b) with id_a < id_b, plus the
    estimated Jaccard from full-signature agreement.
    """
    rows = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, n)
    base = (df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
              .filter(F.size("_sig") > 0))
    bandkeys = base.select(
        "_id", "_sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col("_sig")[b * rows + r]
                                  for r in range(rows)]).alias("bh"))
            for b in range(bands)
        ])).alias("_bk"))
    a, b = bandkeys.alias("a"), bandkeys.alias("b")
    pairs = (a.join(b, (F.col("a._bk") == F.col("b._bk"))
                    & (F.col("a._id") < F.col("b._id")))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"),
                     F.col("a._sig").alias("_sa"),
                     F.col("b._sig").alias("_sb"))
             .dropDuplicates(["id_a", "id_b"]))
    est = (F.size(F.filter(F.zip_with("_sa", "_sb",
                                      lambda x, y: x == y),
                           lambda m: m))
           / F.lit(float(num_hashes)))
    return pairs.withColumn("est_jaccard", est).drop("_sa", "_sb")


# -------------------------------------------------------------- simhash ---

def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens (Charikar 2002 shape).

    For each bit b: sum over tokens of +1 if bit b of xxhash64(token) is
    set else -1; fingerprint bit b = (sum > 0). Implemented as a single
    ``F.aggregate`` over the token array carrying a 64-counter array —
    row-local, no shuffle, no UDF. NULL/empty text → NULL fingerprint.
    (Bit positions are unrolled as Python ints: pyspark's shift functions
    take literal shift amounts only.)
    """
    toks = tokens(text)
    counters = F.aggregate(
        toks,
        F.array(*[F.lit(0) for _ in range(64)]),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[
                F.when(F.shiftright(F.xxhash64(t), b)
                       .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for b in range(64)]),
            lambda x, y: x + y),
    )
    fp = F.lit(0).cast("bigint")
    for b in range(64):
        fp = fp.bitwiseOR(
            F.when(F.element_at(counters, b + 1) > 0,
                   F.lit(1 << b if b < 63 else -(1 << 63)).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint")))
    return F.when(F.size(toks) > 0, fp)


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks; any pair within the distance budget must
    match exactly on at least one chunk (Manku et al., WWW'07). Join on
    (chunk_id, chunk_value), then verify with ``bit_count(xor)``.
    Shuffle is O(docs × chunks); the exact check is join-local.
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    fp = simhash64(F.col(text_col))
    base = (df.select(F.col(id_col).alias("_id"), fp.alias("_fp"))
              .filter(F.col("_fp").isNotNull()))
    keyed = base.select("_id", "_fp", F.explode(F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftrightunsigned(F.col("_fp"), c * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("cv"))
        for c in range(chunks)
    ])).alias("_ck"))
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp")))
    return (a.join(b, (F.col("a._ck") == F.col("b._ck"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .dropDuplicates(["id_a", "id_b"]))

"""Deterministic, fully-distributed generator for the ``webpages`` table.

Implements FIXTURES.md §1: schema ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` per ``BASELINE.json input_hint``.

Scale design: every column is a pure JVM-side function of the row id via
``xxhash64`` — no driver-side RNG state, no collects, no cross-row joins.
``spark.range(n)`` parallelizes the id space, so the same code generates
2k rows for a smoke test or 10^12 rows on a 1000-executor cluster with
identical per-row content (content depends only on id and SEED, never on
partitioning). Duplicate rows share a *content key* drawn from a small
pool, so exact-duplicate groups exist without any shuffle at generation
time.

Defect buckets (hash(id) % 100, FIXTURES.md §1 fractions):
  0-7   PII rows (email + phone + IPv4 + toxicity-lexicon word appended)
  8-12  exact-duplicate texts (shared content key)
  13-17 too-short docs (< 50 words)
  18-20 symbol-heavy docs
  21-23 low-stopword docs
  24-26 repetitive docs (one sentence repeated)
  27    NULL text            28  empty-string text
  29-32 French  33-35 German  36-37 Arabic  38 gibberish ("unk")
  39-99 clean English
"""

from __future__ import annotations

import calendar

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dq.vocab import (
    AR_WORDS,
    DE_WORDS,
    EN_CONTENT,
    EN_STOPWORDS,
    FR_WORDS,
    GIB_WORDS,
    PII_NAMES,
    PII_TLDS,
    TOXIC_LEXICON,
)

SEED = 42
N_DOMAINS = 200
# Fixed 30-day WARC window ending 2025-10-02 23:59:59 UTC (FIXTURES.md §1).
_WINDOW_END = calendar.timegm((2025, 10, 2, 23, 59, 59, 0, 0, 0))
_WINDOW_SEC = 30 * 86400

# bucket ranges (inclusive) — exported so tests can recompute expectations
BUCKETS = {
    "pii": (0, 7),
    "dup": (8, 12),
    "short": (13, 17),
    "symbol": (18, 20),
    "lowstop": (21, 23),
    "repeat": (24, 26),
    "null": (27, 27),
    "empty": (28, 28),
    "fr": (29, 32),
    "de": (33, 35),
    "ar": (36, 37),
    "gib": (38, 38),
    "clean": (39, 99),
}

_SYMBOLS = ["#", "@@", "^^", "~~", "||", "<>", "**", "{}", "[]", "$$"]


def _h(*cols) -> Column:
    return F.xxhash64(*cols, F.lit(SEED))


def _pick(words: list[str], hcol: Column) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.element_at(arr, (F.pmod(hcol, F.lit(len(words))) + 1).cast("int"))


def _in_bucket(bucket: Column, name: str) -> Column:
    lo, hi = BUCKETS[name]
    return (bucket >= lo) & (bucket <= hi)


def _word_stream(ck: Column, nw: Column, tag: str, words: list[str],
                 stop_frac_pct: int = 0, stopwords: list[str] | None = None,
                 symbol_pct: int = 0) -> Column:
    """Array of ``nw`` words, each a pure function of (content key, position).

    ``stop_frac_pct``% of positions draw from ``stopwords``; ``symbol_pct``%
    of words get a symbol token appended (symbol-heavy docs). A period is
    appended roughly every 12th word so punctuation ratios are realistic.
    """
    def word(i: Column) -> Column:
        h = _h(ck, i, F.lit(tag))
        base = _pick(words, F.xxhash64(h, F.lit(2)))
        if stop_frac_pct and stopwords:
            base = F.when(
                F.pmod(F.xxhash64(h, F.lit(1)), 100) < stop_frac_pct,
                _pick(stopwords, F.xxhash64(h, F.lit(3))),
            ).otherwise(base)
        out = F.concat(
            base, F.when(F.pmod(h, 12) == 0, F.lit(".")).otherwise(F.lit(""))
        )
        if symbol_pct:
            out = F.when(
                F.pmod(F.xxhash64(h, F.lit(4)), 100) < symbol_pct,
                F.concat(out, F.lit(" "), _pick(_SYMBOLS, F.xxhash64(h, F.lit(5)))),
            ).otherwise(out)
        return out

    return F.transform(F.sequence(F.lit(1), nw.cast("int")), word)


def _en_text(ck: Column, nw: Column) -> Column:
    return F.array_join(
        _word_stream(ck, nw, "en", EN_CONTENT, stop_frac_pct=45,
                     stopwords=EN_STOPWORDS), " ")


def webpages(
    spark: SparkSession,
    n_rows: int,
    with_labels: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic webpages DataFrame (lazily; nothing runs yet)."""
    df = spark.range(0, n_rows, 1, num_partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")
    bucket = F.pmod(_h(rid, F.lit("bucket")), 100)

    # --- content key: id for normal rows; a small shared pool for dups ---
    n_pool = max(n_rows // 50, 1)
    dup_key = -1 - F.pmod(_h(rid, F.lit("duppool")), n_pool)
    ck = F.when(_in_bucket(bucket, "dup"), dup_key).otherwise(rid)

    # --- word counts ---
    h_nw = _h(ck, F.lit("nw"))
    nw_clean = F.lit(60) + F.pmod(h_nw, 140)          # 60..199 words
    nw_short = F.lit(5) + F.pmod(h_nw, 30)            # 5..34  words (<50)

    # --- per-bucket text variants (all pure functions of ck) ---
    en = _en_text(ck, nw_clean)
    short = _en_text(ck, nw_short)
    symbolic = F.array_join(
        _word_stream(ck, nw_clean, "en", EN_CONTENT, stop_frac_pct=45,
                     stopwords=EN_STOPWORDS, symbol_pct=55), " ")
    lowstop = F.array_join(_word_stream(ck, nw_clean, "ls", EN_CONTENT), " ")
    sentence = F.array_join(
        _word_stream(ck, F.lit(8), "rep", EN_CONTENT, stop_frac_pct=30,
                     stopwords=EN_STOPWORDS), " ")
    repeat = F.array_join(F.array_repeat(sentence, 20), " ")
    fr = F.array_join(_word_stream(ck, nw_clean, "fr", FR_WORDS), " ")
    de = F.array_join(_word_stream(ck, nw_clean, "de", DE_WORDS), " ")
    ar = F.array_join(_word_stream(ck, nw_clean, "ar", AR_WORDS), " ")
    gib = F.array_join(_word_stream(ck, nw_clean, "gib", GIB_WORDS), " ")

    # --- PII suffix (deterministic email / phone / IPv4 / lexicon word) ---
    hp = _h(ck, F.lit("pii"))
    phone_intl = F.concat(
        F.lit("+1-555-0"),
        F.lpad(F.pmod(F.xxhash64(hp, F.lit(1)), 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(F.pmod(F.xxhash64(hp, F.lit(2)), 10000).cast("string"), 4, "0"),
    )
    phone_local = F.concat(
        F.lit("(555) 0"),
        F.lpad(F.pmod(F.xxhash64(hp, F.lit(1)), 100).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(F.pmod(F.xxhash64(hp, F.lit(2)), 10000).cast("string"), 4, "0"),
    )
    phone = F.when(F.pmod(hp, 2) == 0, phone_intl).otherwise(phone_local)
    ip = F.concat(
        F.lit("203."),
        (F.pmod(F.xxhash64(hp, F.lit(3)), 254) + 1).cast("string"), F.lit("."),
        (F.pmod(F.xxhash64(hp, F.lit(4)), 254) + 1).cast("string"), F.lit("."),
        (F.pmod(F.xxhash64(hp, F.lit(5)), 254) + 1).cast("string"),
    )
    pii_suffix = F.concat(
        F.lit(" Contact "), _pick(PII_NAMES, F.xxhash64(hp, F.lit(6))),
        F.lit("@example."), _pick(PII_TLDS, F.xxhash64(hp, F.lit(7))),
        F.lit(" or call "), phone,
        F.lit(" from host "), ip,
        F.lit(". That "), _pick(TOXIC_LEXICON, F.xxhash64(hp, F.lit(8))),
        F.lit(" server is down."),
    )

    text = (
        F.when(_in_bucket(bucket, "null"), F.lit(None).cast("string"))
        .when(_in_bucket(bucket, "empty"), F.lit(""))
        .when(_in_bucket(bucket, "pii"), F.concat(en, pii_suffix))
        .when(_in_bucket(bucket, "short"), short)
        .when(_in_bucket(bucket, "symbol"), symbolic)
        .when(_in_bucket(bucket, "lowstop"), lowstop)
        .when(_in_bucket(bucket, "repeat"), repeat)
        .when(_in_bucket(bucket, "fr"), fr)
        .when(_in_bucket(bucket, "de"), de)
        .when(_in_bucket(bucket, "ar"), ar)
        .when(_in_bucket(bucket, "gib"), gib)
        .otherwise(en)
    )

    lang = (
        F.when(_in_bucket(bucket, "fr"), F.lit("fr"))
        .when(_in_bucket(bucket, "de"), F.lit("de"))
        .when(_in_bucket(bucket, "ar"), F.lit("ar"))
        .when(_in_bucket(bucket, "gib") | _in_bucket(bucket, "null")
              | _in_bucket(bucket, "empty"), F.lit("unk"))
        .otherwise(F.lit("en"))
    )

    # --- zipf-skewed domain: top domain ~20% of rows (FIXTURES.md §1) ---
    u = F.pmod(_h(rid, F.lit("dom")), 10000) / 10000.0
    rank = (
        F.when(u < 0.20, F.lit(0))
        .otherwise(
            (F.lit(1) + F.floor(F.pow((u - 0.2) / 0.8, 2.5) * (N_DOMAINS - 1)))
        )
        .cast("int")
    )
    rank = F.least(rank, F.lit(N_DOMAINS - 1))
    domain = F.concat(F.lit("d"), F.lpad(rank.cast("string"), 3, "0"),
                      F.lit(".example.org"))
    url = F.concat(F.lit("https://"), domain, F.lit("/p"), rid.cast("string"),
                   F.lit("-"), F.lower(F.hex(F.pmod(_h(rid, F.lit("slug")), 16 ** 6))))

    warc_ts = F.timestamp_seconds(
        F.lit(_WINDOW_END - _WINDOW_SEC) + F.pmod(_h(rid, F.lit("ts")), _WINDOW_SEC)
    )
    html = F.when(
        text.isNotNull(),
        F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")),
                 "UTF-8"),
    )

    cols = [
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    ]
    if with_labels:
        cols += [bucket.cast("int").alias("bucket"), domain.alias("domain"),
                 ck.alias("content_key")]
    return df.select(*cols)

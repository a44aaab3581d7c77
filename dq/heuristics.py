"""Gopher/C4-style heuristic document rules as native Column expressions.

These are the north-rule extensions (BASELINE.json north_star; SURVEY.md
§2.11) — the per-document analog of the reference's per-table checks. All
expressions are JVM-side (``F.split`` / ``F.transform`` / ``F.aggregate`` /
``F.regexp_count``), fully inside whole-stage codegen: no Python in the hot
path, no shuffle (everything is row-local), so this stage scales linearly
with input splits.

Rules (Gopher: Rae et al. 2021 "Scaling Language Models"; C4: Raffel et
al. 2020 — public papers, re-parameterized for the synthetic corpus):
- non_empty:       text is not NULL and has ≥1 token
- min/max_words:   50 ≤ n_words ≤ 100_000
- mean_word_len:   3 ≤ mean token length ≤ 12
- symbol_ratio:    symbol chars per word ≤ 0.10
- stopword_frac:   English-stopword token fraction ≥ 0.06
- distinct_ratio:  distinct-token fraction ≥ 0.20 (repetition filter)
- alpha_frac:      ≥ 0.80 of tokens contain a Unicode letter
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dq.vocab import EN_STOPWORDS

SYMBOL_CHARS = "#@^~|<>*={}[]$%&\\+_"
SYMBOL_CHARS_RE = r"[#@^~|<>*={}\[\]$%&\\+_]"
_LETTER_RE = "[\\p{L}]"


@dataclass(frozen=True)
class HeuristicConfig:
    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 12.0
    max_symbol_ratio: float = 0.10
    min_stopword_frac: float = 0.06
    min_distinct_ratio: float = 0.20
    min_alpha_frac: float = 0.80


RULE_NAMES = [
    "rule_non_empty", "rule_min_words", "rule_max_words",
    "rule_mean_word_len", "rule_symbol_ratio", "rule_stopword_frac",
    "rule_distinct_ratio", "rule_alpha_frac",
]


def _norm_token(w: Column) -> Column:
    # tokens arrive already lowercased (one lower() on the whole text
    # beats one per token); only the punctuation strip remains per token
    return F.regexp_replace(w, r"[^\p{L}\p{N}]", "")


def with_heuristics(df: DataFrame, text_col: str = "text",
                    cfg: HeuristicConfig | None = None) -> DataFrame:
    """Append stat columns (n_words, mean_word_len, symbol_ratio,
    stopword_frac, distinct_ratio, alpha_frac) and boolean rule_* columns.

    NULL/empty text yields False for every rule (dropped, and counted as
    failures in the per-rule metrics — the analog of the reference's
    null_columns semantics at document grain).
    """
    cfg = cfg or HeuristicConfig()
    text = F.col(text_col)
    has_text = text.isNotNull() & (F.trim(text) != "")

    # lowercase ONCE on the full string, then tokenize: every consumer
    # (length sums, \p{L} match, stopword/distinct over normalized
    # tokens) is case-insensitive or wants lowercase anyway, and one
    # big-string lower() allocates far less than one per token
    words = F.when(has_text, F.split(F.lower(F.trim(text)), r"\s+")) \
             .otherwise(F.array().cast("array<string>"))
    # normalize ONCE: the normalized array feeds both the stopword count
    # and the distinct-token count (one regexp pass per token, not two)
    df = (df.withColumn("_words", words)
            .withColumn("_norm", F.transform(F.col("_words"),
                                             lambda w: _norm_token(w))))
    words = F.col("_words")
    n_words = F.size(words)

    word_len_sum = F.aggregate(words, F.lit(0),
                               lambda acc, w: acc + F.length(w))
    mean_word_len = F.when(n_words > 0, word_len_sum / n_words).otherwise(0.0)

    # per-char class count via translate-and-diff: identical result to
    # regexp_count over the class, ~5x cheaper (no regex engine)
    symbol_count = F.when(has_text,
                          F.length(text)
                          - F.length(F.translate(text, SYMBOL_CHARS, ""))
                          ).otherwise(0)
    symbol_ratio = symbol_count / F.greatest(n_words, F.lit(1))

    # literal map → constant-folded hash lookup per token (vs an O(|stop|)
    # array scan per token — the hot-path cost at web scale)
    stop_map = F.create_map(*[x for w in EN_STOPWORDS
                              for x in (F.lit(w), F.lit(1))])
    # try_element_at: element_at throws MAP_KEY_DOES_NOT_EXIST under ANSI
    # mode (Spark 4 default); try_ variant has identical lookup semantics
    # but returns NULL on a miss in every mode
    stop_count = F.size(F.filter(
        F.col("_norm"), lambda t: F.try_element_at(stop_map, t).isNotNull()))
    stopword_frac = F.when(n_words > 0, stop_count / n_words).otherwise(0.0)

    distinct_count = F.size(F.array_distinct(F.col("_norm")))
    distinct_ratio = F.when(n_words > 0,
                            distinct_count / n_words).otherwise(0.0)

    alpha_count = F.size(F.filter(words, lambda w: w.rlike(_LETTER_RE)))
    alpha_frac = F.when(n_words > 0, alpha_count / n_words).otherwise(0.0)

    df = df.withColumns({
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "stopword_frac": stopword_frac,
        "distinct_ratio": distinct_ratio,
        "alpha_frac": alpha_frac,
    }).drop("_words", "_norm")

    rules = {
        "rule_non_empty": has_text & (F.col("n_words") > 0),
        "rule_min_words": F.col("n_words") >= cfg.min_words,
        "rule_max_words": F.col("n_words") <= cfg.max_words,
        "rule_mean_word_len": (F.col("mean_word_len") >= cfg.min_mean_word_len)
                              & (F.col("mean_word_len") <= cfg.max_mean_word_len),
        "rule_symbol_ratio": F.col("symbol_ratio") <= cfg.max_symbol_ratio,
        "rule_stopword_frac": F.col("stopword_frac") >= cfg.min_stopword_frac,
        "rule_distinct_ratio": F.col("distinct_ratio") >= cfg.min_distinct_ratio,
        "rule_alpha_frac": F.col("alpha_frac") >= cfg.min_alpha_frac,
    }
    gate = F.col("rule_non_empty")
    return df.withColumns({
        name: (cond if name == "rule_non_empty"
               else F.coalesce(gate & cond, F.lit(False)))
        for name, cond in rules.items()
    })


def heuristic_pass(df: DataFrame) -> Column:
    """Conjunction of all heuristic rule verdicts."""
    out = F.col(RULE_NAMES[0])
    for name in RULE_NAMES[1:]:
        out = out & F.col(name)
    return out

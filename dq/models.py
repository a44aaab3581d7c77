"""Deterministic language-ID and n-gram perplexity models.

North-rule stages (BASELINE.json): "fastText-style language-ID and
KenLM-style n-gram perplexity scoring inside vectorized pandas/Arrow UDFs
(model broadcast per executor, no per-row Python)".

Both models are trained at import time from the fixed vocabularies in
``dq.vocab`` (seeded, no wall clock, no external data), so every run —
at any parallelism — produces identical scores. They are intentionally
small, pure-Python stand-ins with the same *shape* as fastText/KenLM:

- LangId: per-language character-trigram log-probability profiles
  (fastText's hashed char-n-gram buckets, minus the learned weights);
  prediction = argmax of mean trigram log-prob, with an "unk" floor.
- NGramLM: interpolated word-bigram/unigram model with add-k smoothing
  (KenLM's backoff shape); score = perplexity over normalized tokens.

The models are broadcast once per executor via ``SparkContext.broadcast``
and applied through Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dq.vocab import (
    AR_WORDS,
    DE_WORDS,
    EN_CONTENT,
    EN_STOPWORDS,
    FR_WORDS,
    GIB_WORDS,
)

_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

LANG_PROFILES_SOURCE: dict[str, list[str]] = {
    # stopwords over-weighted 3x for English to mirror real text (and the
    # generator's 45% stopword rate)
    "en": EN_STOPWORDS * 3 + EN_CONTENT,
    "fr": FR_WORDS,
    "de": DE_WORDS,
    "ar": AR_WORDS,
}

UNK_LOGPROB_FLOOR = -13.0     # unseen-trigram penalty
UNK_SCORE_CUTOFF = -9.0       # best mean log-prob below this → 'unk'
MAX_LANGID_CHARS = 400
MAX_PPL_TOKENS = 400
DEFAULT_PPL_THRESHOLD = 1000.0


def _trigrams(s: str):
    s = " " + s + " "
    for i in range(len(s) - 2):
        yield s[i:i + 3]


class LangIdModel:
    """Char-trigram profile scorer (fastText-shaped API: predict one label).

    Scoring uses a combined index ``trigram -> [logprob per lang]`` so a
    text costs ONE dict lookup per trigram (not one per language) — the
    difference between ~7 ms/doc and ~0.5 ms/doc inside the pandas UDF.
    """

    def __init__(self, profiles: dict[str, dict[str, float]]):
        self.profiles = profiles
        self.langs = list(profiles)
        self.combined: dict[str, list[float]] = {}
        all_tris = set()
        for prof in profiles.values():
            all_tris.update(prof)
        for t in all_tris:
            self.combined[t] = [profiles[lg].get(t, UNK_LOGPROB_FLOOR)
                                for lg in self.langs]
        self.floor_vec = [UNK_LOGPROB_FLOOR] * len(self.langs)

    @classmethod
    def train(cls, sources: dict[str, list[str]] = None) -> "LangIdModel":
        sources = sources or LANG_PROFILES_SOURCE
        profiles = {}
        for lang, words in sources.items():
            counts: Counter = Counter()
            for w in words:
                counts.update(_trigrams(w.lower()))
            total = sum(counts.values())
            profiles[lang] = {
                t: math.log(c / total) for t, c in counts.items()}
        return cls(profiles)

    def predict(self, text: str | None) -> str:
        if not text:
            return "unk"
        s = text[:MAX_LANGID_CHARS].lower()
        s = " " + s + " "
        n = len(s) - 2
        if n <= 0:
            return "unk"
        nlang = len(self.langs)
        acc = [0.0] * nlang
        get = self.combined.get
        floor = self.floor_vec
        for i in range(n):
            vec = get(s[i:i + 3], floor)
            for j in range(nlang):
                acc[j] += vec[j]
        best_score = max(acc) / n
        if best_score < UNK_SCORE_CUTOFF:
            return "unk"
        return self.langs[acc.index(max(acc))]


class NGramLM:
    """Interpolated bigram LM with add-k smoothing (KenLM-shaped scorer)."""

    def __init__(self, uni: dict[str, float], bi: dict[tuple[str, str], int],
                 uni_counts: dict[str, int], n_tokens: int, vocab_size: int,
                 k: float = 0.1, lambda_bi: float = 0.6):
        self.uni = uni
        self.bi = bi
        self.uni_counts = uni_counts
        self.n = n_tokens
        self.v = vocab_size
        self.k = k
        self.lambda_bi = lambda_bi

    @classmethod
    def train(cls, seed: int = 1234, n_tokens: int = 60_000) -> "NGramLM":
        rng = random.Random(seed)
        toks = []
        for _ in range(n_tokens):
            if rng.random() < 0.45:
                toks.append(rng.choice(EN_STOPWORDS))
            else:
                toks.append(rng.choice(EN_CONTENT))
        uni_counts = Counter(toks)
        bi_counts = Counter(zip(toks, toks[1:]))
        v = len(uni_counts)
        k = 0.1
        uni = {w: (c + k) / (n_tokens + k * (v + 1))
               for w, c in uni_counts.items()}
        return cls(uni, dict(bi_counts), dict(uni_counts), n_tokens, v, k)

    def _p_uni(self, w: str) -> float:
        return self.uni.get(w, self.k / (self.n + self.k * (self.v + 1)))

    def _p_bi(self, prev: str, w: str) -> float:
        cprev = self.uni_counts.get(prev, 0)
        cbi = self.bi.get((prev, w), 0)
        return (cbi + self.k) / (cprev + self.k * (self.v + 1))

    def _p(self, prev: str, w: str) -> float:
        # Witten-Bell-shaped interpolation: unseen contexts fall back to
        # the unigram entirely, so OOV text keeps its full penalty instead
        # of inheriting the smoothed-bigram uniform mass.
        cprev = self.uni_counts.get(prev, 0)
        lam = cprev / (cprev + 40.0)
        return lam * self._p_bi(prev, w) + (1 - lam) * self._p_uni(w)

    def perplexity(self, text: str | None) -> float:
        if not text:
            return float("inf")
        toks = _TOKEN_RE.findall(text.lower())[:MAX_PPL_TOKENS]
        if not toks:
            return float("inf")
        lp = math.log(self._p_uni(toks[0]))
        for prev, w in zip(toks, toks[1:]):
            lp += math.log(self._p(prev, w))
        return math.exp(-lp / len(toks))


# Module-level singletons: trained once per process, deterministic.
LANGID_MODEL = LangIdModel.train()
LM_MODEL = NGramLM.train()


def make_langid_udf(spark: SparkSession):
    """Series→Series pandas UDF; model broadcast once per executor."""
    bc = spark.sparkContext.broadcast(LANGID_MODEL)

    @F.pandas_udf(T.StringType())
    def langid(texts: pd.Series) -> pd.Series:
        model = bc.value
        return texts.map(model.predict)

    return langid


def make_perplexity_udf(spark: SparkSession):
    bc = spark.sparkContext.broadcast(LM_MODEL)

    @F.pandas_udf(T.DoubleType())
    def perplexity(texts: pd.Series) -> pd.Series:
        model = bc.value
        return texts.map(model.perplexity)

    return perplexity

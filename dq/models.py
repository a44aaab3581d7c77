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

import numpy as np
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

    Scoring is fully numpy-vectorized: characters map through a
    codepoint LUT onto the profiles' alphabet (any other char → a
    single OTHER id), trigram codes index one dense
    ``(alphabet³, n_langs)`` float64 table (~7 MB — cache-resident),
    and a doc scores as one gather + column sum. This is EXACTLY
    equivalent to the dict-of-trigrams scorer it replaces (profile
    trigrams contain only alphabet chars, so folded codes are
    collision-free and every off-alphabet trigram hits the UNK floor),
    but the per-doc cost is ~10x lower and — the scaling point — the
    working set fits in LLC, where the dict version's pointer-chasing
    was memory-latency-bound and stopped scaling past ~8 cores
    (measured: pure-multiprocessing dict scoring 0.56 efficiency
    8→32 procs on the 32-core box).
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
        # --- vectorized scoring structures (exact fold, see docstring)
        chars = sorted({c for t in self.combined for c in t})
        a = len(chars) + 1                       # +1 = OTHER bucket
        self._A = a
        lut = np.full(max(ord(c) for c in chars) + 2, a - 1, dtype=np.int32)
        for i, c in enumerate(chars):
            lut[ord(c)] = i
        self._lut = lut
        table = np.full((a * a * a, len(self.langs)), UNK_LOGPROB_FLOOR)
        for t, vec in self.combined.items():
            code = ((lut[ord(t[0])] * a + lut[ord(t[1])]) * a
                    + lut[ord(t[2])])
            table[code] = vec
        self._table = table

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
        s = " " + text[:MAX_LANGID_CHARS].lower() + " "
        n = len(s) - 2
        if n <= 0:
            return "unk"
        cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
        idx = self._lut[np.minimum(cp, len(self._lut) - 1)]
        codes = (idx[:-2] * self._A + idx[1:-1]) * self._A + idx[2:]
        sums = self._table[codes].sum(axis=0)
        if sums.max() / n < UNK_SCORE_CUTOFF:
            return "unk"
        return self.langs[int(sums.argmax())]

    def predict_batch(self, texts) -> list:
        """Batch form of :func:`predict` — one UTF-32 encode, one LUT
        gather, and one table gather for the WHOLE Arrow batch, with the
        per-document reduction done on a contiguous slice of the shared
        score matrix.

        Bit-identical to mapping :func:`predict` over the batch: each
        document's ``scores[s:e]`` is a C-contiguous view summed with
        the same ``ndarray.sum(axis=0)`` reduction the single-doc path
        applies to its fresh ``table[codes]`` array (same shape, same
        strides, same pairwise-summation blocking), and boundary
        trigrams between concatenated documents are excluded by
        construction (each doc contributes exactly ``len(s)-2`` trigram
        rows). Verified by an exhaustive equality test over the
        synthetic corpus + adversarial strings
        (tests/test_scrub_models.py)."""
        out = [None] * len(texts)
        segs: list[str] = []
        pos: list[int] = []
        for i, t in enumerate(texts):
            if not isinstance(t, str) or not t:
                out[i] = "unk"
                continue
            segs.append(" " + t[:MAX_LANGID_CHARS].lower() + " ")
            pos.append(i)
        if not segs:
            return out
        big = "".join(segs)
        cp = np.frombuffer(big.encode("utf-32-le"), dtype="<u4")
        idx = self._lut[np.minimum(cp, len(self._lut) - 1)]
        codes = (idx[:-2] * self._A + idx[1:-1]) * self._A + idx[2:]
        scores = self._table[codes]              # (total_trigrams, L)
        lens = np.fromiter((len(s) for s in segs), dtype=np.int64,
                           count=len(segs))
        starts = np.zeros(len(segs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        langs, cutoff = self.langs, UNK_SCORE_CUTOFF
        for s0, n2, i in zip(starts.tolist(), (lens - 2).tolist(), pos):
            sums = scores[s0:s0 + n2].sum(axis=0)
            mx = sums.max()
            out[i] = ("unk" if mx / n2 < cutoff
                      else langs[int(sums.argmax())])
        return out


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
        # --- dense log-prob tables (exact: every OOV word scores
        # identically under add-k smoothing, so collapsing all OOV onto
        # one UNK row/column reproduces the dict model bit-for-bit; the
        # (V+1)² float64 table is ~200 KB — L2-resident, where the
        # bigram dict of tuple keys was memory-latency-bound)
        words = sorted(uni_counts)
        self._vid = {w: i for i, w in enumerate(words)}
        self._unk = len(words)
        sentinel = "\x00"                 # guaranteed-OOV stand-in
        vocab_plus = words + [sentinel]
        vp = len(vocab_plus)
        self._logp_uni = np.array(
            [math.log(self._p_uni(w)) for w in vocab_plus])
        logp_bi = np.empty((vp, vp))
        for pi, prev in enumerate(vocab_plus):
            for wi, w in enumerate(vocab_plus):
                logp_bi[pi, wi] = math.log(self._p(prev, w))
        self._logp_bi = logp_bi

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
        vid, unk = self._vid, self._unk
        ids = np.fromiter((vid.get(t, unk) for t in toks),
                          dtype=np.int64, count=len(toks))
        lp = self._logp_uni[ids[0]]
        if len(ids) > 1:
            lp += self._logp_bi[ids[:-1], ids[1:]].sum()
        return math.exp(-lp / len(toks))

    def perplexity_batch(self, texts) -> list:
        """Batch form of :func:`perplexity`: each DISTINCT token in the
        Arrow batch resolves through the vocab dict exactly once
        (``pd.factorize`` — web/natural text is Zipfian, so distinct ≪
        total), then per-document ids gather from the factorized code
        array.

        Bit-identical to mapping :func:`perplexity`: token ids are the
        same integers, and each doc's bigram log-prob sum runs the same
        ``ndarray.sum()`` over the same fresh fancy-indexed array the
        single-doc path builds. Verified by an exhaustive equality test
        (tests/test_scrub_models.py)."""
        out = [None] * len(texts)
        per_doc: list[list[str]] = []
        pos: list[int] = []
        inf = float("inf")
        for i, t in enumerate(texts):
            if not isinstance(t, str) or not t:
                out[i] = inf
                continue
            toks = _TOKEN_RE.findall(t.lower())[:MAX_PPL_TOKENS]
            if not toks:
                out[i] = inf
                continue
            per_doc.append(toks)
            pos.append(i)
        if not per_doc:
            return out
        flat = [t for doc in per_doc for t in doc]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        vid, unk = self._vid, self._unk
        uid = np.fromiter((vid.get(t, unk) for t in uniques),
                          dtype=np.int64, count=len(uniques))
        ids_flat = uid[codes]
        logp_uni, logp_bi = self._logp_uni, self._logp_bi
        p0 = 0
        for doc, i in zip(per_doc, pos):
            n = len(doc)
            ids = ids_flat[p0:p0 + n]
            p0 += n
            lp = logp_uni[ids[0]]
            if n > 1:
                lp += logp_bi[ids[:-1], ids[1:]].sum()
            out[i] = math.exp(-lp / n)
        return out


# Module-level singletons: trained once per process, deterministic.
LANGID_MODEL = LangIdModel.train()
LM_MODEL = NGramLM.train()


def make_langid_udf(spark: SparkSession):
    """Series→Series pandas UDF; model broadcast once per executor."""
    bc = spark.sparkContext.broadcast(LANGID_MODEL)

    @F.pandas_udf(T.StringType())
    def langid(texts: pd.Series) -> pd.Series:
        model = bc.value
        return pd.Series(model.predict_batch(texts.tolist()),
                         index=texts.index)

    return langid


def make_perplexity_udf(spark: SparkSession):
    bc = spark.sparkContext.broadcast(LM_MODEL)

    @F.pandas_udf(T.DoubleType())
    def perplexity(texts: pd.Series) -> pd.Series:
        model = bc.value
        return pd.Series(model.perplexity_batch(texts.tolist()),
                         index=texts.index, dtype=np.float64)

    return perplexity

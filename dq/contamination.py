"""Benchmark decontamination: flag corpus documents sharing n-gram
shingles with a reference (benchmark/eval) set.

The one corpus-vs-REFERENCE operator in the dedup family — every other
dedup op compares the corpus against itself. Standard LLM-training
hygiene (n-gram collision scans of training data against evaluation
sets, as published in the GPT-3 appendix-C dedup methodology and the
C4 contamination studies): an eval example whose n-grams appear in
training data inflates benchmark scores, so contaminated documents are
flagged (and typically dropped) before training.

Scale shape (the 100-TB rationale):
- The benchmark side is SMALL (10^4-10^6 eval examples) next to a
  10^12-doc corpus: its distinct n-gram set is built once and
  broadcast, so the corpus side never shuffles for the probe join —
  the only corpus-wide movement is the map-side-combined per-doc hit
  count. ``broadcast_bench=False`` switches to a shuffle semi-join for
  benchmark sets too big to broadcast (same two-plan choice as the
  embedding LSH scorer).
- ``hash_grams=True`` exchanges/broadcasts ``xxhash64(gram)`` longs
  instead of gram strings (~3x narrower, long-vs-long join compares) —
  the same lever as ``jaccard_pairs(hash_postings=True)``, with the
  same collision bound (U^2/2^65 over distinct grams) and the same
  gating discipline: results must match the string-gram oracle.
- Shingling rides the Arrow fast path (``dq.dedup.make_shingles_udf``),
  bit-parity-tested against the Column tokenizer.

Reference scope note: the reference repo has no contamination check —
this is part of the training-data operator family the north rule adds
on top of its schema-validation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dq.dedup import make_shingles_udf


def benchmark_ngrams(benchmark: DataFrame, text_col: str = "text",
                     n: int = 8, hash_grams: bool = False) -> DataFrame:
    """Distinct n-gram shingle set of the benchmark side (one column,
    ``gram``). Built once; the caller decides broadcast vs shuffle."""
    g = (benchmark
         .select(F.explode(make_shingles_udf(n)(F.col(text_col)))
                 .alias("gram"))
         .distinct())
    if hash_grams:
        # re-distinct AFTER hashing: a collision between two distinct
        # grams must degrade to the documented membership error
        # (U^2/2^65), not to duplicate probe rows that multiply every
        # matching document's hit count. The set is tiny; free.
        g = g.select(F.xxhash64("gram").alias("gram")).distinct()
    return g


def flag_contaminated(corpus: DataFrame, benchmark: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 8, min_hits: int = 1,
                      hash_grams: bool = False,
                      broadcast_bench: bool = True) -> DataFrame:
    """Per-corpus-doc contamination flags.

    Returns (id_col, hits, contaminated): ``hits`` = number of the
    document's DISTINCT n-gram shingles that appear anywhere in the
    benchmark set (per-doc distinctness comes from the shingle UDF, so
    a gram repeated inside one document counts once); ``contaminated``
    = hits >= min_hits. Documents with no shingles (blank/short text)
    report hits=0.

    Precondition (same as ``dq.dedup.exact_dedup``): ``id_col`` values
    are unique in ``corpus``. Duplicate ids would sum their rows' hits
    under one key and duplicate output rows — deduplicating here would
    cost a corpus-wide exchange the broadcast design exists to avoid,
    so the contract is on the caller (web corpora key by url).
    """
    bench = benchmark_ngrams(benchmark, text_col, n, hash_grams)
    if broadcast_bench:
        bench = F.broadcast(bench)
    grams = corpus.select(
        F.col(id_col),
        F.explode(make_shingles_udf(n)(F.col(text_col))).alias("gram"))
    if hash_grams:
        grams = grams.select(id_col, F.xxhash64("gram").alias("gram"))
    hits = (grams.join(bench, "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("hits")))
    zero = F.lit(0).cast("long")
    return (corpus.select(id_col)
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("hits"), zero).alias("hits"),
                    (F.coalesce(F.col("hits"), zero) >= min_hits)
                    .alias("contaminated")))

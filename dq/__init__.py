"""dq — a brand-new PySpark-native web-text quality-filter + data-quality engine.

Re-expresses the semantics of the reference repo
``89bgt/data-quality-framework`` (a single-node pandas + Great Expectations
Hive-table validator, see SURVEY.md) as partition-parallel DataFrame rule
evaluation, and extends it with the web-scale training-data operators the
north rule requires: language-ID, n-gram perplexity, Gopher/C4-style
heuristic rules, compiled-regex PII/toxicity scrubbing, dedup families
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, and checkpointed resumable pipelines with an audit trail.

Design stance (SURVEY.md §7.0): pure ``pyspark.sql`` Column expressions for
everything expressible JVM-side; Arrow-vectorized pandas UDFs only where
Python semantics are load-bearing (byte-identical regex scrub, model
scoring). No per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"

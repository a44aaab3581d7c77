"""End-to-end pipeline tests: keep/drop F1 vs an independent pandas oracle
(FIXTURES.md §5), scrub byte-identity on kept docs, checkpointed resume."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from dq.audit import AuditStore
from dq.checkpoint import mark_done
from dq.pipeline import PipelineConfig, run_pipeline, score_pages
from dq.scrub import scrub_string
from dq.synth import BUCKETS, webpages

N = 1200
RUN_TS = dt.datetime(2025, 10, 3, 6, 0, 0)


def _bucket_group(b):
    for name, (lo, hi) in BUCKETS.items():
        if lo <= b <= hi:
            return name
    raise AssertionError(b)


def _oracle_keep(pdf: pd.DataFrame) -> pd.Series:
    """Reference-semantics keep/drop computed in pure pandas."""
    group = pdf["bucket"].map(_bucket_group)
    keep = group.isin(["clean", "pii"])
    dup = group == "dup"
    if dup.any():
        first_url = (pdf[dup].groupby("text")["url"].transform("min")
                     .reindex(pdf.index))
        keep = keep | (dup & (pdf["url"] == first_url))
    return keep


def test_keep_drop_f1_vs_oracle(spark):
    pages = webpages(spark, N, with_labels=True)
    scored = score_pages(spark, pages.drop("bucket", "domain", "content_key"))
    got = scored.select("url", "keep").toPandas().set_index("url")["keep"]

    pdf = pages.select("url", "text", "bucket").toPandas()
    want = _oracle_keep(pdf)
    pdf["want"] = want
    pdf = pdf.set_index("url")

    both = pdf.join(got.rename("got"))
    tp = int((both.want & both.got).sum())
    fp = int((~both.want & both.got).sum())
    fn = int((both.want & ~both.got).sum())
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (f1, tp, fp, fn)


def test_flagship_goldens(spark):
    """Regression gate for the model-scored flagship (the one driver
    query with no SQL oracle): per-(source, rule) pass tallies AND
    quantized model-score sums at sf0.001/sf0.01 must match the
    committed goldens exactly. The score pins are order-independent
    long sums (xxhash64(lang_pred) mod p; floor(ppl*100)) of per-doc
    values the batch≡per-doc property tests prove partition-invariant,
    so any model change that shifts a verdict OR a score fails loudly
    — regenerate via scripts/make_goldens.py only with an intentional
    model change."""
    import json
    import pathlib

    from dq import queries

    golden = json.load(open(
        pathlib.Path(__file__).parent / "goldens"
        / "quality_filter_pipeline.json"))
    for sf, want in golden.items():
        d = f"/root/testdata/{sf}"
        tallies = sorted(
            (r.asDict() for r in
             queries.q_quality_filter_pipeline(spark, d).collect()),
            key=lambda r: r["source"])
        assert tallies == want["tallies"], sf
        pins = sorted(
            (r.asDict() for r in
             queries.flagship_scored(spark, d).groupBy("source").agg(
                 F.sum(F.pmod(F.xxhash64("lang_pred"),
                              F.lit(1000003))).alias("lang_hash_sum"),
                 F.sum(F.floor(F.col("ppl") * 100)
                       .cast("long")).alias("ppl_q_sum"),
                 F.sum(F.col("lang_pred").eqNullSafe(F.lit("en"))
                       .cast("long")).alias("n_en")).collect()),
            key=lambda r: r["source"])
        assert pins == want["score_pins"], sf


def test_pipeline_outputs_and_scrub_identity(spark, tmp_path):
    store = AuditStore(str(tmp_path / "audit"))
    pages = webpages(spark, 600)
    out = run_pipeline(spark, pages, "exec1", RUN_TS, store=store)

    docs = out["docs"].collect()
    assert len(docs) > 0
    # kept docs: scrubbed text byte-identical to python scrub of original
    originals = {r.url: r.text for r in pages.collect()}
    changed = 0
    for d in docs:
        assert d.text == scrub_string(originals[d.url]), d.url
        changed += int(d.scrub_changed)
    assert changed > 0                      # PII docs were kept and scrubbed
    assert all("@" not in d.text or "[EMAIL]" in d.text for d in docs)

    # lineage: one row per (url, rule)
    from dq.pipeline import ALL_RULES
    lineage = store.read(spark, "lineage")
    n_pages = pages.count()
    assert lineage.count() == n_pages * len(ALL_RULES)

    # metrics add up
    m = store.read(spark, "rule_metrics")
    row = m.filter("rule_name = 'rule_non_empty'").agg(
        F.sum("total").alias("t"), F.sum("kept").alias("k")).collect()[0]
    assert row.t == n_pages
    assert row.k == len(docs)

    out["scored"].unpersist()


def test_resume_skips_completed_partitions(spark, tmp_path):
    store = AuditStore(str(tmp_path / "audit2"))
    pages = webpages(spark, 400)

    out1 = run_pipeline(spark, pages, "exec1", RUN_TS, store=store)
    n_lineage = store.read(spark, "lineage").count()
    assert n_lineage > 0
    out1["scored"].unpersist()

    # rerun: every partition checkpointed → nothing reprocessed,
    # no duplicate audit rows
    out2 = run_pipeline(spark, pages, "exec2", RUN_TS, store=store)
    assert out2["scored"].count() == 0
    assert store.read(spark, "lineage").count() == n_lineage
    assert store.read(spark, "docs").count() == out1["docs"].count()
    out2["scored"].unpersist()


def test_partial_resume_processes_only_remaining(spark, tmp_path):
    store = AuditStore(str(tmp_path / "audit3"))
    pages = webpages(spark, 400).withColumn("pv", F.to_date("warc_ts"))
    parts = sorted(r.pv for r in pages.select("pv").distinct().collect())
    half = parts[: len(parts) // 2]
    mark_done(spark, store, "webpages", "exec0", half, RUN_TS)

    out = run_pipeline(spark, pages.drop("pv"), "exec1", RUN_TS, store=store)
    seen = {r.partition_value for r in
            out["scored"].select("partition_value").distinct().collect()}
    assert seen == set(parts) - set(half)
    out["scored"].unpersist()

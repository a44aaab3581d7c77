"""Golden scrub tests (byte-identity) and model behavior."""

import math

from pyspark.sql import functions as F

from dq.models import LANGID_MODEL, LM_MODEL
from dq.scrub import scrub_string, scrub_udf

GOLDEN = [
    ("mail me at jane.doe+spam@example.co.uk today",
     "mail me at [EMAIL] today"),
    ("call +1-555-012-3456 or (555) 012-3456 now",
     "call [PHONE] or [PHONE] now"),
    ("server at 203.12.44.7 and 10.0.0.1 replied",
     "server at [IP] and [IP] replied"),
    ("that frakking GORRAM box", "that [CENSORED] [CENSORED] box"),
    ("no pii here at all", "no pii here at all"),
    ("", ""),
    (None, None),
    # ambiguity: version strings are not IPs (only 3 octets)
    ("upgrade to 1.2.3 now", "upgrade to 1.2.3 now"),
]


def test_scrub_golden():
    for raw, want in GOLDEN:
        assert scrub_string(raw) == want, (raw, scrub_string(raw), want)


def test_scrub_spark_matches_python_bytewise(spark):
    texts = [g[0] for g in GOLDEN if g[0] is not None] + [
        "Contact erin@example.com or call +1-555-087-8965 from host "
        "203.10.139.157. That felgercarb server is down."]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.s for r in df.select(scrub_udf("text").alias("s")).collect()]
    want = [scrub_string(t) for t in texts]
    assert got == want                      # byte-identical per row


def test_langid_on_vocab_sentences():
    assert LANGID_MODEL.predict(
        "the river and the mountain near the village garden") == "en"
    assert LANGID_MODEL.predict(
        "le jardin de la ville et les montagnes dans le pays") == "fr"
    assert LANGID_MODEL.predict(
        "die geschichte der stadt und das wasser im garten") == "de"
    assert LANGID_MODEL.predict("في من على حديقة نافذة رحلة") == "ar"
    assert LANGID_MODEL.predict("xqzt vrbk qqvn zzkr wxjf ptkk") == "unk"
    assert LANGID_MODEL.predict(None) == "unk"
    assert LANGID_MODEL.predict("") == "unk"


def test_perplexity_orders_languages():
    en = LM_MODEL.perplexity(
        "the river and the mountain were seen from the village garden "
        "and the people of the valley said that the harvest was good")
    fr = LM_MODEL.perplexity(
        "le jardin de la ville et les montagnes dans le pays des fleuves")
    assert en < 500 < 10_000 < fr
    assert math.isinf(LM_MODEL.perplexity(None))
    assert math.isinf(LM_MODEL.perplexity("!!! ... ###"))


def test_models_deterministic_rebuild():
    from dq.models import LangIdModel, NGramLM
    assert LangIdModel.train().profiles == LANGID_MODEL.profiles
    m2 = NGramLM.train()
    assert m2.uni == LM_MODEL.uni and m2.bi == LM_MODEL.bi

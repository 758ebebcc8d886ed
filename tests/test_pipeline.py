"""clean_corpus composition: each gate actually removes what it should."""

from pyspark.sql import functions as F

from time_series_databse_engine_spark.pipeline import clean_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox runs to "
    "the river where the dog waits for the other animals of the forest"
)


def _docs(spark):
    rows = [
        (1, GOOD, "en"),
        (2, GOOD, "en"),                       # exact dup of 1 → dropped
        (3, GOOD.replace("river", "creek"), "en"),  # near dup of 1 → clustered, dropped
        (4, "zz!!@@##", "xx"),                 # low quality → dropped
        (5, "the cat and the dog sat on the mat with the hat and the bat "
            "while the rat ran past the flat", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_gates_remove_planted_docs(spark):
    out = clean_corpus(
        _docs(spark), quality_threshold=0.3, rate_16ths=16  # sample keeps all
    )
    ids = {r.doc_id for r in out.collect()}
    assert 2 not in ids          # exact dup
    assert 3 not in ids          # near dup (clustered with 1)
    assert 4 not in ids          # low quality
    assert 1 in ids and 5 in ids
    row = {r.doc_id: r for r in out.collect()}[1]
    assert row.lang == "en" and row.n_tokens > 0 and row.quality > 0.3


def test_sample_gate_and_determinism(spark):
    full = clean_corpus(_docs(spark), quality_threshold=0.0, rate_16ths=16)
    sampled = clean_corpus(_docs(spark), quality_threshold=0.0, rate_16ths=4)
    full_ids = {r.doc_id for r in full.collect()}
    samp_ids = {r.doc_id for r in sampled.collect()}
    assert samp_ids <= full_ids  # sampling only removes
    again = {r.doc_id for r in clean_corpus(_docs(spark), quality_threshold=0.0, rate_16ths=4).collect()}
    assert samp_ids == again     # reproducible membership

"""F18: Gopher-style quality rules (Rae et al. 2021) — each signal and
threshold exercised by a crafted document; DuckDB value-exactness is
covered by the `gopher_rules` harness oracle."""

from __future__ import annotations

import pytest

from tripleforge import text


GOOD = (
    "the quick brown fox jumps over the lazy dog and then decides "
    "that it would be wise to have another go with more of the "
    "usual plain english words that keep a document looking like "
    "ordinary running prose rather than a noisy listing of markup "
    "4 example tokens\nanother line of text here"
)


def _rules(spark, txt):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(txt,)], "text string")
    r = text.gopher_rules(F.col("text"))
    return df.select(*[v.alias(k) for k, v in r.items()]).collect()[0]


def test_good_document_keeps(spark):
    row = _rules(spark, GOOD)
    assert row["word_count"] >= 50
    assert 3.0 <= row["mean_word_len"] <= 10.0
    assert row["alpha_word_ratio"] > 0.8
    assert row["stopword_hits"] >= 2
    assert row["keep"] is True


def test_too_short_document_dropped(spark):
    row = _rules(spark, "the cat sat on the mat")
    assert row["word_count"] < 50
    assert row["keep"] is False


def test_bullet_heavy_dropped(spark):
    txt = "\n".join("- item %d" % i for i in range(40))
    row = _rules(spark, txt)
    assert row["bullet_line_ratio"] == 1.0
    assert row["keep"] is False


def test_ellipsis_lines_counted(spark):
    txt = "first line...\nsecond line\nthird line…"
    row = _rules(spark, txt)
    assert row["ellipsis_line_ratio"] == pytest.approx(2 / 3)


def test_symbol_ratio_counts_occurrences_not_chars(spark):
    # 2 words, one '#' and one '...' -> ratio 2/2 = 1.0 (not 4/2)
    row = _rules(spark, "alpha# beta...")
    assert row["symbol_word_ratio"] == pytest.approx(1.0)


def test_numeric_salad_fails_alpha_ratio(spark):
    txt = " ".join(str(i) for i in range(60)) + " the and"
    row = _rules(spark, txt)
    assert row["alpha_word_ratio"] < 0.8
    assert row["keep"] is False


def test_stopword_rule(spark):
    # long, wordy, but zero Gopher stop words
    txt = " ".join(["zebra apple mango piano"] * 20)
    row = _rules(spark, txt)
    assert row["stopword_hits"] == 0
    assert row["keep"] is False

"""Property tests for the zip_with n-gram builders (functions/text.py) —
the hot path of jaccard/PMI/profile queries — against a trivial Python
reference. Random texts cover the edge zoo: repeated tokens, empty strings,
texts shorter than n, runs of spaces (split('', ' ') semantics), unicode.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_connect_logminer2_spark.functions.text import (
    char_ngrams,
    shingles,
    word_ngrams,
)

token = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters=" "), min_size=0, max_size=6
)
texts = st.lists(token, min_size=0, max_size=12).map(lambda t: " ".join(t))


def ref_word_ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def ref_shingles(text: str, k: int) -> list[str]:
    toks = text.lower().split(" ")
    out, seen = [], set()
    for g in ref_word_ngrams(toks, k):
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def ref_char_ngrams(text: str, n: int) -> list[str]:
    t = text.lower()
    return [t[i : i + n] for i in range(len(t) - n + 1)]


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=8), st.integers(min_value=1, max_value=4))
def test_ngram_builders_match_python_reference(spark, batch, n):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(batch)], "i: int, t: string")
    rows = (
        df.select(
            "i",
            "t",
            word_ngrams(F.split(F.lower("t"), " "), n).alias("wg"),
            shingles(F.col("t"), n).alias("sh"),
            char_ngrams(F.col("t"), n).alias("cg"),
        )
        .orderBy("i")
        .collect()
    )
    for r in rows:
        toks = r["t"].lower().split(" ")
        assert r["wg"] == ref_word_ngrams(toks, n), (r["t"], n)
        assert r["sh"] == ref_shingles(r["t"], n), (r["t"], n)
        assert r["cg"] == ref_char_ngrams(r["t"], n), (r["t"], n)

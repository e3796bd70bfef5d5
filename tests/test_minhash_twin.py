"""r6 pin: the Arrow minhash pass must be value-identical to the JVM
higher-order-function form it replaced — including the whitespace edge
semantics of Java's `\\s`, Spark trim (ASCII space only), and
StringSplit's limit=-1 empty-field behavior."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from europe_gis_spark.operators import dedup

ADVERSARIAL_TEXTS = [
    None,
    "",
    "   ",
    "\t\t",
    "one two three four five",
    "one two three four five six seven",
    "  leading spaces one two three four",
    "trailing one two three four five   ",
    "\ttab lead one two three four five",
    "tab trail one two three four five\t",
    "mid\ttab one two three four five",
    "line\nbreak one two three four five",
    "cr\rreturn one two three four five",
    "ff\fform one two three four five",
    "vt\x0bvert one two three four five",
    # unicode whitespace Java \s does NOT match — must stay one token
    "nbsp join one two three four five",
    "ideo　space one two three four five",
    "zwsp​join one two three four five",
    "multi   internal    spaces one two three four",
    "short doc",
    "exactly four tokens here",
    "five tokens exactly in here",
    "ümlaut é unicode 字 tokens six seven",
    "a " * 300,  # long doc
]


def _hof_signatures(docs, n_hashes=dedup.N_HASHES):
    """The pre-r6 JVM HOF implementation, inlined as the reference."""
    def salted_md5(salt):
        prefix = f"{salt}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    def hex_slice(off):
        return lambda d: F.substring(d, off, 8)

    n_salts = (n_hashes + 3) // 4
    base = docs.select(
        "doc_id", dedup.shingle_array(distinct=False).alias("sh")
    )
    dig = base.select(
        "doc_id",
        *[
            F.transform("sh", salted_md5(s)).alias(f"dg{s}")
            for s in range(n_salts)
        ],
    )
    return dig.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col(f"dg{j // 4}"), hex_slice(1 + 8 * (j % 4)))
            ).alias(f"mh{j}")
            for j in range(n_hashes)
        ],
    )


def test_minhash_arrow_twin_matches_jvm_hof(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(ADVERSARIAL_TEXTS)),
                "text": ADVERSARIAL_TEXTS,
            }
        )
    )
    got = (
        dedup.minhash_signatures(docs)
        .orderBy("doc_id")
        .toPandas()
        .fillna("~NULL~")
    )
    want = _hof_signatures(docs).orderBy("doc_id").toPandas().fillna("~NULL~")
    pd.testing.assert_frame_equal(got, want)


def test_shingle_sets_arrow_twin_matches_jvm_hof(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(ADVERSARIAL_TEXTS)),
                "text": ADVERSARIAL_TEXTS,
            }
        )
    )
    got = (
        dedup.shingle_sets_arrow(docs)
        .orderBy("doc_id")
        .toPandas()
    )
    want = (
        docs.select(
            "doc_id", dedup.shingle_array(distinct=True).alias("sh_set")
        )
        .orderBy("doc_id")
        .toPandas()
    )
    for g, w in zip(got["sh_set"], want["sh_set"]):
        assert list(g) == list(w)


def test_java_ws_tokens_matches_spark_split(spark):
    """The tokenizer twin itself, checked against the raw Spark
    expression (split(trim(text), '\\s+')) row by row."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(ADVERSARIAL_TEXTS)),
                "text": ADVERSARIAL_TEXTS,
            }
        )
    )
    rows = (
        docs.select(
            "doc_id",
            "text",
            F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
        )
        .orderBy("doc_id")
        .collect()
    )
    for r in rows:
        want = r.toks if r.toks is not None else [""]
        # NULL text: Spark yields NULL toks; the twin folds it to [""]
        # which the < SHINGLE_WORDS guard maps to the same NULL sigs
        got = dedup.java_ws_tokens(r.text)
        if r.toks is None:
            assert got == [""]
        else:
            assert got == list(want), (r.text, got, list(want))

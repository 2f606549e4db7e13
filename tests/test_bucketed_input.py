"""Storage-partitioned input path (VERDICT r2 next-step #4): a corpus
written bucketed on conv_id makes Stage A's reassembly SHUFFLE-FREE —
the bucketed scan's HashPartitioning(conv_id) satisfies every
conv_id-keyed distribution in both phases of the salted aggregate."""

import contextlib
import io

import pytest

from aisafetyintervention_literatureextraction_spark.datagen import corpus_df
from aisafetyintervention_literatureextraction_spark.operators.reassembly import (
    reassemble,
)
from aisafetyintervention_literatureextraction_spark.sources.transcripts import (
    read_transcripts_bucketed,
    write_transcripts_bucketed,
)

TABLE = "kg_test_transcripts_bucketed"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    df, _ = corpus_df(spark, n_convs=12, hot_conv_turns=50)
    write_transcripts_bucketed(df, TABLE, n_buckets=8)
    yield df, read_transcripts_bucketed(spark, TABLE)
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_bucketed_reassembly_has_no_exchange(spark, bucketed):
    """The plan lock: zero Exchange nodes in the whole reassembly over
    bucketed input, while the same plan over plain input shuffles."""
    plain_df, bucketed_df = bucketed
    p_bucketed = _plan(reassemble(bucketed_df).documents)
    assert "Exchange" not in p_bucketed, p_bucketed
    p_plain = _plan(reassemble(plain_df).documents)
    assert "Exchange" in p_plain  # the demo is meaningful: plain DOES shuffle


def test_bucketed_results_identical(spark, bucketed):
    plain_df, bucketed_df = bucketed
    a = sorted(
        (r["conv_id"], r["n_turns"], r["doc_text"])
        for r in reassemble(plain_df).documents.collect()
    )
    b = sorted(
        (r["conv_id"], r["n_turns"], r["doc_text"])
        for r in reassemble(bucketed_df).documents.collect()
    )
    assert a == b and len(a) > 0

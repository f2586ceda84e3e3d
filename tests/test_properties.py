"""Property-based tests (SURVEY.md §5 item 4): invariants over generated
inputs — clamp domain, dedup idempotence, single-agg ≡ agg-then-join,
portable-round self-consistency with DuckDB."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=30
    )
)
@_settings
def test_clamp_always_in_rating_domain(spark, vals):
    from svdmovie_lens_parallel_apache_spark_spark.functions.scalar import clamp

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = [r.c for r in df.select(clamp(F.col("x")).alias("c")).collect()]
    assert all(1.0 <= c <= 5.0 for c in out)


@given(
    us=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=4, max_size=4
    ),
    ms=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=4, max_size=4
    ),
)
@_settings
def test_clamped_fold_in_domain_and_matches_python(spark, us, ms):
    """U2 fold stays in [1,5] and equals a serial Python fold exactly."""
    from svdmovie_lens_parallel_apache_spark_spark.functions.vectors import clamped_fold

    df = spark.createDataFrame([(us, ms)], "u array<double>, m array<double>")
    got = df.select(clamped_fold(F.col("u"), F.col("m")).alias("p")).collect()[0].p
    acc = 1.0
    for a, b in zip(us, ms):
        acc = min(5.0, max(1.0, acc + a * b))
    assert got == acc
    assert 1.0 <= got <= 5.0


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=20), min_size=1, max_size=12
    )
)
@_settings
def test_exact_dedup_idempotent(spark, texts):
    from svdmovie_lens_parallel_apache_spark_spark.operators.dedup import (
        exact_dedup_groups,
    )

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    groups = exact_dedup_groups(docs)
    keepers = docs.join(
        groups.select(F.col("keep_doc_id").alias("doc_id")), "doc_id", "left_semi"
    )
    # dedup of the deduped set changes nothing
    again = exact_dedup_groups(keepers)
    assert again.count() == groups.count()
    assert again.where(F.col("n_copies") > 1).count() == 0


@given(
    pairs=st.lists(
        st.tuples(st.integers(min_value=1, max_value=5), st.integers(min_value=1, max_value=100)),
        min_size=1,
        max_size=40,
    )
)
@_settings
def test_single_agg_equals_agg_then_join(spark, pairs):
    """The reference computed (count, sum) per key as two reduceByKey
    passes + a join (J1); one groupBy must be equivalent."""
    df = spark.createDataFrame(pairs, "k int, v int")
    single = {
        r.k: (r.cnt, r.s)
        for r in df.groupBy("k").agg(F.count("*").alias("cnt"), F.sum("v").alias("s")).collect()
    }
    counts = df.groupBy("k").agg(F.count("*").alias("cnt"))
    sums = df.groupBy("k").agg(F.sum("v").alias("s"))
    joined = {r.k: (r.cnt, r.s) for r in counts.join(sums, "k").collect()}
    assert single == joined


@given(
    vals=st.lists(
        st.floats(min_value=-1e5, max_value=1e5, allow_nan=False), min_size=1, max_size=20
    ),
    n=st.integers(min_value=0, max_value=6),
)
@_settings
def test_portable_round_matches_duckdb(spark, vals, n):
    """floor(x*10^n+0.5)/10^n must agree bit-for-bit across engines for
    arbitrary doubles — the foundation of every oracle comparison."""
    from svdmovie_lens_parallel_apache_spark_spark.functions.scalar import portable_round

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = [r.r for r in df.select(portable_round(F.col("x"), n).alias("r")).collect()]
    con = duckdb.connect()
    expect = [
        con.sql(f"SELECT floor(CAST({v!r} AS DOUBLE) * 1e{n} + 0.5) / 1e{n}").fetchone()[0]
        for v in vals
    ]
    assert got == expect

"""Property-based tests (hypothesis; SURVEY.md §5 engine test plan (e)):
compare/fingerprint invariants on arbitrary small datasets."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F),
            max_size=12,
        ),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    ),
    min_size=1,
    max_size=30,
)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "a int, s string, x float")


@given(rows=ROWS)
@_settings
def test_compare_reflexive(spark, rows):
    from scribedb_spark.compare import compare

    df = _df(spark, rows)
    res = compare(df, df)
    assert res.equal and res.diff_count == 0


@given(rows=ROWS, drop=st.integers(min_value=0, max_value=29))
@_settings
def test_compare_detects_dropped_row(spark, rows, drop):
    from scribedb_spark.compare import compare

    drop = drop % len(rows)
    df = _df(spark, rows)
    shrunk = _df(spark, rows[:drop] + rows[drop + 1 :])
    res = compare(df, shrunk)
    assert not res.equal
    # the multiset difference is exactly one row (the dropped one)
    assert res.diff_count == 1
    r = res.diff.collect()[0]
    assert r["side"] == "src"


@given(rows=ROWS, parts=st.integers(min_value=1, max_value=7))
@_settings
def test_fp_unordered_partition_invariant(spark, rows, parts):
    from scribedb_spark.canonical import fp_unordered

    df = _df(spark, rows)
    a = fp_unordered(df).collect()[0]
    b = fp_unordered(df.repartition(parts)).collect()[0]
    assert (a["fp"], a["n_rows"]) == (b["fp"], b["n_rows"])


@given(rows=ROWS)
@_settings
def test_symmetric_diff_matches_exceptall(spark, rows):
    """The one-shuffle rewrite must reproduce exceptAll-both-ways
    exactly (bag semantics)."""
    from scribedb_spark.compare import symmetric_diff

    df = _df(spark, rows)
    half = df.filter(F.col("a") % 2 == 0)
    dup = df.unionAll(half)  # duplicates on one side

    got = sorted(
        tuple(r) for r in symmetric_diff(df, dup).collect()
    )
    only_src = df.exceptAll(dup).withColumn("side", F.lit("src"))
    only_tgt = dup.exceptAll(df).withColumn("side", F.lit("tgt"))
    want = sorted(tuple(r) for r in only_src.unionByName(only_tgt).collect())
    assert got == want

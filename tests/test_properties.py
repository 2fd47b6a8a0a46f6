"""Property-style checks (SURVEY section 5, item 4): the reference's
correctness hinges on ordering-sensitive dedup and hash-based change
detection, so those two invariants get randomized-permutation coverage —
dedup must pick the same winner regardless of input order, and row_hash must
be stable across row/column order and volatile-column churn.

Hypothesis drives the row generation; one Spark job per example is too slow,
so each property samples several permutations inside a single test body.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from callio_etl_spark.dedup import latest_per_key
from callio_etl_spark.functions import row_hash

# (key, ts, payload) pools deliberately tiny so duplicate keys AND duplicate
# timestamps (tie cases) are common.
ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(rows=ROWS, seed=st.integers(min_value=0, max_value=2**16))
def test_latest_per_key_is_input_order_invariant(spark, rows, seed):
    """D3 with a unique tiebreaker must be a pure function of the row SET:
    any permutation of the input yields the identical winner per key."""
    rng = random.Random(seed)
    perm = rows[:]
    rng.shuffle(perm)

    def run(data):
        df = spark.createDataFrame(data, "k long, ts long, payload long")
        # payload doubles as the unique-ish tiebreaker (max payload wins ties)
        out = latest_per_key(df, ["k"], F.col("ts"), tiebreak=[F.col("payload")])
        return sorted(map(tuple, out.collect()))

    assert run(rows) == run(perm)


@settings(max_examples=12, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.text(alphabet="abcxyz ", max_size=8),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda r: r[0],
    ),
    volatile=st.integers(min_value=0, max_value=2**31),
)
def test_row_hash_ignores_volatile_and_column_order(spark, rows, volatile):
    """P7: the hash must not move when (a) volatile columns change or (b) the
    projection lists columns in a different order; it must move when a stable
    column changes."""
    base = spark.createDataFrame(
        [(k, s, volatile) for k, s in rows], "_id long, name string, updateTime long"
    )
    churned = spark.createDataFrame(
        [(k, s, volatile + 1) for k, s in rows],
        "_id long, name string, updateTime long",
    )
    reordered = base.select("updateTime", "name", "_id")

    def hashes(df):
        return {
            r["_id"]: r["h"]
            for r in df.withColumn("h", row_hash(df)).select("_id", "h").collect()
        }

    h0 = hashes(base)
    assert hashes(churned) == h0  # volatile column excluded
    assert hashes(reordered) == h0  # column order irrelevant (sorted by name)

    changed = base.withColumn("name", F.concat(F.col("name"), F.lit("!")))
    h1 = hashes(changed)
    assert all(h1[k] != h0[k] for k in h0)  # stable-column change moves it

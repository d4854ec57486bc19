"""retention_plan (hand age-octave sims, tied-newest keeps BOTH,
future snapshots age 0, validation) and status_transitions (hand
matrices, first-snapshot exclusion, per-from shares)."""

import pytest

from correctocr_spark.ops.temporal import retention_plan, status_transitions


class TestRetentionPlan:
    def test_hand_octaves(self, spark):
        # as_of=100; ages: 0,1,2,3,5,9,20,70 → buckets
        # len(bin(age+1)): 1,2,2,3,3,4,5,7
        days = [100, 99, 98, 97, 95, 91, 80, 30]
        df = spark.createDataFrame(
            [("u", d) for d in days], "url string, epoch_day long"
        )
        got = {
            r["epoch_day"]: (r["age"], r["bucket"], r["keep"])
            for r in retention_plan(df, as_of=100).collect()
        }
        assert got[100] == (0, 1, True)
        assert got[99] == (1, 2, True)      # newest of ages {1,2}
        assert got[98] == (2, 2, False)
        assert got[97] == (3, 3, True)      # newest of ages {3,5}
        assert got[95] == (5, 3, False)
        assert got[91] == (9, 4, True)
        assert got[80] == (20, 5, True)
        assert got[30] == (70, 7, True)

    def test_tied_newest_keeps_both(self, spark):
        df = spark.createDataFrame(
            [("u", 90, "a"), ("u", 90, "b"), ("u", 89, "c")],
            "url string, epoch_day long, tag string",
        )
        out = retention_plan(df.select("url", "epoch_day"), as_of=100)
        keeps = [r["keep"] for r in out.where("epoch_day = 90").collect()]
        assert keeps == [True, True]

    def test_future_snapshot_age_zero(self, spark):
        df = spark.createDataFrame([("u", 150)], "url string, epoch_day long")
        r = retention_plan(df, as_of=100).first()
        assert (r["age"], r["bucket"], r["keep"]) == (0, 1, True)

    def test_requires_as_of(self, spark):
        df = spark.createDataFrame([("u", 1)], "url string, epoch_day long")
        with pytest.raises(ValueError):
            retention_plan(df)


class TestStatusTransitions:
    def test_hand_matrix(self, spark):
        rows = [
            ("a", 1, 200), ("a", 2, 200), ("a", 3, 404),
            ("b", 1, 200), ("b", 2, 301),
            ("c", 1, 404),  # single snapshot: no transition
        ]
        df = spark.createDataFrame(rows, "url string, epoch_day long, status long")
        got = {
            (r["from_status"], r["to_status"]): (r["n"], r["share_bp"])
            for r in status_transitions(df).collect()
        }
        # from 200: 200→200 once, 200→404 once, 200→301 once
        assert got[(200, 200)] == (1, 3333)
        assert got[(200, 404)] == (1, 3333)
        assert got[(200, 301)] == (1, 3333)
        assert set(got) == {(200, 200), (200, 404), (200, 301)}

    def test_shares_sum_close_to_10000(self, spark):
        rows = [("u", i, 200 if i < 3 else 404) for i in range(5)]
        df = spark.createDataFrame(rows, "url string, epoch_day long, status long")
        got = {
            (r["from_status"], r["to_status"]): r["share_bp"]
            for r in status_transitions(df).collect()
        }
        assert got[(200, 200)] == 6666 and got[(200, 404)] == 3333
        assert got[(404, 404)] == 10000

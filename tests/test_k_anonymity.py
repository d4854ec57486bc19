"""k-anonymity release audit: hand-simulated class tables, the
k-boundary (size == k is NOT a violation), l-diversity floor, NULL
quasi grouping, empty input, and the one-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from correctocr_spark.ops.cleaning import k_anonymity, k_anonymity_violations


def _df(spark):
    # classes over (lang, bucket):
    #   (en, 0) size 5  — exactly k, NOT a violation; sources a,b → l=2
    #   (en, 1) size 2  — violation; sources a,a → l=1
    #   (da, 0) size 1  — violation; source c → l=1
    #   (NULL, 0) size 3 — violation; sources a,b,c → l=3
    rows = (
        [("en", 0, "a")] * 3
        + [("en", 0, "b")] * 2
        + [("en", 1, "a")] * 2
        + [("da", 0, "c")]
        + [(None, 0, "a"), (None, 0, "b"), (None, 0, "c")]
    )
    return spark.createDataFrame(rows, "lang string, bucket long, source string")


class TestKAnonymity:
    def test_summary_hand_simulated(self, spark):
        row = k_anonymity(
            _df(spark), ["lang", "bucket"], k=5, sensitive_col="source"
        ).first()
        assert row["k"] == 5
        assert row["n_rows"] == 11
        assert row["n_classes"] == 4
        assert row["min_class_size"] == 1
        # size-5 class is NOT violating; 2 + 1 + 3 rows are
        assert row["violating_classes"] == 3
        assert row["rows_at_risk"] == 6
        assert row["at_risk_bp"] == (10000 * 6) // 11
        assert row["min_l"] == 1

    def test_boundary_class_size_equal_k_passes(self, spark):
        df = _df(spark).where(F.col("lang") == "en").where(F.col("bucket") == 0)
        row = k_anonymity(df, ["lang", "bucket"], k=5).first()
        assert row["violating_classes"] == 0 and row["rows_at_risk"] == 0
        assert row["at_risk_bp"] == 0

    def test_without_sensitive_no_min_l(self, spark):
        out = k_anonymity(_df(spark), ["lang", "bucket"], k=5)
        assert "min_l" not in out.columns

    def test_violations_table(self, spark):
        got = {
            (r["lang"], r["bucket"]): (r["class_size"], r["l"])
            for r in k_anonymity_violations(
                _df(spark), ["lang", "bucket"], k=5, sensitive_col="source"
            ).collect()
        }
        assert got == {
            ("en", 1): (2, 1),
            ("da", 0): (1, 1),
            (None, 0): (3, 3),
        }

    def test_empty_input_no_fabricated_numbers(self, spark):
        df = spark.createDataFrame([], "lang string, bucket long, source string")
        row = k_anonymity(df, ["lang", "bucket"], k=5, sensitive_col="source").first()
        assert row["n_rows"] == 0 and row["n_classes"] == 0
        assert row["min_class_size"] is None and row["at_risk_bp"] is None
        assert k_anonymity_violations(df, ["lang", "bucket"], k=5).count() == 0

    def test_requires_quasi_cols(self, spark):
        with pytest.raises(ValueError):
            k_anonymity(_df(spark), [], k=5)

    def test_one_shuffle_plan(self, spark):
        plan = (
            k_anonymity(_df(spark), ["lang", "bucket"], k=5, sensitive_col="source")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly one hash shuffle (the quasi-tuple groupBy; countDistinct
        # expands inside it) + the SinglePartition final agg; no UDFs
        assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan

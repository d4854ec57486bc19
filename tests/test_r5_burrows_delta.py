"""burrows_delta: full python twin on a hand corpus (ppm quantization,
z cores, micro-floored terms), style-clone pair is the closest pair,
uniform word dropped via dw=0, max_groups volume cap, bad args."""

import itertools
import math
from collections import Counter

import pytest

from correctocr_spark.ops.similarity import burrows_delta


def twin(texts, top_words):
    per = {g: Counter(t.split()) for g, t in texts.items()}
    tot = {g: sum(c.values()) for g, c in per.items()}
    wc = Counter()
    for g in per:
        wc.update(per[g])
    topw = [w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[
        :top_words]]
    h = len(per)
    fs = {(g, w): (10**6 * per[g].get(w, 0)) // tot[g]
          for g in per for w in topw}
    exp = {}
    for w in topw:
        col = [fs[(g, w)] for g in per]
        s, q = sum(col), sum(x * x for x in col)
        d = h * q - s * s
        if d <= 0:
            continue
        for ga, gb in itertools.combinations(sorted(per), 2):
            t = math.floor(
                1e6 * abs(fs[(ga, w)] - fs[(gb, w)]) * h / math.sqrt(d)
            )
            exp.setdefault((ga, gb), []).append(t)
    return {k: (len(v), sum(v) // len(v)) for k, v in exp.items()}


class TestBurrowsDelta:
    TEXTS = {
        "h1": "the cat sat on the mat and the dog ran",
        "h2": "the cat sat on the rug and the dog hid",
        "h3": "buy now cheap deals buy now best price buy now",
    }

    def test_matches_python_twin(self, spark):
        df = spark.createDataFrame(
            list(self.TEXTS.items()), "host string, text string"
        )
        got = {
            (r["grp_a"], r["grp_b"]): (r["n_words"], r["delta_micro"])
            for r in burrows_delta(df, "host", top_words=5).collect()
        }
        assert got == twin(self.TEXTS, 5)

    def test_style_clones_closest(self, spark):
        df = spark.createDataFrame(
            list(self.TEXTS.items()), "host string, text string"
        )
        got = {
            (r["grp_a"], r["grp_b"]): r["delta_micro"]
            for r in burrows_delta(df, "host", top_words=5).collect()
        }
        assert got[("h1", "h2")] == min(got.values())

    def test_uniform_word_dropped(self, spark):
        # 'x' has identical ppm everywhere → dw = 0 → excluded
        texts = {"a": "x y", "b": "x z", "c": "x w"}
        df = spark.createDataFrame(
            list(texts.items()), "host string, text string"
        )
        rows = burrows_delta(df, "host", top_words=1).collect()
        assert rows == []  # the single top word is the uniform one

    def test_max_groups_volume_cap(self, spark):
        texts = {"big1": "a b c d e f g h", "big2": "a b c x y z w v",
                 "tiny": "q"}
        df = spark.createDataFrame(
            list(texts.items()), "host string, text string"
        )
        rows = burrows_delta(df, "host", top_words=4, max_groups=2).collect()
        groups = {g for r in rows for g in (r["grp_a"], r["grp_b"])}
        assert "tiny" not in groups and groups == {"big1", "big2"}

    def test_bad_args(self, spark):
        df = spark.createDataFrame([("h", "a")], "host string, text string")
        with pytest.raises(ValueError):
            burrows_delta(df, "host", top_words=0)
        with pytest.raises(ValueError):
            burrows_delta(df, "host", max_groups=1)

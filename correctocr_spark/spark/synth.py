"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generation is *distributed* (``spark.range(n)`` + ``mapInPandas``) and
*deterministic*: every page derives from ``(seed, page_id)`` only, so the
same (seed, n) yields the same table at any parallelism — which is what
lets the bench compare local[8] vs local[32] on identical input.

Host skew is intentional (a few hosts own a large share of urls) to
exercise the salting/AQE-skew path the north rule requires.
"""

from __future__ import annotations

import datetime
from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .resources import DEFAULT_CONFUSIONS, DEFAULT_VOCAB

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

#: inverse confusion: gold char -> (read-as chars, probabilities)
_NOISE = {
    gold: (list(reads.keys()), np.array(list(reads.values()), dtype=float))
    for gold, reads in DEFAULT_CONFUSIONS.items()
    if all(len(r) == 1 for r in reads)
}

_HOSTS_HEAVY = ["big-news.example", "mega-portal.example"]
_HOSTS_TAIL = [f"site{i:03d}.example" for i in range(200)]

_BOILER_NAV = (
    '<nav><a href="/">Home</a> <a href="/about">About us</a> '
    '<a href="/contact">Contact</a> <a href="/login">Log in</a></nav>'
)
_BOILER_FOOTER = (
    '<footer><a href="/privacy">Privacy policy</a> · '
    '<a href="/terms">Terms of service</a> · © Example Corp</footer>'
)


def _corrupt_word(word: str, rng: np.random.RandomState, noise_rate: float) -> str:
    out = []
    for ch in word:
        noise = _NOISE.get(ch)
        if noise is not None and rng.random_sample() < noise_rate:
            reads, weights = noise
            out.append(reads[rng.choice(len(reads), p=weights / weights.sum())])
        else:
            out.append(ch)
    return "".join(out)


def make_page(page_id: int, seed: int = 42, mean_words: int = 60, noise_rate: float = 0.08) -> dict:
    """One deterministic page. Pure function of (seed, page_id)."""
    rng = np.random.RandomState((seed * 1_000_003 + page_id) % (2**31 - 1))
    vocab = DEFAULT_VOCAB

    n_words = max(5, int(rng.poisson(mean_words)))
    words: List[str] = [vocab[rng.randint(len(vocab))] for _ in range(n_words)]
    if rng.random_sample() < 0.5:
        words[0] = words[0].capitalize()

    tokens: List[str] = []
    for w in words:
        w = _corrupt_word(w, rng, noise_rate)
        r = rng.random_sample()
        if r < 0.04 and len(w) >= 4:  # line-break hyphenation split
            cut = rng.randint(1, len(w) - 1)
            hyphen = "\xad" if rng.random_sample() < 0.3 else "-"
            tokens.extend([w[:cut] + hyphen, w[cut:]])
        elif r < 0.08:  # punctuation token
            tokens.extend([w, [".", ",", ";", "»«"][rng.randint(4)]])
        elif r < 0.10:  # newline marker (the reference's sink restores it)
            tokens.extend([w, "_NEWLINE_N_"])
        else:
            tokens.append(w)
    body = " ".join(tokens)

    # zipf-ish host skew: ~45% of pages on 2 heavy hosts
    if rng.random_sample() < 0.45:
        host = _HOSTS_HEAVY[rng.randint(len(_HOSTS_HEAVY))]
    else:
        host = _HOSTS_TAIL[rng.randint(len(_HOSTS_TAIL))]
    url = f"https://{host}/page/{page_id}"

    html = (
        "<html><head><title>doc</title><script>var x=1;</script>"
        "<style>p{margin:0}</style></head><body>"
        + _BOILER_NAV
        + f"<main><p>{body}</p></main>"
        + _BOILER_FOOTER
        + "</body></html>"
    ).encode("utf-8")

    ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=int(page_id) % 31536000)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": body,
        "lang": "en" if rng.random_sample() < 0.9 else "da",
    }


def synth_pages(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    mean_words: int = 60,
    noise_rate: float = 0.08,
    partitions: int = 0,
    start: int = 0,
) -> DataFrame:
    """Distributed deterministic pages DataFrame. ``start`` offsets the
    page-id range (distinct urls across incremental batches)."""
    partitions = partitions or max(8, min(256, n // 2000 + 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_page(int(i), seed, mean_words, noise_rate) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in PAGES_SCHEMA.fields])

    return (
        spark.range(start, start + n, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )

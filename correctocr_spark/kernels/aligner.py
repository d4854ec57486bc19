"""Alignment of original/gold token sequences (training-data producer).

Reference: /root/reference/CorrectOCR/aligner.py.

``alignments`` feeds HMM training: per consolidated token it records the
word alignment and, per positionally-zipped char pair (truncating to the
shorter string — aligner.py:45-47), increments ``readCounts``. In Spark
the char-pair counting is a ``groupBy(left_char, right_char).count()``;
this kernel is the per-document piece and the standalone oracle.
"""

from __future__ import annotations

import difflib
from collections import Counter, defaultdict
from typing import Dict, List, Optional, Tuple

from .pipeline import Tok, consolidated


def alignments(tokens: List[Tok]):
    """aligner.py:20-57 — returns (fullAlignments, wordAlignments, readCounts)."""
    full: List[Tuple[str, str]] = []
    word_alignments: Dict[str, Dict[int, Optional[str]]] = defaultdict(dict)
    read_counts: Dict[str, Counter] = defaultdict(Counter)

    for original, gold, token in consolidated(tokens):
        word_alignments[original][token.index] = gold
        if gold is not None:
            for left_char, right_char in zip(original, gold):
                full.append((left_char, right_char))
                read_counts[left_char][right_char] += 1

    return full, word_alignments, read_counts


def char_pairs(tokens: List[Tok]) -> List[Tuple[str, str]]:
    """Just the char-pair stream — the distributed-aggregation payload."""
    out: List[Tuple[str, str]] = []
    for original, gold, _token in consolidated(tokens):
        if gold is not None:
            out.extend(zip(original, gold))
    return out


def apply_as_gold(left: List[Tok], right: List[Tok]) -> None:
    """aligner.py:59-87 — order-based fuzzy join via SequenceMatcher.

    The reference matches Token objects whose (dataclass) equality
    reduces to field equality; for freshly-tokenized docs that is
    equality of ``(original, index)`` — which is what we key on here.
    equal -> copy original into gold; replace -> pairwise zip;
    delete -> discard; insert -> error.
    """
    a = [(t.original, t.index) for t in left]
    b = [(t.original, t.index) for t in right]
    matcher = difflib.SequenceMatcher(a=a, b=b)  # default autojunk, as reference
    for tag, i1, i2, j1, j2 in matcher.get_opcodes():
        if tag == "equal":
            for token in left[i1:i2]:
                token.gold = token.original
        elif tag == "replace":
            for original_token, gold_token in zip(left[i1:i2], right[j1:j2]):
                original_token.gold = gold_token.original
        elif tag == "delete":
            for token in left[i1:i2]:
                token.discard()
        elif tag == "insert":
            raise ValueError("Cannot insert tokens!")

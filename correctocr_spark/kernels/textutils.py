"""Regexes and tokenization with reference-exact semantics.

Reference: /root/reference/CorrectOCR/_util.py:1-7 and
/root/reference/CorrectOCR/tokens/_text.py:36-45.

The ``regex`` module (not stdlib ``re``) is required for parity:
``\\p{punct}`` in ``regex`` matches Unicode general-category punctuation
(e.g. ``»``, ``“``) which Java/stdlib character classes do not.
"""

from __future__ import annotations

from typing import List

import regex

#: ``_util.py:3`` — a token is "punctuation" iff this fullmatches.
punctuationRE = regex.compile(r"\p{punct}+")

#: ``_util.py:5`` — trailing hyphen probe. NOTE: the first alternative is
#: the literal string ``{Pd}`` (the reference escaped the brace, so the
#: intended ``\p{Pd}`` class is NOT active). We replicate the *actual*
#: behavior, pinned by the reference's own tests
#: (cocrtests/hyphenation.py:10-15): only ``\xad`` and ``-`` runs match.
hyphenRE = regex.compile(r"(?:\{Pd}|[\xad\-])+$")

#: ``_util.py:7`` — any Unicode letter.
letterRE = regex.compile(r"\p{L}")


def is_punctuation(word: str) -> bool:
    """``tokens/_super.py:133-138`` — is the token purely punctuation?"""
    return punctuationRE.fullmatch(word) is not None


def is_numeric(word: str) -> bool:
    """``tokens/_super.py:140-144`` — is the token purely numeric?

    Exactly Python ``str.isnumeric()`` (Unicode Nd/Nl/No — accepts e.g.
    '²' and '½', unlike ASCII digit checks). Dead code in the reference
    (zero call sites) but part of its Token API surface."""
    return word.isnumeric()


def tokenize_text(text: str) -> List[str]:
    """Whitespace tokenization, ``tokens/_text.py:39``.

    Exactly Python ``str.split()``: splits on runs of (Unicode)
    whitespace, never yields empty tokens. This differs from
    ``split(col, '\\s+')`` in Spark SQL (which can yield leading empties
    and uses Java's whitespace class), hence it stays in the kernel.
    """
    return text.split()

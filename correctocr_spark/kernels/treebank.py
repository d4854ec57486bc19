"""Penn Treebank word tokenization (T2).

The reference's dictionary prep tokenizes corpus text with
``nltk.tokenize.word_tokenize`` (commands.py:25 ``tokenize_str``); nltk
is not available in this environment, so this is a from-scratch
implementation of the published Penn Treebank ``tokenizer.sed`` rule
set the nltk tokenizer is defined by: punctuation splitting,
bracket/dash padding, quote normalization to \\`\\` / '', and English
contraction clitics (``n't``, ``'ll`` … split off; ``cannot`` ->
``can not`` etc.).

Divergence, documented: ``word_tokenize`` first sentence-splits with a
*trained* Punkt model, then applies these rules per sentence; without
the model we apply the rules to the whole text, so only the final
period of the TEXT (not of each sentence) is split off — exactly the
behavior of nltk's ``TreebankWordTokenizer.tokenize`` alone, whose
documented example output is pinned in tests. For dictionary prep
(words -> cleaned -> distinct) the difference is immaterial: the
cleaning step strips edge punctuation anyway.
"""

from __future__ import annotations

import re
from typing import List

_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]

_PUNCTUATION = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]

_PARENS_BRACKETS = [(re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> ")]

_DOUBLE_DASHES = [(re.compile(r"--"), r" -- ")]

_ENDING_QUOTES = [
    (re.compile(r'"'), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]

_CONTRACTIONS2 = [
    re.compile(pat, re.IGNORECASE)
    for pat in (
        r"\b(can)(not)\b",
        r"\b(d)('ye)\b",
        r"\b(gim)(me)\b",
        r"\b(gon)(na)\b",
        r"\b(got)(ta)\b",
        r"\b(lem)(me)\b",
        r"\b(mor)('n)\b",
        r"\b(wan)(na)(?= )",
    )
]

_CONTRACTIONS3 = [
    re.compile(pat, re.IGNORECASE) for pat in (r" ('t)(is)\b", r" ('t)(was)\b")
]


def treebank_tokenize(text: str) -> List[str]:
    """Tokenize one text with the Treebank rules (see module doc)."""
    for regexp, sub in _STARTING_QUOTES:
        text = regexp.sub(sub, text)
    for regexp, sub in _PUNCTUATION:
        text = regexp.sub(sub, text)
    for regexp, sub in _PARENS_BRACKETS:
        text = regexp.sub(sub, text)
    for regexp, sub in _DOUBLE_DASHES:
        text = regexp.sub(sub, text)
    text = " " + text + " "
    for regexp, sub in _ENDING_QUOTES:
        text = regexp.sub(sub, text)
    for regexp in _CONTRACTIONS2:
        text = regexp.sub(r" \1 \2 ", text)
    for regexp in _CONTRACTIONS3:
        text = regexp.sub(r" \1 \2 ", text)
    return text.split()


#: (java_pattern, java_replacement) mirror of the rule list above — the
#: same cascade as native Spark ``regexp_replace`` chains (whole-stage
#: codegen, no Python): see spark/corpus.py:treebank_tokenize_col.
JAVA_RULES: List[tuple] = (
    [("^\"", "``"), ("(``)", " $1 "), ("([ \\(\\[{<])(\"|'{2})", "$1 `` ")]
    + [
        ("([:,])([^\\d])", " $1 $2"),
        ("([:,])$", " $1 "),
        ("\\.\\.\\.", " ... "),
        ("[;@#$%&]", " $0 "),
        ("([^\\.])(\\.)([\\]\\)}>\"']*)\\s*$", "$1 $2$3 "),
        ("[?!]", " $0 "),
        ("([^'])' ", "$1 ' "),
    ]
    + [("[\\]\\[\\(\\)\\{\\}<>]", " $0 "), ("--", " -- ")]
    + [("__PAD__", "")]  # sentinel: pad ' ' + text + ' ' at this point
    + [
        ("\"", " '' "),
        ("(\\S)('')", "$1 $2 "),
        ("([^' ])('[sS]|'[mM]|'[dD]|') ", "$1 $2 "),
        ("([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", "$1 $2 "),
    ]
    + [
        ("(?i)\\b(can)(not)\\b", " $1 $2 "),
        ("(?i)\\b(d)('ye)\\b", " $1 $2 "),
        ("(?i)\\b(gim)(me)\\b", " $1 $2 "),
        ("(?i)\\b(gon)(na)\\b", " $1 $2 "),
        ("(?i)\\b(got)(ta)\\b", " $1 $2 "),
        ("(?i)\\b(lem)(me)\\b", " $1 $2 "),
        ("(?i)\\b(mor)('n)\\b", " $1 $2 "),
        ("(?i)\\b(wan)(na)(?= )", " $1 $2 "),
        ("(?i) ('t)(is)\\b", " $1 $2 "),
        ("(?i) ('t)(was)\\b", " $1 $2 "),
    ]
)

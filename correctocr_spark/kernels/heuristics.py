"""Heuristic decision bins.

Reference: /root/reference/CorrectOCR/heuristics.py:61-93 (``bin_for_word``)
and :317-358 (the ordered bin matchers).

The 9 matchers + catch-all are pure boolean algebra over four bits:
``o == k1``, ``o in dict``, ``k1 in dict`` and the ``dcode`` of how many
candidates pass the dictionary — so in Spark they compile to a plain
``CASE WHEN`` chain / ``np.select``; only the dictionary predicate itself
(P7) needs Python.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

from .dictionary import Dictionary

#: heuristics.py:21-26 — single-letter codes accepted in settings files.
_HEURISTICS_MAP = {"a": "annotator", "o": "original", "k": "kbest", "d": "kdict"}

#: The shipped workspace/resources/settings.json; bin 10 keeps the
#: dataclass default 'annotator' (heuristics.py:297).
DEFAULT_SETTINGS: Dict[int, str] = {
    1: "original",
    2: "annotator",
    3: "annotator",
    4: "original",
    5: "annotator",
    6: "annotator",
    7: "original",
    8: "original",
    9: "original",
    10: "annotator",
}

#: Fully-automatic profile for unattended crawl correction: where the
#: model finds a dictionary-validated candidate and the original fails
#: the dictionary (bins 4/6), take it; everywhere else keep the original
#: (no annotator in a 10^12-doc batch job). Settings are a config input
#: in the reference too (workspace/resources/settings.json).
AGGRESSIVE_SETTINGS: Dict[int, str] = {
    1: "original",
    2: "original",
    3: "original",
    4: "kbest",
    5: "original",
    6: "kdict",
    7: "original",
    8: "original",
    9: "original",
    10: "original",
}

BIN_DESCRIPTIONS: Dict[int, str] = {
    1: "k1 == original and both are in dictionary.",
    2: "k1 == original but they are not in dictionary, and no other kbest is in dictionary either.",
    3: "k1 == original but they are not in dictionary, but some lower-ranked kbest is.",
    4: "k1 != original and is in dictionary while original isn't.",
    5: "k1 != original and nothing is in dictionary.",
    6: "k1 != original and neither are in dictionary, but a lower-ranked candidate is.",
    7: "k1 != original and both are in dictionary.",
    8: "k1 != original, original is in dictionary and no candidates are in dictionary.",
    9: "k1 != original, k1 is not in dictionary but both original and a lower candidate are.",
    10: "Catch-all bin, matches any remaining tokens.",
}


def normalize_settings(settings: Dict[Union[int, str], str]) -> Dict[int, str]:
    """heuristics.py:41-47 — accept single-letter codes and str bin keys."""
    out = dict(DEFAULT_SETTINGS)
    for b, code in settings.items():
        if code not in _HEURISTICS_MAP.values():
            code = _HEURISTICS_MAP[code]
        out[int(b)] = code
    return out


def match_bin(o_eq_k: bool, o_in_d: bool, k_in_d: bool, dcode: str) -> int:
    """First-match over ordered bins 1-10 (heuristics.py:73-77,317-358)."""
    if o_eq_k and o_in_d:
        return 1
    if o_eq_k and not o_in_d and dcode == "zerokd":
        return 2
    if o_eq_k and not o_in_d and dcode == "somekd":
        return 3
    if not o_eq_k and not o_in_d and k_in_d:
        return 4
    if not o_eq_k and not o_in_d and dcode == "zerokd":
        return 5
    if not o_eq_k and not k_in_d and not o_in_d and dcode == "somekd":
        return 6
    if not o_eq_k and o_in_d and k_in_d:
        return 7
    if not o_eq_k and o_in_d and dcode == "zerokd":
        return 8
    if not o_eq_k and o_in_d and not k_in_d and dcode == "somekd":
        return 9
    return 10


def bin_for_word(
    original: str,
    kbest: Sequence[Tuple[str, float]],
    dictionary: Dictionary,
    settings: Dict[int, str],
) -> Tuple[str, Union[str, int, List[int]], int]:
    """heuristics.py:61-93 — returns ``(heuristic, selection, bin_number)``.

    ``kbest`` is the rank-ordered candidate list (rank = index + 1).
    Selection: 'original' -> the word; 'kbest' -> 1; 'kdict' -> first
    in-dictionary rank; 'annotator' -> list of in-dictionary ranks.
    """
    filtids = [n for n, (cand, _p) in enumerate(kbest, 1) if cand in dictionary]

    if len(filtids) == 0:
        dcode = "zerokd"
    elif 0 < len(filtids) < len(kbest):
        dcode = "somekd"
    else:
        dcode = "allkd"

    k1 = kbest[0][0] if kbest else ""
    number = match_bin(original == k1, original in dictionary, k1 in dictionary, dcode)
    heuristic = settings.get(number, "annotator")

    if heuristic == "original":
        selection: Union[str, int, List[int]] = original
    elif heuristic == "kbest":
        selection = 1
    elif heuristic == "kdict":
        selection = filtids[0]
    elif heuristic == "annotator":
        selection = filtids
    else:
        raise ValueError(f"Bin {number} has an unknown heuristic: {heuristic}")

    return heuristic, selection, number

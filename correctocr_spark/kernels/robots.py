"""robots.txt parsing — the crawl-politeness contract at the FILE level
(the robots-META tag lives in ops/filters.robots_directives; this kernel
speaks the /robots.txt grammar a crawler consults before fetching).

Documented RFC 9309 subset, chosen so the exact same matching runs in
Spark and the DuckDB oracle:

* line grammar: ``field: value``, ``#`` comments stripped, fields
  case-insensitive, surrounding whitespace trimmed;
* groups: one or more consecutive ``User-agent`` lines followed by
  ``Allow``/``Disallow`` rules; rules before any User-agent line are
  ignored (RFC: rules outside a group have no user-agent scope);
* group selection: all groups whose agent token matches the caller's
  product token case-insensitively are MERGED; if none match, the
  ``*`` groups apply (RFC 9309 §2.2.1 — most-specific selection is
  reduced to exact-token-else-star, documented);
* rule matching: ``*`` matches any run of characters, ``$`` anchors
  the end; otherwise rules are literal path prefixes. The rule with
  the LONGEST raw path wins; on a tie Allow beats Disallow
  (RFC 9309 §2.2.2). An empty-path rule (``Disallow:``) matches
  nothing — the classic "allow everything" idiom. No matching rule →
  allowed.

Rules are compiled to regexes HERE, at parse time — ``^`` + escaped
literal runs + ``.*`` for ``*`` + optional ``$`` — using only syntax
Java regex and RE2 share, so the Spark gate and the DuckDB oracle
evaluate the SAME pattern strings (no per-engine translation).
"""

from __future__ import annotations

import re
from typing import List, Tuple

#: (allow, raw_len, regex) — raw_len is the octet length of the raw
#: rule path, the RFC's specificity measure
Rule = Tuple[bool, int, str]


def _rule_regex(path: str) -> str:
    """Compile one rule path to the shared Java∩RE2 regex: escaped
    literal runs, ``*`` → ``.*``, trailing ``$`` → end anchor."""
    anchored = path.endswith("$")
    if anchored:
        path = path[:-1]
    parts = [re.escape(seg) for seg in path.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


#: Crawl-delay validity — a plain non-negative decimal, stated as a
#: grammar both engines share (the DuckDB twin uses the same pattern
#: via regexp_full_match) instead of each engine's float() quirks
_CRAWL_DELAY_RE = re.compile(r"^[0-9]+(\.[0-9]+)?$")

#: a parsed group: (agent tokens, (allow, path) rules, raw crawl-delay
#: values) — all in document order
_Group = Tuple[List[str], List[Tuple[bool, str]], List[str]]


def _groups(content: str) -> List[_Group]:
    """The shared group pass: every consecutive ``User-agent`` run
    opens a group; ``Allow``/``Disallow``/``Crawl-delay`` lines attach
    to the current group (none before the first run); any other field
    merely ends an agent run. Malformed lines are skipped, never
    raised on — a crawl pipeline must not die on one bad robots
    file."""
    groups: List[_Group] = []
    agents: List[str] = []
    rules: List[Tuple[bool, str]] = []
    delays: List[str] = []
    in_agent_run = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if agents:
                    groups.append((agents, rules, delays))
                agents, rules, delays = [], [], []
                in_agent_run = True
            agents.append(value.lower())
            continue
        in_agent_run = False
        if field in ("allow", "disallow"):
            if agents:  # rules before any User-agent line are ignored
                rules.append((field == "allow", value))
        elif field == "crawl-delay":
            if agents:
                delays.append(value)
        # sitemap/unknown fields: group-neutral (run already ended)
    if agents:
        groups.append((agents, rules, delays))
    return groups


def _selected(groups: List[_Group], agent: str) -> List[_Group]:
    """RFC 9309 §2.2.1 reduced to exact-token-else-star: all groups
    naming the caller's token are merged; none → the ``*`` groups."""
    token = agent.lower()
    selected = [g for g in groups if token in g[0]]
    if not selected and token != "*":
        selected = [g for g in groups if "*" in g[0]]
    return selected


def parse_robots_txt(content: str, agent: str = "*") -> List[Rule]:
    """Parse a robots.txt body into the caller-agent's rule list (see
    module doc for the exact grammar subset). Deterministic and
    total."""
    out: List[Rule] = []
    for _, grules, _ in _selected(_groups(content), agent):
        for allow, path in grules:
            if path == "":
                continue  # empty rule matches nothing
            out.append((allow, len(path), _rule_regex(path)))
    return out


def parse_crawl_delay(content: str, agent: str = "*"):
    """Group-scoped ``Crawl-delay`` for the caller's agent (same group
    selection as :func:`parse_robots_txt`): the FIRST valid value in
    document order wins; invalid values (anything but a non-negative
    decimal) are skipped; no valid value → ``None``. Crawl-delay is
    not in RFC 9309 but is honored by most crawlers and present in a
    large share of real robots files — a fetch scheduler needs it next
    to the allow/deny rules."""
    for _, _, delays in _selected(_groups(content), agent):
        for v in delays:
            if _CRAWL_DELAY_RE.match(v):
                return float(v)
    return None


def parse_robots_sitemaps(content: str) -> List[str]:
    """``Sitemap:`` declarations in document order, duplicates kept —
    per sitemaps.org these are GLOBAL (group-independent), so no agent
    parameter. The value is the first whitespace-run-free token of the
    comment-stripped remainder (URLs never contain spaces; anything
    after one is junk)."""
    out: List[str] = []
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            toks = value.strip().split()
            if toks:
                out.append(toks[0])
    return out

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


def parse_robots_txt(content: str, agent: str = "*") -> List[Rule]:
    """Parse a robots.txt body into the caller-agent's rule list (see
    module doc for the exact grammar subset). Deterministic and
    total: malformed lines are skipped, never raised on — a crawl
    pipeline must not die on one bad robots file."""
    groups: List[Tuple[List[str], List[Tuple[bool, str]]]] = []
    agents: List[str] = []
    rules: List[Tuple[bool, str]] = []
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
                    groups.append((agents, rules))
                agents, rules = [], []
                in_agent_run = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if agents:  # rules before any User-agent line are ignored
                rules.append((field == "allow", value))
        else:  # sitemap/crawl-delay/unknown fields end an agent run
            in_agent_run = False
    if agents:
        groups.append((agents, rules))

    token = agent.lower()
    selected = [g for g in groups if token in g[0]]
    if not selected and token != "*":
        selected = [g for g in groups if "*" in g[0]]
    out: List[Rule] = []
    for _, grules in selected:
        for allow, path in grules:
            if path == "":
                continue  # empty rule matches nothing
            out.append((allow, len(path), _rule_regex(path)))
    return out

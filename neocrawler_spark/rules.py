"""Driller-rule model: loading, normalization, URL→rule matching, link
arranging. Rules are tiny config — they live driver-side as plain dicts and
are captured by value into pUDF closures (the broadcast-join/broadcast-var
analog of the reference's Redis `driller:*` hashes, README.md:164-209).

Matching semantics (/root/reference/scheduler/index.js:279-298 and
/root/reference/spider/extractor.js:85-104):
  hostname → bug-compatible top-level domain → that domain's rules sorted by
  url_pattern length DESC (most-specific first, ties keep insertion order) →
  first regex match wins → key 'driller:{domain}:{alias}'.
The extractor variant decodeURIComponent()s the pattern first (:94); the
scheduler variant does not (:289). Both case-SENSITIVE (`new RegExp(p)`).
"""

from __future__ import annotations

import json
import math
import re
from pathlib import Path

import pandas as pd
from typing import Any
from urllib.parse import unquote

from .functions.canon import canonicalize, url_domain

MAX_WEIGHT = 100  # /root/reference/scheduler/index.js:19


def normalize_rule(raw: dict[str, Any]) -> dict[str, Any]:
    """Coerce a rule to canonical types (the reference stores all-strings in
    Redis and re-parses; we normalize once)."""
    r = dict(raw)
    r.setdefault("alias", "")
    r.setdefault("domain", "")
    r["priority"] = float(r.get("priority", 1) or 1)
    r["weight"] = float(r.get("weight", 0) or 0)
    r["schedule_interval"] = int(r.get("schedule_interval", 86400) or 86400)
    r["active"] = str(r.get("active", "false")).lower() in ("true", "1")
    r["schedule_rule"] = r.get("schedule_rule") or "FIFO"
    r["type"] = r.get("type") or "branch"
    r["format"] = r.get("format") or "html"
    for key in ("seed", "drill_rules", "validation_keywords", "id_parameter"):
        v = r.get(key)
        if isinstance(v, str):
            v = json.loads(v) if v else []
        r[key] = v or []
    r["rate"] = (MAX_WEIGHT + r["weight"]) / r["priority"]  # scheduler/index.js:88
    r["key"] = f"driller:{r['domain']}:{r['alias']}"
    return r


def load_rules(source: str | Path | list[dict]) -> list[dict]:
    """Load + normalize rules, keep active only (scheduler/index.js:81),
    preserving file order (the insertion-order tiebreak for matching)."""
    raw = source if isinstance(source, list) else json.loads(Path(source).read_text())
    return [r for r in (normalize_rule(x) for x in raw) if r["active"]]


def rules_by_domain(rules: list[dict]) -> dict[str, dict[str, dict]]:
    out: dict[str, dict[str, dict]] = {}
    for r in rules:
        out.setdefault(r["domain"], {})[r["alias"]] = r
    return out


def rules_by_key(rules: list[dict]) -> dict[str, dict]:
    return {r["key"]: r for r in rules}


def detect_link(
    link: str, by_domain: dict[str, dict[str, dict]], decode_pattern: bool = False
) -> dict | None:
    """First matching rule for a URL, most-specific-pattern first.
    decode_pattern=True reproduces the extractor flavor (extractor.js:94)."""
    domain = url_domain(link)
    if not domain or domain not in by_domain:
        return None
    aliases = by_domain[domain]
    ordered = sorted(aliases.keys(), key=lambda a: -len(aliases[a].get("url_pattern", "")))
    for alias in ordered:
        pattern = aliases[alias].get("url_pattern", "")
        if decode_pattern:
            pattern = unquote(pattern)
        try:
            if re.search(pattern, link):
                return aliases[alias]
        except re.error:
            continue
    return None


def detect_key_udf(by_domain: dict[str, dict[str, dict]]):
    """Arrow-batched re-detect: url -> matching rule key (or None). Used by
    the pop-time stale-trace repair (scheduler/index.js:350-370 checkURL:
    when the stored trace no longer names a live rule, the URL is re-matched
    against the current rule set instead of being dropped). Rule config is
    tiny — captured in the closure, shipped once per task."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _detect(urls: pd.Series) -> pd.Series:
        def one(u):
            r = detect_link(u, by_domain) if isinstance(u, str) else None
            return r["key"] if r else None

        return urls.map(one)

    return _detect


def arrange_links(
    links: list[str], by_domain: dict[str, dict[str, dict]]
) -> dict[str, list[str]]:
    """extractor.js:111-143 — bucket washed links by matched rule's urllib
    key, canonicalizing via the rule's id_parameter, dedupe per bucket."""
    out: dict[str, list[str]] = {}
    for link in links:
        rule = detect_link(link, by_domain, decode_pattern=True)
        if rule is None:
            continue
        lib = f"urllib:{rule['key']}"
        canon = canonicalize(link, rule.get("id_parameter"))
        bucket = out.setdefault(lib, [])
        if canon not in bucket:
            bucket.append(canon)
    return out


def quota_with_carry(
    rule_rows: list[dict], balance: int, total_rates: float
) -> dict[str, int]:
    """The weighted-fair admission quota with sequential leftover carry
    (scheduler/index.js:130-133, 210, 250-254).

    rule_rows: [{key, rate, available}] where `available` is the number of
    frontier URLs that would pass the recrawl-window predicate for the rule
    (computed distributed; this final recursion is O(#rules) driver-side —
    rules are tiny config, the data-sized work stays in the cluster).

    Returns key → ct (admission cap for this round). Rules processed in
    rate-DESC order; ct_i = ceil(avg_rate*rate_i) + left_{i-1};
    left_i = ct_i - min(available_i, ct_i).
    """
    if balance < 0:
        balance = 0
    avg_rate = balance / total_rates if total_rates else 0.0
    cts: dict[str, int] = {}
    left = 0
    for row in sorted(rule_rows, key=lambda r: -r["rate"]):
        ct = math.ceil(avg_rate * row["rate"]) + left
        count = min(int(row["available"]), ct)
        cts[row["key"]] = ct
        left = ct - count
    return cts

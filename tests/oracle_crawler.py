"""Pure-Python SEQUENTIAL oracle for the crawl round semantics (SURVEY.md §5b).

This is the straightforward per-URL interpretation of the reference's
scheduler + spider + pipeline flow under the pinned determinism contract
(plans/round.py docstring): round clock, rate-desc rule order, seeds before
pops, live per-URL state reads in pop order, discovery after all fetches.

It shares only the LEAF functions with the engine (canonicalize, rule match,
extraction) — those are separately golden-tested; what this oracle
independently re-derives is everything the engine expresses as DataFrame
joins/windows/merges: admission, quota carry, consumption, politeness,
state-event sequencing, discovery windows, version bumps, frontier order.
A divergence here means the distributed plan broke the sequential semantics.
"""

from __future__ import annotations

import math

from neocrawler_spark.functions.canon import expand_seed, md5_hex, url_host
from neocrawler_spark.functions.extract import process_document
from neocrawler_spark.rules import arrange_links, detect_link

HOUR_MS = 3600_000
TEN_MIN_MS = 600_000
TWO_DAYS_MS = 2 * 24 * 3600_000


class OracleCrawler:
    def __init__(self, rules, pages: dict[str, str], robots_rows, settings, base_ts):
        self.rules = rules
        self.by_key = {r["key"]: r for r in rules}
        self.by_domain = {}
        for r in rules:
            self.by_domain.setdefault(r["domain"], {})[r["alias"]] = r
        self.rank = {r["key"]: i for i, r in enumerate(sorted(rules, key=lambda r: -r["rate"]))}
        self.total_rates = sum(r["rate"] for r in rules)
        self.pages = pages
        self.robots = {r["host"]: r for r in robots_rows}
        self.st = settings
        self.base_ts = base_ts

        self.url_info: dict[str, dict] = {}  # url_hash → state
        self.frontier: dict[str, list[str]] = {}  # rule_key → ordered urls
        self.scheduled: list[dict] = []  # queue rows in order
        self.round = 0
        self.first_schedule: dict[str, int] = {}
        self.fetch_rounds: list[list[str]] = []  # per round, fetch order
        self.crawled: dict[str, dict] = {}

    # ---------------------------------------------------------------- state
    def _push_state(self, url, state, version=None, ts=0):
        """updateLinkState (scheduler/index.js:417-480): existing → records
        push + last + status (+version if given); new → create, records=[],
        trace via detectLink, drop if no rule matches."""
        h = md5_hex(url)
        info = self.url_info.get(h)
        if info is not None:
            recs = info["records"] + [state]
            info["records"] = recs[-3:]
            info["last"] = ts
            info["status"] = state
            if version:
                info["version"] = version
            return True
        rule = detect_link(url, self.by_domain)
        if rule is None:
            return False
        self.url_info[h] = {
            "url": url, "rule_key": rule["key"], "referer": "",
            "create": ts, "records": [], "last": ts, "status": state,
            "version": version if version else None, "drill_relation": None,
        }
        return True

    def _sched_admit(self, info, interval_s, now):
        if info["status"] in ("crawled_failure", "hit"):
            return True
        ri = HOUR_MS if info["status"] in ("crawling", "schedule") else interval_s * 1000
        return now - (info["last"] or 0) >= ri

    def _disc_admit(self, info, interval_s, now):
        if info["status"] == "crawled_failure":
            return True
        if info["status"] in ("crawling", "schedule"):
            ri = TEN_MIN_MS
        elif info["status"] == "hit":
            ri = TWO_DAYS_MS
        else:
            ri = interval_s * 1000
        return now - (info["last"] or 0) >= ri

    # ---------------------------------------------------------------- round
    def run_round(self):
        self.round += 1
        now = self.base_ts + self.round * self.st["schedule_interval"] * 1000
        balance = max(0, self.st["schedule_quantity_limitation"] - len(self.scheduled))
        avg_rate = balance / self.total_rates if self.total_rates else 0.0

        # A1 seeds (reSchedule), queue order: (rank of detected rule, ord, url)
        seed_batch = []
        for r in self.rules:
            if now - self.first_schedule.get(r["key"], 0) >= r["schedule_interval"] * 1000:
                order = 0
                for s in r["seed"]:
                    for link in expand_seed(s):
                        tr = detect_link(link, self.by_domain)
                        if tr is None:
                            continue
                        seed_batch.append((self.rank[tr["key"]], order, link, tr["key"]))
                        order += 1
                if r["seed"]:
                    self.first_schedule[r["key"]] = now
        seed_batch.sort(key=lambda t: (t[0], t[1], t[2]))
        new_entries = []
        for _, _, link, rk in seed_batch:
            if self._push_state(link, "schedule", version=now, ts=now):
                info = self.url_info[md5_hex(link)]
                new_entries.append(
                    {"url": link, "rule_key": rk, "referer": info["referer"],
                     "drill_relation": info["drill_relation"], "version": now,
                     "host": url_host(link)}
                )

        # A2 quota pops, rules in rate-desc order, sequential carry
        left = 0
        for r in sorted(self.rules, key=lambda x: -x["rate"]):
            ct = math.ceil(avg_rate * r["rate"]) + left
            q = self.frontier.get(r["key"], [])
            lifo = r["schedule_rule"] == "LIFO"
            count = 0
            while count < ct and q:
                url = q.pop(-1 if lifo else 0)
                h = md5_hex(url)
                info = self.url_info.get(h)
                if info is None:
                    continue  # consumed, not counted (checkURL:347)
                if not self._sched_admit(info, r["schedule_interval"], now):
                    continue
                self._push_state(url, "schedule", version=None, ts=now)
                new_entries.append(
                    {"url": url, "rule_key": r["key"], "referer": info["referer"],
                     "drill_relation": info["drill_relation"],
                     "version": info["version"], "host": url_host(url)}
                )
                count += 1
            left = ct - count if count < ct else 0

        self.scheduled.extend(new_entries)

        # B1 politeness: robots gate then per-host budget in queue order
        queue2, batch, host_counts = [], [], {}
        for row in self.scheduled:
            rb = self.robots.get(row["host"])
            if rb and any(
                _path_of(row["url"]).startswith(p) for p in (rb.get("disallow") or [])
            ):
                # robots denied: dropped from queue, terminal failure
                self._push_state(row["url"], "crawled_failure", ts=now)
                continue
            budget = rb["max_fetches_per_round"] if rb else self.st.get("default_host_budget", 1 << 30)
            c = host_counts.get(row["host"], 0)
            if c < budget:
                host_counts[row["host"]] = c + 1
                batch.append(row)
            else:
                queue2.append(row)
        self.scheduled = queue2

        # B2/B3 fetch + extract in queue order
        fetch_order = []
        extracted_pages = []
        attempts = self.st["download_retry"] + 1
        for row in batch:
            url = row["url"]
            fetch_order.append(url)
            rule = self.by_key.get(row["rule_key"])
            html = self.pages.get(url)
            self._push_state(url, "crawling", ts=now)
            ok = html is not None and len(html) >= 500 and all(
                kw in html for kw in (rule.get("validation_keywords") or [])
            )
            if not ok:
                info = self.url_info[md5_hex(url)]
                # collapsed in-round retries: crawling × attempts then failure
                recs = info["records"] + ["crawling"] * (attempts - 1) + ["crawled_failure"]
                info["records"] = recs[-3:]
                info["status"] = "crawled_failure"
                info["last"] = now
                continue
            res = process_document(url, html, rule, row["drill_relation"],
                                   self.st.get("keep_link_relation", True))
            self._push_state(url, "crawled_finish", ts=now)
            if rule["type"] == "node":
                self.crawled[md5_hex(url)] = {
                    "url": url, "extracted": res["extracted"],
                    "children": res["children"],
                    "drill_relation": res["drill_relation"], "round": self.round,
                }
            extracted_pages.append((row, res))
        self.fetch_rounds.append(fetch_order)

        # B4 discovery, first-occurrence-wins in (fetch order, page position)
        seen_this_round = set()
        for row, res in extracted_pages:
            arranged = arrange_links(res["links"], self.by_domain)
            for lib, links in arranged.items():
                rk = lib[len("urllib:"):]
                rule = self.by_key.get(rk)
                for link in links:
                    h = md5_hex(link)
                    if h in seen_this_round:
                        continue
                    seen_this_round.add(h)
                    info = self.url_info.get(h)
                    if info is None:
                        self.url_info[h] = {
                            "url": link, "rule_key": rk, "referer": row["url"],
                            "create": now, "records": [], "last": now,
                            "status": "hit", "version": row["version"],
                            "drill_relation": (res["drill_relation"] or "*")
                            if self.st.get("keep_link_relation", True) else None,
                        }
                        self.frontier.setdefault(rk, []).append(link)
                    else:
                        if self._disc_admit(info, rule["schedule_interval"], now):
                            info["status"] = "hit"  # no records push, no last
                            self.frontier.setdefault(rk, []).append(link)
                        pv = row["version"]
                        if pv is not None and (info["version"] is None or pv > info["version"]):
                            info["version"] = pv


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[-1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else ""

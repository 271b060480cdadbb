"""Property-based tests (hypothesis) for the pure-Python kernel functions —
the leaf semantics everything else builds on."""

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from neocrawler_spark.functions.canon import (
    canonicalize,
    expand_seed,
    md5_hex,
    top_level_domain,
    wash_links,
)
from neocrawler_spark.rules import quota_with_carry

hosts = st.from_regex(r"[a-z]{1,5}(\.[a-z]{1,5}){0,3}", fullmatch=True)
paths = st.from_regex(r"/[a-z0-9_/]{0,20}", fullmatch=True)
params_st = st.lists(
    st.tuples(st.from_regex(r"[a-z]{1,4}", fullmatch=True),
              st.from_regex(r"[a-z0-9]{0,6}", fullmatch=True)),
    max_size=5,
)


@st.composite
def urls(draw):
    h = draw(hosts)
    p = draw(paths)
    q = draw(params_st)
    qs = "&".join(f"{k}={v}" for k, v in q)
    return f"http://{h}{p}" + (f"?{qs}" if qs else "")


@given(urls(), st.lists(st.from_regex(r"[a-z]{1,4}", fullmatch=True), max_size=4))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(url, whitelist):
    once = canonicalize(url, whitelist)
    assert canonicalize(once, whitelist) == once


@given(urls(), st.lists(st.from_regex(r"[a-z]{1,4}", fullmatch=True), min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_canonicalize_only_whitelisted_params_survive(url, whitelist):
    out = canonicalize(url, whitelist)
    q = out.split("?", 1)[1] if "?" in out else ""
    for pair in filter(None, q.split("&")):
        assert pair.split("=", 1)[0] in whitelist


@given(hosts)
@settings(max_examples=200, deadline=None)
def test_tld_drops_at_most_one_label(h):
    t = top_level_domain(h)
    labels = h.split(".")
    if len(labels) <= 2:
        assert t == h
    else:
        assert t == ".".join(labels[1:])
    # idempotence only holds once below 3 labels; applying repeatedly
    # converges to the last two labels
    cur = h
    for _ in range(10):
        cur = top_level_domain(cur)
    assert len(cur.split(".")) <= 2


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=50))
@settings(max_examples=100, deadline=None)
def test_md5_matches_spec(s):
    import hashlib

    assert md5_hex(s) == hashlib.md5(s.encode("utf-8")).hexdigest()
    assert re.fullmatch(r"[0-9a-f]{32}", md5_hex(s))


@given(st.integers(-5, 20), st.integers(-5, 30), st.integers(1, 5))
@settings(max_examples=200, deadline=None)
def test_expand_seed_macro_bounds(lo, hi, step):
    out = expand_seed(f"http://h/p#q#{lo}#{hi}#{step}")
    want = [f"http://hp{x}q" if False else f"http://h/p{x}q" for x in range(lo, hi + 1, step)]
    assert out == want


@given(urls(), st.lists(st.one_of(st.none(), urls(),
                                  st.just("#frag"), st.just("javascript:x"),
                                  st.just("void(0)")), max_size=8))
@settings(max_examples=200, deadline=None)
def test_wash_links_invariants(page, links):
    out = wash_links(page, links)
    assert len(out) == len(set(out))  # deduped
    assert page not in out  # self-link dropped
    for u in out:
        assert not u.startswith("#") and not u.startswith("javascript")


@given(
    st.lists(
        st.tuples(st.floats(0.1, 100, allow_nan=False), st.integers(0, 1000)),
        min_size=1, max_size=10,
    ),
    st.integers(0, 5000),
)
@settings(max_examples=200, deadline=None)
def test_quota_carry_invariants(rate_avail, balance):
    rows = [
        {"key": f"r{i}", "rate": r, "available": a}
        for i, (r, a) in enumerate(rate_avail)
    ]
    total = sum(r["rate"] for r in rows)
    cts = quota_with_carry(rows, balance, total)
    # every ct ≥ its own ceil share (carry only adds)
    avg = max(balance, 0) / total
    scheduled = 0
    for r in rows:
        assert cts[r["key"]] >= math.ceil(avg * r["rate"])
        scheduled += min(r["available"], cts[r["key"]])
    # total admitted ≤ sum of ceil shares (= balance + #rules slack at most)
    assert scheduled <= sum(math.ceil(avg * r["rate"]) for r in rows)

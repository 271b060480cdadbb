"""Differential test: the fast regex tokenizer (css.parse_html) must produce
a DOM indistinguishable from the stdlib-HTMLParser reference builder
(css.parse_html_reference) on every page shape the engine ever parses —
synth corpus pages plus adversarial fragments covering comments, charrefs,
self-closing/void tags, script/style CDATA, mis-nesting, duplicate and
quoted/unquoted attributes, bogus comments and PIs.

"Indistinguishable" = identical tag / attrs / child structure, identical
.text() at every node, identical inner_html() spans (the three picks the
extraction rules consume)."""

import pytest

from neocrawler_spark import synth
from neocrawler_spark.functions.css import (
    parse_html,
    parse_html_reference,
    select,
)


def _assert_dom_equal(a, b, source, path="#root"):
    assert a.tag == b.tag, f"{path}: tag {a.tag!r} != {b.tag!r}"
    assert a.attrs == b.attrs, f"{path}: attrs {a.attrs!r} != {b.attrs!r}"
    assert a.text() == b.text(), f"{path}: text differs"
    assert a.inner_html(source) == b.inner_html(source), (
        f"{path}: inner_html differs "
        f"({a.content_start},{a.content_end}) vs ({b.content_start},{b.content_end})"
    )
    assert len(a.children) == len(b.children), (
        f"{path}: child count {len(a.children)} != {len(b.children)}"
    )
    for i, (ca, cb) in enumerate(zip(a.children, b.children)):
        assert ca.child_index == cb.child_index, f"{path}[{i}]: child_index"
        _assert_dom_equal(ca, cb, source, f"{path}/{ca.tag}[{i}]")


def _pages():
    params = synth.site_params(n_domains=2, cats=2, lists_per_cat=2,
                               details_per_list=3, hot_details_per_list=3)
    out = []
    for d in range(2):
        out.append(synth.render_home(d, params)[0])
        for c in range(2):
            out.append(synth.render_category(d, c, params)[0])
            for p in range(2):
                out.append(synth.render_list(d, c, p, params)[0])
        for i in range(4):
            out.append(synth.render_detail(d, i)[0])
    return out


FRAGMENTS = [
    # charrefs in text and attributes, named + numeric + missing-semicolon
    '<div title="a &amp; b &#65; &lt;x&gt;">&amp; &#169; &copy; &nbsp;x &notanentity;</div>',
    # comments between text nodes, nested element text ordering
    "<p>alpha<!-- hidden -->beta<span>gamma</span>delta</p>",
    # void + self-closing + non-void self-closed
    '<div><br><img src="/a.png"/><hr/><input type="text"><span/>tail</div>',
    # script/style CDATA: tags and charrefs inside stay raw
    '<script>if (a < b && c > d) { x = "<div>&amp;</div>"; }</script><p>after</p>',
    "<style>a > b { content: '</p>'; }</style><i>done</i>",
    # mis-nested tags (pop to nearest matching open tag)
    "<div><b>bold<i>both</b>italic?</i></div>",
    # unquoted / single-quoted / valueless / duplicate attributes
    "<a href=/x class='k v' data-empty selected href=/y>link</a>",
    # uppercase names, bogus comment, processing instruction, doctype
    '<!DOCTYPE html><?xml version="1.0"?><!-- c --><DIV CLASS="Big">T</DIV><![CDATA[raw]]>',
    # stray '<' treated as text; entity at chunk boundary
    "<p>1 < 2 and &lt;tag&gt; stays text</p>",
    # nth-child / structure fixture
    "<ul><li>a</li><li>b</li><li>c</li></ul>",
    # attribute with '>' inside a quoted value
    '<div data-x="a > b" class="q">inner</div><span>next</span>',
    # empty document / text-only / tag-only
    "",
    "just text &amp; entities",
    "<br>",
    # multibyte text + entities (the corpus is zh-heavy)
    '<td>微信号：wx_1 &middot; 功能</td>',
]


@pytest.mark.parametrize("idx", range(len(FRAGMENTS)))
def test_fragment_dom_equal(idx):
    src = FRAGMENTS[idx]
    _assert_dom_equal(parse_html(src), parse_html_reference(src), src)


def test_synth_corpus_dom_equal():
    for src in _pages():
        _assert_dom_equal(parse_html(src), parse_html_reference(src), src)


def test_selects_equal_on_corpus():
    sels = ["#bodyContent", ".related .item .name", "div > strong",
            "a", "table td", ".item:nth-child(2)", "div.crumb a",
            "[href]", "span.score:last-child, span.name:first-child"]
    for src in _pages():
        fast, ref = parse_html(src), parse_html_reference(src)
        for sel in sels:
            got = [(n.tag, n.text(), n.attrs) for n in select(fast, sel)]
            want = [(n.tag, n.text(), n.attrs) for n in select(ref, sel)]
            assert got == want, f"{sel}: {got} != {want}"

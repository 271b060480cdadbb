"""CSS-engine + extraction-rule-tree unit vectors, structurally mirroring
/root/reference/test/extractorTest.js:20-54 (cssSelector breadcrumb text,
regexSelector group pull) on fixed documents."""

import json

from neocrawler_spark.functions import css
from neocrawler_spark.functions.extract import (
    css_selector,
    extract_data,
    extract_links,
    regex_selector,
    validate_content,
)

DOC = """<html><head><title> My Title </title></head><body>
<div id="breadCrumb" class="crumb"><a href="/">首页</a> &gt; <span>食品</span></div>
<div class="box first"><p>one</p><p>two</p><p>three</p></div>
<ul class="menu"><li>a</li><li class="sel">b</li><li>c</li></ul>
<div class="avatar"><img src="/i.jpg"/></div>
<table><tr><td>微信号：wx_99</td></tr></table>
<div class="outer"><div class="inner"><b>deep</b></div></div>
</body></html>"""


def root():
    return css.parse_html(DOC)


# ------------------------------------------------------------- css engine


def test_select_by_id_and_text():
    n = css.select(root(), "#breadCrumb")
    assert len(n) == 1
    # cheerio .text(): concatenated descendant text nodes, no normalization
    assert n[0].text() == "首页 > 食品"


def test_select_tag_class_compound():
    assert [n.text() for n in css.select(root(), "div.box p")] == ["one", "two", "three"]
    assert css.select(root(), "li.sel")[0].text() == "b"


def test_child_vs_descendant():
    assert len(css.select(root(), ".outer > .inner")) == 1
    assert len(css.select(root(), ".outer b")) == 1
    assert len(css.select(root(), ".outer > b")) == 0


def test_nth_child_and_first_last():
    assert css.select(root(), ".menu li:nth-child(2)")[0].text() == "b"
    assert css.select(root(), ".menu li:first-child")[0].text() == "a"
    assert css.select(root(), ".menu li:last-child")[0].text() == "c"


def test_attr_selector_and_pick():
    assert css.select(root(), "img[src]")[0].attr("src") == "/i.jpg"
    assert css.select(root(), 'img[src="/i.jpg"]') != []
    assert css.select(root(), 'img[src="/nope.jpg"]') == []


def test_inner_html_byte_exact():
    n = css.select(root(), ".inner")[0]
    assert n.inner_html(DOC) == "<b>deep</b>"


def test_comma_groups_document_order():
    texts = [n.text() for n in css.select(root(), "li.sel, .box p")]
    assert texts == ["one", "two", "three", "b"]


# ---------------------------------------------------------- css_selector API


def test_css_selector_index_default_1():
    # !index → 1 (extractor.js:318)
    assert css_selector(root(), ".box p", "text", None, DOC) == "one"
    assert css_selector(root(), ".box p", "text", 0, DOC) == "one"
    assert css_selector(root(), ".box p", "text", 2, DOC) == "two"


def test_css_selector_index_minus1_collapses_singleton():
    # index=-1 → all matches; single element collapses to scalar (:333)
    assert css_selector(root(), ".box p", "text", -1, DOC) == ["one", "two", "three"]
    assert css_selector(root(), "#breadCrumb span", "text", -1, DOC) == "食品"


def test_css_selector_out_of_range_empty():
    assert css_selector(root(), ".box p", "text", 9, DOC) == ""
    assert css_selector(root(), ".nothing", "text", 1, DOC) == ""
    assert css_selector(root(), ".nothing", "@src", 1, DOC) is None


def test_css_selector_trims():
    assert css_selector(root(), "title", "text", 1, DOC) == "My Title"  # .trim() :365


# ------------------------------------------------------------- regex


def test_regex_selector_first_group():
    # extractorTest.js:37-54 analog: pull an id group out of a URL
    assert (
        regex_selector("http://z.com/q?qid=1387944813&x=1", r"qid=([0-9]+)", 1)
        == "1387944813"
    )


def test_regex_selector_index0_coerced_to_1():
    assert regex_selector("ab12cd", r"([0-9]+)", 0) == "12"


def test_regex_selector_case_insensitive():
    # JS RegExp(expr,'ig') — the i flag (extractor.js:379)
    assert regex_selector("XyZ HELLO", r"hello", 1) is None  # group 1 absent
    assert regex_selector("XyZ HELLO", r"(hello)", 1) == "HELLO"


def test_regex_selector_all_matches_group1():
    # index=-1 → group 1 of every match (extractor.js:383-389)
    assert regex_selector("a=1 b=22 c=333", r"=([0-9]+)", -1) == ["1", "22", "333"]


# ------------------------------------------------------------ rule tree


def test_extract_data_modes_and_require():
    rule = {
        "category": "t",
        "rule": {
            "crumb": {"mode": "css", "expression": "#breadCrumb span", "pick": "text", "index": 1},
            "wx": {"mode": "regex", "expression": "微信号：(wx_[0-9]+)", "index": 1},
            "const": {"mode": "value", "expression": "fixed"},
            "missing": {"mode": "css", "expression": ".nope", "pick": "text", "index": 1},
            "xp": {"mode": "xpath", "expression": "//a"},  # declared-no-op (:231)
            "from_url": {"mode": "regex", "base": "url", "expression": "p=([a-z]+)", "index": 1},
        },
        "require": ["crumb", ["missing", "wx"], "gone"],
    }
    lacks = []
    data = extract_data("http://h/x?p=abc", DOC, rule, None, None, lacks)
    assert data["$category"] == "t"
    assert data["crumb"] == "食品"
    assert data["wx"] == "wx_99"
    assert data["const"] == "fixed"
    assert data["from_url"] == "abc"
    assert "missing" not in data
    assert "xp" not in data
    # any-of [missing, wx] satisfied by wx; plain 'gone' lacks
    assert lacks == ["gone"]


def test_extract_data_subset_relate():
    rule = {
        "rule": {
            "title": {"mode": "css", "expression": "title", "pick": "text", "index": 1},
            "items": {
                "mode": "css",
                "expression": ".menu li",
                "index": 1,
                "subset": {
                    "category": "kid",
                    "relate": "title",
                    "rule": {"v": {"mode": "css", "expression": "*", "pick": "text", "index": 1}},
                },
            },
        }
    }
    data = extract_data("http://h/x", DOC, rule, None, None, [])
    kids = data["items"]
    assert len(kids) == 3
    assert all(k["relate"] == "My Title" for k in kids)
    assert kids[0]["$category"] == "kid"


def test_extract_links_img_src():
    # extractor.js:32-41: <img> → @src, else @href
    links = extract_links(css.parse_html(DOC), [".avatar img", "#breadCrumb a"])
    assert links == ["/i.jpg", "/"]


def test_validate_content():
    # extractor.js:392-414
    assert validate_content(200, "x" * 500, False, None)
    assert not validate_content(200, "x" * 499, False, None)
    assert validate_content(200, "x" * 20, True, None)
    assert not validate_content(200, "x" * 600, False, ["absent"])
    assert validate_content(200, "x" * 600 + "kw", False, ["kw"])
    assert not validate_content(404, "x" * 600, False, None)
    assert validate_content(300, "", False, None)  # only >300 invalid

"""Unit vectors for URL identity semantics, structurally mirroring the
reference's own tests (/root/reference/test/extractorTest.js:56-66 —
arrange_link id-parameter canonicalization golden)."""

from neocrawler_spark.functions.canon import (
    canonicalize,
    expand_seed,
    md5_hex,
    top_level_domain,
    url_domain,
    url_host,
    wash_links,
)


def test_top_level_domain_bug_compatible():
    assert top_level_domain("www.baidu.com") == "baidu.com"
    assert top_level_domain("baidu.com") == "baidu.com"
    assert top_level_domain("localhost") == "localhost"
    # NOT a public-suffix list: a.b.co.uk → b.co.uk (scheduler/index.js:269-273)
    assert top_level_domain("a.b.co.uk") == "b.co.uk"
    assert top_level_domain(None) is None


def test_url_host_lowercased():
    assert url_host("http://WWW.Example.COM/Path") == "www.example.com"
    assert url_domain("http://www.example.com/p") == "example.com"


def test_canonicalize_whitelist_order():
    # params kept in WHITELIST order, not URL order (scheduler/index.js:318-323)
    u = "http://h.test/a?z=9&id=5&x=1"
    assert canonicalize(u, ["id", "z"]) == "http://h.test/a?id=5&z=9"
    assert canonicalize(u, ["z", "id"]) == "http://h.test/a?z=9&id=5"


def test_canonicalize_hash_strips_all():
    assert canonicalize("http://h.test/a?id=5&b=2", ["#"]) == "http://h.test/a"
    assert canonicalize("http://h.test/a?id=5", ["#", "id"]) == "http://h.test/a"


def test_canonicalize_no_id_parameter_is_identity():
    u = "http://h.test/a?z=9&id=5"
    assert canonicalize(u, None) == u
    assert canonicalize(u, []) == u


def test_canonicalize_missing_params_skipped():
    assert canonicalize("http://h.test/a?x=1", ["id"]) == "http://h.test/a"


def test_md5_hex_identity():
    # identity of every URL: md5 hex lowercase (scheduler/index.js:344)
    assert md5_hex("http://www.baidu.com/") == "f03f5717616221de41881be555473a02"


def test_expand_seed_macro():
    # prefix#suffix#min#max#step (scheduler/index.js:167-178)
    assert expand_seed("http://h/p_#.html#1#7#3") == [
        "http://h/p_1.html",
        "http://h/p_4.html",
        "http://h/p_7.html",
    ]
    assert expand_seed("http://h/plain.html") == ["http://h/plain.html"]


def test_wash_links():
    # extractor.js:62-79: trim, junk-prefix drop, resolve, self-drop, dedupe
    out = wash_links(
        "http://h.test/dir/page.html",
        [
            None,
            "  #anchor",
            "javascript:void(0)",
            "void(0)",
            " sub.html ",
            "/root.html",
            "sub.html",
            "http://h.test/dir/page.html",
        ],
    )
    assert out == ["http://h.test/dir/sub.html", "http://h.test/root.html"]

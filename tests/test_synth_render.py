"""The vectorized detail renderer in synth.gen_pages_df must stay
byte-identical to the scalar render_detail (the goldens and the e2e
byte-exact extraction tests all flow from it)."""

import re

from neocrawler_spark import synth

PARAMS = synth.site_params(n_domains=2, cats=2, lists_per_cat=3,
                           details_per_list=4, hot_details_per_list=6)


def test_vectorized_details_byte_identical(spark):
    rows = synth.gen_pages_df(spark, PARAMS).collect()
    details = 0
    for r in rows:
        m = re.search(r"weixin_(\d+)\.html", r["url"])
        if not m:
            continue
        i = int(m.group(1))
        d = int(re.search(r"site(\d+)", r["url"]).group(1))
        html, text = synth.render_detail(d, i)
        assert bytes(r["html"]) == html.encode("utf-8"), r["url"]
        assert r["text"] == text
        exp_ms = synth.BASE_TS_MS + (synth.hash_free_offset(r["url"]) % 86_400_000)
        assert int(r["warc_ts"].timestamp() * 1000) == exp_ms
        details += 1
    assert details >= 40  # both hot and non-hot domains covered

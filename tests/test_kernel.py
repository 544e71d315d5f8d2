"""Kernel tests: transformer (T4-T9), text (T14), canonical (F1/F2),
full-page extraction (T16/T20).

Cases re-express the reference's semantics with citations; cache/normalizeUrl
cases mirror ``packages/libs/src/__tests__/cache.test.ts``.
"""

from anycrawl_spark.kernel.canonical import (
    base_domain_of,
    host_of,
    normalize_url,
    origin_of,
    resolve_url,
    unique_key,
    url_hash,
)
from anycrawl_spark.kernel.extract import extract_page, process_markdown
from anycrawl_spark.kernel.text import html_to_text
from anycrawl_spark.kernel.transformer import (
    TransformOptions,
    extract_links,
    extract_metadata,
    extract_title,
    transform_html,
)


class TestCanonical:
    def test_lowercase_hostname(self):
        assert normalize_url("https://EXAMPLE.com/Path") == "https://example.com/Path"

    def test_strip_trailing_slash_non_root(self):
        assert normalize_url("https://example.com/a/b/") == "https://example.com/a/b"

    def test_keep_root_slash(self):
        assert normalize_url("https://example.com/") == "https://example.com/"

    def test_add_root_slash(self):
        # JS `new URL('https://example.com').toString()` → trailing slash
        assert normalize_url("https://example.com") == "https://example.com/"

    def test_drop_tracking_params(self):
        url = "https://example.com/p?utm_source=x&utm_medium=y&fbclid=1&gclid=2&keep=1"
        assert normalize_url(url) == "https://example.com/p?keep=1"

    def test_sort_params(self):
        assert normalize_url("https://example.com/p?b=2&a=1&c=3") == "https://example.com/p?a=1&b=2&c=3"

    def test_invalid_url_passthrough(self):
        assert normalize_url("not a url") == "not a url"

    def test_fragment_kept_by_normalize(self):
        # reference normalizeUrl never touches the hash (cache/index.ts:130-148)
        assert normalize_url("https://example.com/p#sec") == "https://example.com/p#sec"

    def test_unique_key_strips_fragment(self):
        assert unique_key("https://example.com/p#sec") == "https://example.com/p"

    def test_unique_key_job_scope(self):
        # Base.ts:464-473 — uniqueKey = `${jobId}-${computeUniqueKey(url)}`
        assert unique_key("https://example.com/p", "job1") == "job1-https://example.com/p"

    def test_url_hash_is_sha256_of_canonical(self):
        import hashlib
        expect = hashlib.sha256(b"https://example.com/p?a=1").hexdigest()
        assert url_hash("https://EXAMPLE.com/p/?a=1&utm_source=z") == expect

    def test_resolve_relative(self):
        assert resolve_url("https://example.com/a/b", "/c") == "https://example.com/c"
        assert resolve_url("https://example.com/a/", "c") == "https://example.com/a/c"

    def test_resolve_malformed_scheme(self):
        # HTMLTransformer.ts:514-532 — http:/x → http://x
        assert resolve_url("https://base.test/", "http:/example.com/x") == "http://example.com/x"

    def test_resolve_protocol_relative(self):
        assert resolve_url("https://base.test/", "//cdn.test/a.js") == "https://cdn.test/a.js"

    def test_host_origin_basedomain(self):
        assert host_of("https://Sub.Example.COM:8443/x") == "sub.example.com"
        assert origin_of("https://sub.example.com/x") == "https://sub.example.com"
        assert origin_of("https://sub.example.com:8443/x") == "https://sub.example.com:8443"
        assert base_domain_of("a.b.example.com") == "example.com"
        assert base_domain_of("localhost") == "localhost"
        # crawlee registrable-domain semantics: multi-label public suffixes
        assert base_domain_of("www.example.co.uk") == "example.co.uk"
        assert base_domain_of("example.co.uk") == "example.co.uk"
        assert base_domain_of("a.b.shop.com.au") == "shop.com.au"

    def test_map_base_domain(self):
        from anycrawl_spark.kernel.canonical import map_base_domain_of

        # MapService.getBaseDomain: plain last-2, <=2 labels pass through
        assert map_base_domain_of("www.example.com") == "example.com"
        assert map_base_domain_of("example.co.uk") == "co.uk"  # ref's own rule
        assert map_base_domain_of("www.example.co.uk") == "co.uk"
        assert map_base_domain_of("localhost") == "localhost"


class TestTransformer:
    def test_always_remove_tags(self):
        html = "<script>x</script><style>y</style><noscript>z</noscript><p>keep</p>"
        out = transform_html(html, "https://t.test/")
        assert "script" not in out and "style" not in out and "noscript" not in out
        assert "keep" in out

    def test_only_main_content_removes_chrome(self):
        html = (
            "<header>site chrome</header><nav>menu</nav>"
            '<div class="sidebar">sb</div><div class="cookie-banner">cookies</div>'
            "<main><p>the article</p></main><footer>foot</footer>"
        )
        out = transform_html(html, "https://t.test/")
        assert "site chrome" not in out and "menu" not in out
        assert "sb" not in out and "cookies" not in out and "foot" not in out
        assert "the article" in out

    def test_force_include_preserves_wrappers(self):
        # HTMLTransformer.ts:229-253 — excluded wrapper kept when it contains
        # a FORCE_INCLUDE_MAIN_TAGS match
        html = '<div class="sidebar"><div class="post-content">real content</div></div>'
        out = transform_html(html, "https://t.test/")
        assert "real content" in out

    def test_only_main_content_off(self):
        html = "<header>chrome</header><p>body</p>"
        out = transform_html(html, "https://t.test/", TransformOptions(only_main_content=False))
        assert "chrome" in out

    def test_include_tags_projection(self):
        html = "<div class='a'><p>one</p></div><div class='b'><p>two</p></div>"
        out = transform_html(html, "https://t.test/", TransformOptions(include_tags=[".b"]))
        assert "two" in out and "one" not in out

    def test_exclude_tags(self):
        html = "<p class='x'>drop</p><p>keep</p>"
        out = transform_html(html, "https://t.test/", TransformOptions(exclude_tags=[".x"]))
        assert "drop" not in out and "keep" in out

    def test_comment_removal(self):
        out = transform_html("<p>a<!-- hidden -->b</p>", "https://t.test/")
        assert "hidden" not in out

    def test_relative_url_rewrite(self):
        html = '<a href="/x">l</a><img src="img/pic.png">'
        out = transform_html(html, "https://t.test/base/")
        assert 'href="https://t.test/x"' in out
        assert 'src="https://t.test/base/img/pic.png"' in out

    def test_srcset_largest_wins(self):
        # HTMLTransformer.ts:383-466 — width descriptors, largest becomes src
        html = '<img srcset="/small.png 400w, /big.png 800w" src="/orig.png">'
        out = transform_html(html, "https://t.test/")
        assert 'src="https://t.test/big.png"' in out
        assert "https://t.test/small.png 400w" in out

    def test_srcset_pixel_density_includes_src_as_1x(self):
        html = '<img srcset="/two.png 2x" src="/one.png">'
        out = transform_html(html, "https://t.test/")
        assert 'src="https://t.test/two.png"' in out

    def test_title_and_metadata(self):
        html = (
            "<html><head><title> My Page </title>"
            '<meta name="description" content=" desc ">'
            '<meta property="og:title" content="OG">'
            '<meta name="empty">'
            "</head><body></body></html>"
        )
        assert extract_title(html) == "My Page"
        meta = extract_metadata(html)
        assert meta == [
            {"name": "description", "content": "desc", "property": None},
            {"name": "og:title", "content": "OG", "property": "og:title"},
        ]

    def test_extract_links(self):
        html = (
            '<a href="/a">1</a><a href="https://other.test/b">2</a>'
            '<a href="mailto:x@y.z">m</a><a href="/a">dup</a>'
            '<a href="#frag">f</a>'
        )
        links = extract_links(html, "https://t.test/")
        assert links == [
            "https://t.test/a",
            "https://other.test/b",
            "https://t.test/#frag",
        ]


class TestText:
    def test_headings_uppercase(self):
        out = html_to_text("<h1>Hello World</h1><p>body text</p>")
        assert "HELLO WORLD" in out
        assert "body text" in out

    def test_links_bracketed(self):
        out = html_to_text('<p>see <a href="https://x.test/">docs</a></p>')
        assert "see docs [https://x.test/]" in out

    def test_lists(self):
        out = html_to_text("<ul><li>alpha</li><li>beta</li></ul>")
        assert " * alpha" in out and " * beta" in out

    def test_wordwrap_80(self):
        out = html_to_text("<p>" + "word " * 40 + "</p>")
        assert all(len(line) <= 80 for line in out.split("\n"))

    def test_pre_verbatim(self):
        out = html_to_text("<pre>a\n  b\n    c</pre>")
        assert "a\n  b\n    c" in out

    def test_blockquote(self):
        out = html_to_text("<blockquote>quoted</blockquote>")
        assert "> quoted" in out

    def test_script_dropped(self):
        out = html_to_text("<script>var x;</script><p>content</p>")
        assert "var x" not in out and "content" in out


class TestExtractPage:
    HTML = (
        "<html><head><title>T</title><meta name='d' content='x'></head><body>"
        "<header>chrome</header>"
        "<main><h1>Article</h1><p>Hello <strong>world</strong>, this is the main "
        "body of the article with plenty of words to avoid the fallback path. "
        "It keeps going for a while so the markdown is long enough.</p>"
        "<a href='/next'>next</a></main>"
        "</body></html>"
    )

    def test_document_shape(self):
        doc = extract_page("https://site.test/page", self.HTML)
        assert doc["title"] == "T"
        assert doc["metadata"][0]["name"] == "d"
        assert "# Article" in doc["markdown"]
        assert "chrome" not in doc["markdown"]  # main-content filter applied
        assert "ARTICLE" in doc["text"]          # text comes from RAW html
        assert "chrome" in doc["text"]
        assert doc["links"] == ["https://site.test/next"]

    def test_markdown_fallback_for_thin_pages(self):
        # DataExtractor.ts:335-394 — <100 chars / <20 words triggers a
        # re-conversion of the SAME input html after minimal cleaning only
        # (getFallbackHtml removes script/style/noscript/iframe + comments).
        from anycrawl_spark.kernel.markdown import html_to_markdown
        from anycrawl_spark.kernel.transformer import fallback_html

        thin = "<p>short</p><!-- note --><iframe>f</iframe>"
        md = process_markdown(thin)
        assert md == html_to_markdown(fallback_html(thin))
        # a rich page does NOT take the fallback path
        rich = "<p>" + "many words of real article content here. " * 10 + "</p>"
        assert process_markdown(rich) == html_to_markdown(rich)

    def test_deterministic(self):
        a = extract_page("https://site.test/page", self.HTML)
        b = extract_page("https://site.test/page", self.HTML)
        assert a == b


class TestDomBackends:
    """The fast regex tokenizer must build byte-identical trees to the
    stdlib html.parser backend — asserted over every fixture page plus
    malformed-HTML edge cases."""

    EDGES = [
        "a < b & c &amp; d <p>x &lt;ok&gt;",
        "<p>unterminated <!-- comment",
        '<script>if (a<b && c>d) { x("</div>"); }</script><p>after</p>',
        '<style>a>b{color:red}</style><P CLASS="X Y" data-Foo=bar baz>t</P>',
        '<div/><span attr="v>w">q</span><img src=x.png alt="a&quot;b">',
        "<ul><li>one<li>two<table><tr><td>a<td>b</table>",
        "<?php echo 1 ?><!DOCTYPE html><p>pi</p></p></notopen>",
        "<p>truncated <a href=",
        "",
        # tolerant end-tag forms (html.parser semantics, both backends)
        "<b>x</b extra><i>y</i>",
        "x</br>y",
        "</123>after",
        "</>x",
        "</ >x",
        "no</p>match",
        "<table><tr><td>a<tr><td>b</table>",
    ]

    def test_extract_parity_fixtures_and_edges(self):
        import os

        from anycrawl_spark.corpus import build_page_html
        from anycrawl_spark.kernel.extract import extract_page

        cases = [(f"https://site00{h}.test/p/{i}",
                  build_page_html(h, 6, i, 30, "en"))
                 for h in range(4) for i in range(30)]
        cases += [(f"https://e.test/{j}", h) for j, h in enumerate(self.EDGES)]
        for url, html in cases:
            fast = extract_page(url, html)
            os.environ["ANYCRAWL_DOM_BACKEND"] = "stdlib"
            try:
                std = extract_page(url, html)
            finally:
                del os.environ["ANYCRAWL_DOM_BACKEND"]
            assert fast == std, url


class TestParserHtmlparser2Semantics:
    """Reference-parser (htmlparser2/cheerio) behaviors the tree builder
    reproduces: stray </br> emits a <br>, unmatched </p> synthesizes an
    empty <p>, implicit closes cascade (td→tr), and deep nesting is capped
    instead of blowing the recursion limit downstream."""

    def test_stray_br_end_tag_emits_br(self):
        from anycrawl_spark.kernel.dom import parse_html, serialize
        from anycrawl_spark.kernel.text import html_to_text

        assert serialize(parse_html("x</br>y")) == "x<br>y"
        assert html_to_text("<p>one</br>two</p>") == "one\ntwo"

    def test_unmatched_p_synthesizes_empty_p(self):
        from anycrawl_spark.kernel.dom import parse_html, serialize

        assert serialize(parse_html("no</p>match")) == "no<p></p>match"

    def test_implicit_close_cascades(self):
        from anycrawl_spark.kernel.dom import parse_html, serialize

        got = serialize(parse_html("<table><tr><td>a<tr><td>b</table>"))
        assert got == "<table><tr><td>a</td></tr><tr><td>b</td></tr></table>"

    def test_tolerant_end_tags(self):
        from anycrawl_spark.kernel.dom import parse_html, serialize

        assert serialize(parse_html("<b>x</b junk><i>y</i>")) == "<b>x</b><i>y</i>"
        assert serialize(parse_html("</123>a")) == "<!--123-->a"
        assert serialize(parse_html("</>a")) == "a"

    def test_depth_bomb_capped(self):
        import sys

        from anycrawl_spark.kernel.extract import extract_page

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(20_000)
        try:
            doc = extract_page("http://a.test/", "<div>" * 100_000 + "x",
                               formats=("markdown", "text", "links"))
        finally:
            sys.setrecursionlimit(old)
        assert doc["text"] == "x"


class TestCanonicalProperties:
    """Property-based hardening (hypothesis): the canonicalizer must be
    idempotent and the JVM column must match the Python path on arbitrary
    structured URLs, not just the golden set."""

    def test_normalize_idempotent_and_hash_stable(self):
        from hypothesis import given, settings, strategies as st

        from anycrawl_spark.kernel.canonical import normalize_url, url_hash

        label = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABC0123456789-",
                        min_size=1, max_size=8)
        seg = st.text(alphabet="abcdefgXYZ0123456789._~-", min_size=0,
                      max_size=6)
        urls = st.builds(
            lambda scheme, host_labels, port, segs, q_keys, frag:
                f"{scheme}://{'.'.join(host_labels)}"
                + (f":{port}" if port else "")
                + "/" + "/".join(segs)
                + ("?" + "&".join(f"{k}={i}" for i, k in enumerate(q_keys))
                   if q_keys else "")
                + (f"#{frag}" if frag else ""),
            st.sampled_from(["http", "https", "HTTP", "Https"]),
            st.lists(label, min_size=1, max_size=3),
            st.sampled_from([None, 80, 443, 8080, 9]),
            st.lists(seg, min_size=0, max_size=4),
            st.lists(st.sampled_from(
                ["a", "b", "zz", "utm_source", "fbclid", "k"]),
                min_size=0, max_size=4, unique=True),
            st.sampled_from([None, "frag", "s-2"]),
        )

        from urllib.parse import urlsplit

        @settings(max_examples=300, deadline=None)
        @given(urls)
        def check(url):
            once = normalize_url(url)
            # the reference strips exactly ONE trailing slash (cache/
            # index.ts:136-138), so idempotence holds once no trailing
            # slash remains — hypothesis found the '///' case, which the
            # reference also re-normalizes differently on a second pass
            path = urlsplit(once).path
            if not (len(path) > 1 and path.endswith("/")):
                assert normalize_url(once) == once, (url, once)
            assert url_hash(url) == url_hash(url)
            # tracking params never survive
            assert "utm_source=" not in once and "fbclid=" not in once

        check()
        # single-strip parity with the reference, explicitly
        assert normalize_url("http://h.test/a///") == "http://h.test/a//"

    def test_jvm_matches_python_on_generated_urls(self, spark):
        from hypothesis import given, settings, strategies as st

        from anycrawl_spark.kernel.canonical import (
            canonical_url_col, normalize_url)

        label = st.text(alphabet="abcdefghij0123456789-", min_size=1,
                        max_size=6)
        collected: list[str] = []

        @settings(max_examples=250, deadline=None)
        @given(
            st.sampled_from(["http", "https"]),
            st.lists(label, min_size=1, max_size=3),
            st.sampled_from([None, 80, 443, 8080]),
            st.lists(st.sampled_from(["p", "a.b", "x_y", ""]), max_size=3),
            st.lists(st.sampled_from(["a", "b", "utm_medium", "z"]),
                     max_size=3, unique=True),
        )
        def collect(scheme, host_labels, port, segs, q_keys):
            url = (f"{scheme}://{'.'.join(host_labels)}"
                   + (f":{port}" if port else "")
                   + "/" + "/".join(segs)
                   + ("?" + "&".join(f"{k}=1" for k in q_keys)
                      if q_keys else ""))
            collected.append(url)

        collect()
        df = spark.createDataFrame([(u,) for u in set(collected)], "u string")
        rows = df.select("u", canonical_url_col("u").alias("jvm")).collect()
        for r in rows:
            assert r["jvm"] == normalize_url(r["u"]), r["u"]


class TestMarkdownOCR:
    """Ports packages/scrape/src/__tests__/core/MarkdownOCR.test.ts plus
    balanced-bracket / escape edge cases of MarkdownOCR.ts:35-131."""

    def test_collects_plain_and_linked_images(self):
        from anycrawl_spark.kernel.ocr import collect_image_occurrences

        markdown = "\n".join([
            "Intro", "",
            "![first](https://example.com/a.png)", "",
            "[![second](https://example.com/b.png)](https://example.com/details)",
            "", "Tail",
        ])
        occ = collect_image_occurrences(markdown)
        assert len(occ) == 2
        assert occ[0].image_url == "https://example.com/a.png"
        assert occ[1].image_url == "https://example.com/b.png"
        span = markdown[occ[1].image_start - 1:occ[1].insert_after]
        assert span == "[![second](https://example.com/b.png)](https://example.com/details)"

    def test_injects_block_after_each_image(self):
        from anycrawl_spark.kernel.ocr import inject_ocr_blocks

        markdown = "\n".join([
            "![first](https://example.com/a.png)", "",
            "[![second](https://example.com/b.png)](https://example.com/details)",
        ])
        out = inject_ocr_blocks(markdown, {
            "https://example.com/a.png": "first image text",
            "https://example.com/b.png": "second image text",
        })
        assert ("![first](https://example.com/a.png)\n\n[ANYCRAWL_OCR_TEXT]\n"
                "first image text\n[/ANYCRAWL_OCR_TEXT]") in out
        assert ("[![second](https://example.com/b.png)](https://example.com/details)"
                "\n\n[ANYCRAWL_OCR_TEXT]\nsecond image text\n[/ANYCRAWL_OCR_TEXT]") in out

    def test_empty_block_when_ocr_unavailable(self):
        from anycrawl_spark.kernel.ocr import (
            OCR_BLOCK_CLOSE, OCR_BLOCK_OPEN, inject_ocr_blocks)

        out = inject_ocr_blocks("![first](https://example.com/a.png)", {})
        assert OCR_BLOCK_OPEN in out and OCR_BLOCK_CLOSE in out

    def test_normalize_strips_markers_and_collapses(self):
        from anycrawl_spark.kernel.ocr import normalize_ocr_text

        got = normalize_ocr_text(
            "  line1\r\n\r\n\r\n[ANYCRAWL_OCR_TEXT]line2[/ANYCRAWL_OCR_TEXT]  ")
        assert got == "line1\n\nline2"

    def test_normalize_caps_at_4000(self):
        from anycrawl_spark.kernel.ocr import normalize_ocr_text

        assert normalize_ocr_text("x" * 5000) == "x" * 4000 + "..."
        assert normalize_ocr_text("x" * 4000) == "x" * 4000

    def test_balanced_brackets_and_escapes(self):
        from anycrawl_spark.kernel.ocr import collect_image_occurrences

        # nested brackets in alt, escaped closers, title after url
        occ = collect_image_occurrences(
            r"![a [nested] alt](https://e.test/i.png 'title')")
        assert occ[0].image_url == "https://e.test/i.png"
        occ = collect_image_occurrences(
            r"![esc \] alt](https://e.test/j.png)")
        assert occ[0].image_url == "https://e.test/j.png"
        # angle-bracketed destination with spaces
        occ = collect_image_occurrences("![a](<https://e.test/with space.png>)")
        assert occ[0].image_url == "https://e.test/with space.png"
        # unterminated token is skipped, later valid token still found
        occ = collect_image_occurrences(
            "![broken](no-close ![ok](https://e.test/k.png)")
        assert [o.image_url for o in occ] and occ[-1].image_url == "https://e.test/k.png"

    def test_linked_image_requires_exact_wrapper(self):
        from anycrawl_spark.kernel.ocr import collect_image_occurrences

        # wrapper bracket contains MORE than the image -> not a linked image,
        # insertion lands right after the image token itself
        md = "[text ![a](https://e.test/a.png)](https://e.test/l)"
        occ = collect_image_occurrences(md)
        assert len(occ) == 1
        assert occ[0].insert_after == occ[0].image_end

    def test_image_urls_dedup_in_order(self):
        from anycrawl_spark.kernel.ocr import image_urls

        md = ("![a](https://e.test/1.png) ![b](https://e.test/2.png) "
              "![c](https://e.test/1.png)")
        assert image_urls(md) == ["https://e.test/1.png", "https://e.test/2.png"]

    def test_udf_hooks(self, spark):
        from anycrawl_spark.udfs import make_inject_ocr_udf, markdown_image_urls_udf
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("![x](https://e.test/x.png) tail",), ("no images",)],
            "md string")
        urls = [r[0] for r in df.select(markdown_image_urls_udf("md")).collect()]
        assert urls == [["https://e.test/x.png"], []]
        inject = make_inject_ocr_udf(lambda u: f"ocr:{u}")
        out = [r[0] for r in df.select(inject("md")).collect()]
        assert "ocr:https://e.test/x.png" in out[0]
        assert out[1] == "no images"


class TestAutoEngine:
    """Decision table from the reference's analyzeHtmlForJSRequirement
    (packages/scrape/src/utils/autoEngine.ts:7-88)."""

    def _page(self, body, head="", pad=True):
        filler = "<!-- " + "pad " * 600 + " -->" if pad else ""
        return f"<html><head>{head}{filler}</head><body>{body}</body></html>"

    def test_spa_shell_requires_js(self):
        from anycrawl_spark.autoengine import analyze_js_requirement

        r = analyze_js_requirement(self._page('<div id="root"></div>'))
        # empty root (+3) + minimal text (+3)
        assert r["js_required"] and r["score"] == 6
        assert "empty-root-container" in r["reasons"]
        assert any(x.startswith("minimal-text:") for x in r["reasons"])

    def test_substantial_article_stays_static(self):
        from anycrawl_spark.autoengine import analyze_js_requirement

        body = "<article>" + "word " * 300 + "</article>"
        r = analyze_js_requirement(self._page(body))
        # substantial text (-3) + semantic content (-1)
        assert not r["js_required"] and r["score"] == -4
        assert "has-semantic-content" in r["reasons"]

    def test_framework_markers_accumulate(self):
        from anycrawl_spark.autoengine import analyze_js_requirement

        head = ('<script>window.__INITIAL_STATE__={}</script>'
                '<script>"__NEXT_DATA__"</script>')
        body = '<div ng-app="x">' + "word " * 150 + "</div>"
        r = analyze_js_requirement(self._page(body, head=head))
        # next(+1) + initial-state(+1) + angular(+2) + moderate text(-1) = 3
        assert r["score"] == 3 and r["js_required"]
        assert "framework:angular" in r["reasons"]

    def test_noscript_fallback_counts_once_over_30_chars(self):
        from anycrawl_spark.autoengine import analyze_js_requirement

        long_ns = "<noscript>JavaScript is required to use this app.</noscript>"
        short_ns = "<noscript>JS off</noscript>"
        txt = "word " * 150
        assert "noscript-fallback" in analyze_js_requirement(
            self._page(long_ns + txt, pad=False))["reasons"]
        assert "noscript-fallback" not in analyze_js_requirement(
            self._page(short_ns + txt, pad=False))["reasons"]

    def test_high_script_density(self):
        from anycrawl_spark.autoengine import analyze_js_requirement

        head = '<script src="a.js"></script>' * 12
        txt = "word " * 60  # 300 chars: not minimal, below 500
        r = analyze_js_requirement(self._page(txt, head=head, pad=False))
        assert any(x.startswith("high-scripts:") for x in r["reasons"])

    def test_small_plain_page_defaults_static(self):
        from anycrawl_spark.autoengine import analyze_js_requirement

        r = analyze_js_requirement("<html><body><p>hi</p></body></html>")
        assert not r["js_required"] and r["score"] == 0

    def test_jvm_column_matches_python_kernel(self, spark):
        from anycrawl_spark.autoengine import (
            analyze_js_requirement, engine_decision_col, js_score_col)

        pages = [
            self._page('<div id="root"></div>'),
            self._page("<article>" + "word " * 300 + "</article>"),
            self._page("word " * 150,
                       head='<script>window.__NUXT__={}</script>'),
            self._page("word " * 60,
                       head='<script src="a.js"></script>' * 12, pad=False),
            "<html><body><p>hi</p></body></html>",
            self._page("<noscript>JavaScript is required to use this app."
                       "</noscript>" + "word " * 150, pad=False),
            "",
        ]
        df = spark.createDataFrame([(p,) for p in pages], "h string")
        rows = df.select(js_score_col("h").alias("s"),
                         engine_decision_col("h").alias("e")).collect()
        for page, row in zip(pages, rows):
            want = analyze_js_requirement(page)
            assert row["s"] == want["score"], page[:80]
            expect_engine = "playwright" if want["js_required"] else "cheerio"
            assert row["e"] == expect_engine


class TestBackendConformance:
    """Conformance suite for the DOM-backend protocol (kernel/backend.py):
    every registered backend — the two built-ins today, a C parser adapter
    at deployment — must (a) produce byte-identical extraction output and
    (b) honor the node contract the kernel walks rely on. This is the
    guarantee that makes the lxml/selectolax swap-in parity-safe."""

    def _cases(self):
        from anycrawl_spark.corpus import build_page_html

        cases = [(f"https://site00{h}.test/p/{i}",
                  build_page_html(h, 6, i, 30, "en"))
                 for h in range(3) for i in range(20)]
        cases += [(f"https://e.test/{j}", h)
                  for j, h in enumerate(TestDomBackends.EDGES)]
        return cases

    def test_registry_has_builtins(self):
        from anycrawl_spark.kernel.backend import available_backends

        names = available_backends()
        assert "fast" in names and "stdlib" in names

    def test_extraction_parity_across_all_backends(self):
        import os

        from anycrawl_spark.kernel.backend import available_backends
        from anycrawl_spark.kernel.extract import extract_page

        cases = self._cases()
        for url, html in cases:
            outputs = {}
            for name in available_backends():
                os.environ["ANYCRAWL_DOM_BACKEND"] = name
                try:
                    outputs[name] = extract_page(url, html)
                finally:
                    del os.environ["ANYCRAWL_DOM_BACKEND"]
            base = outputs["fast"]
            for name, out in outputs.items():
                assert out == base, (name, url)

    def test_node_contract(self):
        from anycrawl_spark.kernel.backend import BACKENDS, available_backends
        from anycrawl_spark.kernel.dom import (
            VOID_ELEMENTS, Comment, Element, Text, serialize)

        html = ('<div CLASS="A b" Data-X=1 novalue><p>t &amp; u<br>v'
                '<img SRC=x.png></p><!-- c --><script>a<b</script></div>')
        for name in available_backends():
            root = BACKENDS[name](html)
            assert isinstance(root, Element) and root.tag == "#root"
            seen_comment = seen_text = False
            stack = [root]
            while stack:
                node = stack.pop()
                for child in getattr(node, "children", []):
                    # parent pointers consistent, document order preserved
                    assert child.parent is node, name
                    stack.append(child)
                if isinstance(node, Element) and node is not root:
                    assert node.tag == node.tag.lower(), name
                    assert all(k == k.lower() for k in node.attrs), name
                    if node.tag in VOID_ELEMENTS:
                        assert node.children == [], name
                elif isinstance(node, Comment):
                    seen_comment = True
                elif isinstance(node, Text):
                    seen_text = True
                    assert "&amp;" not in node.data, name  # entity-decoded
            assert seen_comment and seen_text, name
            # attrs: lowercase keys, valueless -> ""
            div = next(root.iter())
            assert div.get("class") == "A b" and div.get("novalue") == "", name
            # serialize(parse(x)) is a fixed point: parse(serialize) == same
            once = serialize(root)
            again = serialize(BACKENDS[name](once))
            assert once == again, name

    def test_unknown_backend_rejected(self):
        import pytest as _pytest

        from anycrawl_spark.kernel.dom import parse_html

        with _pytest.raises(ValueError, match="unknown DOM backend"):
            parse_html("<p>x</p>", backend="no-such-parser")

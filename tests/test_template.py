"""Template system validation (anycrawl_spark/template.py) vs
TemplateValidator.ts, template-client domainValidator.ts, and the
security-pattern constants — cases re-expressed from the reference's own
TemplateValidator.test.ts / validator.test.ts where they match the current
source."""

import pytest

from anycrawl_spark.template import (
    make_template_allowed_udf,
    normalize_url_for_comparison,
    parse_domain_restriction,
    validate_domain,
    validate_pattern,
    validate_template_code,
    validate_template_id,
)


class TestTemplateId:
    def test_format_rules(self):
        # TemplateValidator.test.ts:3-52
        for good in ("valid-template", "template_123", "UPPERCASE", "a",
                     "a" * 100):
            assert validate_template_id(good)["is_valid"]
        for bad, code in [("", "INVALID_TEMPLATE_ID"),
                          (None, "INVALID_TEMPLATE_ID"),
                          (123, "INVALID_TEMPLATE_ID"),
                          ("has space", "INVALID_TEMPLATE_ID_FORMAT"),
                          ("has.dot", "INVALID_TEMPLATE_ID_FORMAT"),
                          ("emoji🎉", "INVALID_TEMPLATE_ID_FORMAT"),
                          ("a" * 101, "TEMPLATE_ID_TOO_LONG")]:
            got = validate_template_id(bad)
            assert not got["is_valid"] and got["code"] == code

    def test_blacklist(self):
        got = validate_template_id("test-invalid")
        assert not got["is_valid"] and got["code"] == "TEMPLATE_NOT_AVAILABLE"
        assert validate_template_id("test-valid")["is_valid"]


class TestParseRestriction:
    def test_input_forms(self):
        assert parse_domain_restriction("example.com") == {
            "type": "exact", "patterns": ["example.com"]}
        assert parse_domain_restriction(["a.com", "b.com"]) == {
            "type": "exact", "patterns": ["a.com", "b.com"]}
        assert parse_domain_restriction(
            {"type": "glob", "patterns": ["*.a.com"]}) == {
            "type": "glob", "patterns": ["*.a.com"]}
        # comma-delimited convenience + whitespace trim
        assert parse_domain_restriction(["a.com, b.com", " c.com "]) == {
            "type": "exact", "patterns": ["a.com", "b.com", "c.com"]}
        # degenerate inputs -> no restriction
        assert parse_domain_restriction(None) is None
        assert parse_domain_restriction(42) is None
        assert parse_domain_restriction({"patterns": "not-a-list"}) is None
        assert parse_domain_restriction([1, 2]) is None
        assert parse_domain_restriction([" , "]) is None


class TestValidateDomain:
    def test_exact_hostname_and_normalized_url(self):
        r = {"type": "exact", "patterns": ["example.com",
                                           "https://shop.test/products"]}
        assert validate_domain("https://example.com/any/path", r)["is_valid"]
        assert validate_domain("HTTPS://EXAMPLE.COM/x", r)["is_valid"]
        assert validate_domain("https://shop.test/products", r)["is_valid"]
        # normalized compare keeps the path verbatim: trailing slash differs
        assert not validate_domain("https://shop.test/products/extra",
                                   r)["is_valid"]
        got = validate_domain("https://other.test/", r)
        assert not got["is_valid"] and got["code"] == "DOMAIN_NOT_ALLOWED"

    def test_www_is_not_apex(self):
        # TemplateValidator.test.ts:147-162 — www.example.com != example.com
        r = {"type": "exact", "patterns": ["example.com"]}
        assert not validate_domain("https://www.example.com/", r)["is_valid"]
        r2 = {"type": "exact", "patterns": ["www.example.com"]}
        assert validate_domain("https://www.example.com/", r2)["is_valid"]

    def test_glob_candidate_representations(self):
        # domainValidator.ts:205-213 examples
        url = "https://api.example.com/v1/data?q=test"
        for pattern in ("api.example.com", "*.example.com",
                        "https://api.example.com", "https://*.example.com",
                        "api.example.com/v1/*",
                        "https://api.example.com/v1/*"):
            assert validate_domain(
                url, {"type": "glob", "patterns": [pattern]})["is_valid"], \
                pattern
        assert not validate_domain(
            url, {"type": "glob", "patterns": ["*.other.com"]})["is_valid"]

    def test_invalid_url_and_no_restriction(self):
        assert validate_domain("not a url", None)["is_valid"]
        got = validate_domain("no-scheme.com/x",
                              {"type": "exact", "patterns": ["a.com"]})
        assert not got["is_valid"] and got["code"] == "INVALID_URL"

    def test_normalize_url(self):
        assert normalize_url_for_comparison(
            "HTTPS://Example.COM:443/Path?q=1#frag") \
            == "https://example.com/Path?q=1#frag"
        assert normalize_url_for_comparison(
            "http://a.test:8080/") == "http://a.test:8080/"


class TestValidatePattern:
    def test_keyword_matching(self):
        r = {"type": "exact", "patterns": ["Laptop", "phone"]}
        assert validate_pattern("  laptop ", r)["is_valid"]
        assert not validate_pattern("tablet", r, "keyword")["is_valid"]
        assert "keyword 'tablet'" in validate_pattern("tablet", r,
                                                      "keyword")["error"]
        g = {"type": "glob", "patterns": ["lap*"]}
        assert validate_pattern("LAPTOP", g)["is_valid"]
        assert validate_pattern("anything", None)["is_valid"]


class TestCodeValidator:
    # validator.test.ts cases that match the CURRENT source (the upstream
    # test also expects setTimeout/"Code too long" messages whose patterns
    # the current security constants comment out)
    def test_dangerous_patterns(self):
        cases = [
            ("eval('code')", "eval() is not allowed"),
            ("const f = Function('return 1')",
             "Function constructor is not allowed"),
            ("new Function('x', 'return x')", "Function constructor"),
            ("process.env.SECRET", "process object is not allowed"),
            ("require('fs')", "require() is not allowed"),
            ("fs.readFile('/etc/passwd')", "fs module is not allowed"),
            ("import fs from 'fs'", "import statements are not allowed"),
            ("obj.__proto__ = evil", "__proto__ assignment is not allowed"),
            ("x.constructor.constructor('alert(1)')",
             "constructor chain is not allowed"),
            ("globalThis.leak = 1", "globalThis is not allowed"),
        ]
        for code, fragment in cases:
            got = validate_template_code(code)
            assert not got["is_valid"], code
            assert got["error"].startswith("Security violation: ")
            assert fragment.split(" is ")[0] in got["error"], code

    def test_case_sensitivity_of_function_check(self):
        # /\bFunction\s*\(/ has no i-flag upstream: 'myfunction(' passes,
        # bare 'Function (' fails
        assert validate_template_code("myfunction(1)")["is_valid"]
        assert not validate_template_code("Function (x)")["is_valid"]

    def test_complexity_limits(self):
        deep = "{" * 25 + "}" * 25
        got = validate_template_code(deep)
        assert not got["is_valid"] and "nesting too deep" in got["error"]
        ok_depth = "{" * 20 + "}" * 20
        assert validate_template_code(ok_depth)["is_valid"]
        loopy = "\n".join(f"for (let i{k} = 0; i{k} < 2; i{k}++) doWork();"
                          for k in range(11))
        got2 = validate_template_code(loopy)
        assert not got2["is_valid"] and "Too many loops" in got2["error"]
        assert validate_template_code(
            "\n".join("while (cond) step();" for _ in range(10)))["is_valid"]

    def test_reasonable_code_passes(self):
        code = ("const items = [];\n"
                "for (const el of list) { items.push(el.textContent); }\n"
                "return { items };")
        assert validate_template_code(code)["is_valid"]


class TestTemplateAllowedUdf:
    def test_batch_gate(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("https://docs.test/d/1",), ("https://shop.test/products",),
             ("https://shop.test/products/x",), ("https://blog.test/",)],
            "url string")
        udf = make_template_allowed_udf(
            {"type": "exact", "patterns": ["docs.test",
                                           "https://shop.test/products"]})
        got = {r["url"]: r["ok"]
               for r in df.select("url", udf(F.col("url")).alias("ok")).collect()}
        assert got == {"https://docs.test/d/1": True,
                       "https://shop.test/products": True,
                       "https://shop.test/products/x": False,
                       "https://blog.test/": False}


class TestReviewFixes:
    """Parity/robustness fixes from the template-layer review."""

    def test_trailing_newline_id_rejected(self):
        # Python $ matches before a trailing newline; JS /...$/ does not
        got = validate_template_id("tmpl\n")
        assert not got["is_valid"]
        assert got["code"] == "INVALID_TEMPLATE_ID_FORMAT"

    def test_malformed_urls_return_invalid_url_not_raise(self):
        r = {"type": "exact", "patterns": ["a.com"]}
        for bad in ("https://example.com:99999/x", "https://example.com:abc/",
                    "http://[::1"):
            got = validate_domain(bad, r)
            assert not got["is_valid"] and got["code"] == "INVALID_URL", bad

    def test_udf_survives_malformed_url_rows(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("https://a.com/x",), ("https://example.com:99999/x",)],
            "url string")
        udf = make_template_allowed_udf({"type": "exact",
                                         "patterns": ["a.com"]})
        got = [r["ok"] for r in
               df.select(udf(F.col("url")).alias("ok")).collect()]
        assert got == [True, False]   # bad row fails closed, task survives

    def test_glob_dot_false_semantics(self):
        # minimatch DEFAULT options: '*' refuses a leading dot...
        r = {"type": "glob", "patterns": ["a.test/*/security.txt"]}
        assert not validate_domain("https://a.test/.well-known/security.txt",
                                   r)["is_valid"]
        # ...unless the pattern segment itself starts with a literal dot
        r2 = {"type": "glob", "patterns": ["a.test/.well-known/*"]}
        assert validate_domain("https://a.test/.well-known/security.txt",
                               r2)["is_valid"]
        # hostname wildcards unaffected ('api' has no leading dot)
        r3 = {"type": "glob", "patterns": ["*.example.com"]}
        assert validate_domain("https://api.example.com/", r3)["is_valid"]
        # globstar also refuses dot segments at dot:false
        r4 = {"type": "glob", "patterns": ["a.test/**/leaf"]}
        assert not validate_domain("https://a.test/.hidden/leaf",
                                   r4)["is_valid"]
        assert validate_domain("https://a.test/pub/leaf", r4)["is_valid"]

    def test_dot_segment_resolution_and_idn(self):
        r = {"type": "exact", "patterns": ["https://example.com/a/b"]}
        assert validate_domain("https://example.com/a/./b", r)["is_valid"]
        assert validate_domain("https://example.com/a/x/../b", r)["is_valid"]
        # JS URL punycodes unicode hosts; patterns are written punycoded
        r2 = {"type": "exact", "patterns": ["xn--bcher-kva.test"]}
        assert validate_domain("https://bücher.test/", r2)["is_valid"]

    def test_explicit_null_type_fails_closed(self):
        parsed = parse_domain_restriction({"type": None,
                                           "patterns": ["evil.com"]})
        assert parsed == {"type": None, "patterns": ["evil.com"]}
        # null type matches neither branch -> everything rejected
        assert not validate_domain("https://evil.com/", parsed)["is_valid"]
        # absent type still defaults to exact
        assert parse_domain_restriction(
            {"patterns": ["a.com"]})["type"] == "exact"

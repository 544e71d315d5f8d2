"""Template merge + render pipeline (templateHandler.ts / optionMerger.ts /
urlTemplate.ts parity) — pure-kernel cases; the Spark operator is oracled
via operators/queries.py::template_render."""

import math

import pytest

from anycrawl_spark.template_handler import (
    MISSING,
    TemplateExecutionError,
    apply_transform,
    apply_variable_defaults,
    deep_merge_options_with_template,
    get_nested_value,
    has_template_access,
    map_variables_to_request_data,
    merge_options_with_template,
    merge_request_with_template,
    process_request,
    render_text_template,
    render_url_template,
    resolve_price,
    set_nested_value,
    to_string_value,
    validate_variables,
)


class TestRender:
    def test_basic_substitution(self):
        assert render_url_template(
            "https://x.test/{{id}}", {"id": 42}) == "https://x.test/42"

    def test_query_filter_encodes(self):
        assert render_url_template(
            "https://x.test/?q={{q|query}}",
            {"q": "a b&c/d"}) == "https://x.test/?q=a%20b%26c%2Fd"

    def test_path_filter_keeps_slashes(self):
        assert render_url_template(
            "https://x.test/{{p|path}}",
            {"p": "a b/c d"}) == "https://x.test/a%20b/c%20d"

    def test_host_filter_lowercases_and_strips(self):
        assert render_url_template(
            "https://{{h|host}}/", {"h": "EX_ample#1.COM"}
        ) == "https://example1.com/"

    def test_missing_variable_keeps_placeholder(self):
        assert render_url_template(
            "https://x.test/{{nope}}", {"id": 1}) == "https://x.test/{{nope}}"

    def test_null_variable_renders_empty(self):
        # getByPath returns null (not undefined) -> toStringValue("")
        assert render_url_template(
            "https://x.test/{{id}}", {"id": None}) == "https://x.test/"

    def test_escaped_placeholder_left_verbatim(self):
        assert render_url_template(
            r"https://x.test/\{{id}}", {"id": 1}) == "https://x.test/{{id}}"

    def test_dotted_path(self):
        assert render_url_template(
            "{{a.b.c}}", {"a": {"b": {"c": "v"}}}) == "v"

    def test_whitespace_and_filter_spacing(self):
        assert render_url_template(
            "{{ q | query }}", {"q": "a b"}) == "a%20b"

    def test_text_template_filters_raw(self):
        # SearchController: filters degrade to raw for query rendering
        assert render_text_template(
            "site:x {{q|query}}", {"q": "a b"}) == "site:x a b"

    def test_bool_number_object_stringify(self):
        assert to_string_value(True) == "true"
        assert to_string_value(1.5) == "1.5"
        assert to_string_value(3.0) == "3"
        assert to_string_value({"a": [1, True]}) == '{"a":[1,true]}'
        assert to_string_value(None) == ""

    def test_no_variables_keeps_template(self):
        assert render_url_template("https://x/{{id}}", None) \
            == "https://x/{{id}}"

    def test_js_length_quirk(self):
        assert render_url_template("{{q.length}}", {"q": "abcd"}) == "4"


class TestMerge:
    def test_shallow_request_wins(self):
        assert merge_options_with_template(
            {"engine": "cheerio", "timeout": 30},
            {"timeout": 60}) == {"engine": "cheerio", "timeout": 60}

    def test_shallow_null_skipped(self):
        assert merge_options_with_template(
            {"engine": "cheerio"}, {"engine": None}) == {"engine": "cheerio"}

    def test_deep_merges_nested_objects(self):
        merged = deep_merge_options_with_template(
            {"opts": {"a": 1}}, {"opts": {"a": 0, "b": 2}, "x": 9})
        assert merged == {"opts": {"a": 1, "b": 2}, "x": 9}

    def test_deep_arrays_replace(self):
        assert deep_merge_options_with_template(
            {"formats": ["text"]},
            {"formats": ["markdown", "html"]}) == {"formats": ["text"]}


class TestVariables:
    DEFS = {
        "region": {"type": "enum", "required": True,
                   "values": ["us", "eu"]},
        "limit": {"type": "number", "defaultValue": 10},
        "site": {"type": "url"},
        "deep": {"type": "string",
                 "mapping": {"target": "scrape_options.country"}},
    }

    def test_required_missing(self):
        errs = validate_variables(self.DEFS, {}, {})
        assert errs == ["Required variable 'region' is missing"]

    def test_required_satisfied_by_mapped_target(self):
        defs = {"c": {"type": "string", "required": True,
                      "mapping": {"target": "scrape_options.country"}}}
        assert validate_variables(
            defs, {}, {"scrape_options": {"country": "de"}}) == []

    def test_type_errors(self):
        errs = validate_variables(
            self.DEFS,
            {"region": "us", "limit": "ten", "site": "not a url"}, {})
        assert "Variable 'limit' must be a finite number, got string" in errs
        assert "Variable 'site' must be a valid URL" in errs

    def test_number_rejects_boolean_and_nan(self):
        defs = {"n": {"type": "number"}}
        assert validate_variables(defs, {"n": True}, {}) == [
            "Variable 'n' must be a finite number, got boolean"]
        assert validate_variables(defs, {"n": math.nan}, {}) != []
        assert validate_variables(defs, {"n": 1.0}, {}) == []

    def test_enum_strict_equality(self):
        defs = {"e": {"type": "enum", "values": [1, "a"]}}
        assert validate_variables(defs, {"e": 1.0}, {}) == []   # 1 === 1.0
        assert validate_variables(defs, {"e": True}, {}) != []  # true !== 1

    def test_enum_options_fallback(self):
        defs = {"e": {"type": "enum",
                      "options": [{"value": "x"}, {"label": "no value"}]}}
        assert validate_variables(defs, {"e": "x"}, {}) == []
        assert validate_variables(defs, {"e": "y"}, {}) == [
            "Variable 'e' must be one of [\"x\"], got \"y\""]

    def test_unknown_variable(self):
        assert validate_variables(self.DEFS, {"region": "us", "zz": 1},
                                  {}) == [
            "Unknown variable 'zz' not defined in template"]

    def test_defaults_three_way(self):
        defs = {"limit": {"defaultValue": 10}}
        # provided non-empty: merged
        assert apply_variable_defaults(defs, {"q": "x"}) \
            == {"q": "x", "limit": 10}
        # nothing provided, default applied: merged
        assert apply_variable_defaults(defs, MISSING) == {"limit": 10}
        # no defaults to apply: provided returned unchanged (even MISSING)
        assert apply_variable_defaults({"q": {}}, MISSING) is MISSING
        assert apply_variable_defaults({"q": {}}, None) is None
        # null value gets the default, explicit value does not
        assert apply_variable_defaults(defs, {"limit": None}) \
            == {"limit": 10}
        assert apply_variable_defaults(defs, {"limit": 5}) == {"limit": 5}

    def test_mapping_precedence_explicit_param_wins(self):
        template = {"variables": self.DEFS}
        out = map_variables_to_request_data(
            {"deep": "fr"}, template,
            {"scrape_options": {"country": "de"}})
        assert out["scrape_options"]["country"] == "de"
        out = map_variables_to_request_data(
            {"deep": "fr"}, template, {"scrape_options": {}})
        assert out["scrape_options"]["country"] == "fr"

    def test_set_nested_empty_segment_quirk(self):
        # setNestedValue('a..b') writes a.b, getNestedValue('a..b') is
        # undefined — reference quirk kept (templateHandler.ts:587,607)
        d = {}
        set_nested_value(d, "a..b", 1)
        assert d == {"a": {"b": 1}}
        assert get_nested_value(d, "a..b") is MISSING

    def test_set_nested_overwrites_non_object_hop(self):
        d = {"a": 3}
        set_nested_value(d, "a.b", 1)
        assert d == {"a": {"b": 1}}


class TestTransform:
    def test_disabled_passthrough(self):
        assert apply_transform("v", None, "url") == "v"
        assert apply_transform("v", {"enabled": False, "mode": "append",
                                     "prefix": "p"}, "url") == "v"

    def test_append(self):
        assert apply_transform(
            "q", {"enabled": True, "mode": "append", "prefix": "site:x ",
                  "suffix": " news"}, "query") == "site:x q news"

    def test_append_both_empty_skips(self):
        assert apply_transform(
            "q", {"enabled": True, "mode": "append"}, "query") == "q"

    def test_template_mode(self):
        assert apply_transform(
            "https://t.co/u", {"enabled": True, "mode": "template",
                               "template": "https://mirror/?u={{url}}"},
            "url") == "https://mirror/?u=https://t.co/u"

    def test_template_mode_without_template_returns_subject(self):
        assert apply_transform(
            "v", {"enabled": True, "mode": "template"}, "url") == "v"

    def test_template_mode_dollar_semantics(self):
        # JS String.replace: $& in the replacement = the matched {{url}}
        assert apply_transform(
            "a$&b", {"enabled": True, "mode": "template",
                     "template": "<{{url}}>"}, "url") == "<a{{url}}b>"
        assert apply_transform(
            "c$$d", {"enabled": True, "mode": "template",
                     "template": "<{{url}}>"}, "url") == "<c$d>"

    def test_regex_extract_group(self):
        t = {"enabled": True, "mode": "append", "prefix": "@",
             "regexExtract": {
                 "pattern": r"^https?://www\.tiktok\.com/@([^/?#]+)",
                 "flags": "i", "group": 1}}
        assert apply_transform(
            "https://WWW.TIKTOK.COM/@user1/video/9", t, "url") == "@user1"

    def test_regex_extract_global_flag_returns_full_matches(self):
        # /g: String.match returns full-match array; group indexes MATCHES
        t = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": r"\d+", "flags": "g", "group": 1}}
        assert apply_transform("a1b22c333", t, "url") == "22!"

    def test_regex_extract_out_of_range_group_falls_back(self):
        t = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": r"(x)?(\d+)", "group": 9}}
        assert apply_transform("ab123", t, "url") == "123!"

    def test_regex_extract_unmatched_group_falls_back_to_full(self):
        t = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": r"(x)?(\d+)", "group": 1}}
        # group 1 did not participate -> undefined -> ?? match[0]
        assert apply_transform("ab123", t, "url") == "123!"

    def test_regex_extract_no_match_keeps_subject(self):
        t = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": r"zzz"}}
        assert apply_transform("ab123", t, "url") == "ab123!"

    def test_regex_extract_invalid_pattern_ignored(self):
        t = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": "("}}
        assert apply_transform("ab", t, "url") == "ab!"

    def test_regex_extract_trim_default_on(self):
        t = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": r"\s+\w+\s+"}}
        assert apply_transform("a b c", t, "url") == "b!"
        t["regexExtract"]["trim"] = False
        assert apply_transform("a b c", t, "url") == " b !"

    def test_unknown_mode_passthrough(self):
        assert apply_transform(
            "v", {"enabled": True, "mode": "replace"}, "url") == "v"


def _template(**overrides):
    base = {
        "templateId": "amazon-product",
        "templateType": "scrape",
        "createdBy": "u1",
        "pricing": {"perCall": 3, "currency": "credits"},
        "reqOptions": {"engine": "cheerio",
                       "options": {"formats": ["markdown"]},
                       "timeout": 30000},
        "metadata": {},
        "variables": {
            "asin": {"type": "string", "required": True},
            "country": {"type": "string", "defaultValue": "us",
                        "mapping": {"target": "scrape_options.country"}},
        },
    }
    base.update(overrides)
    return base


class TestPipeline:
    def test_access_rules(self):
        t = _template()
        assert has_template_access(t, None) is True          # self-hosted
        assert has_template_access(t, "u1") is True          # owner
        assert has_template_access(t, "u2") is False         # unpublished
        t.update(status="published", reviewStatus="approved")
        assert has_template_access(t, "u2") is True

    def test_resolve_price(self):
        assert resolve_price(_template()) == 3
        assert resolve_price(_template(pricing={"perCall": 0,
                                                "currency": "credits"})) == 0
        assert resolve_price(_template(
            pricing={"perCall": 2, "currency": "usd"})) == 0
        assert resolve_price(_template(pricing=None)) == 0

    def test_no_template_id_passthrough(self):
        req = {"url": "https://a.test/", "engine": "playwright"}
        assert merge_request_with_template(req, None, "scrape") == req

    def test_full_merge_precedence(self):
        req = {"template_id": "amazon-product",
               "url": "https://a.test/dp/{{asin}}",
               "timeout": 5000,
               "variables": {"asin": "B00X"}}
        out = merge_request_with_template(req, _template(), "scrape", "u1")
        assert out["engine"] == "cheerio"          # from template
        assert out["timeout"] == 5000              # request wins
        assert out["scrape_options"]["country"] == "us"   # default mapped
        assert out["variables"] == {"asin": "B00X", "country": "us"}
        assert out["template"]["templateId"] == "amazon-product"

    def test_required_variable_missing_raises(self):
        req = {"template_id": "amazon-product", "url": "https://a.test/"}
        with pytest.raises(TemplateExecutionError,
                           match="Required variable 'asin' is missing"):
            merge_request_with_template(req, _template(), "scrape")

    def test_type_mismatch_raises(self):
        req = {"template_id": "amazon-product", "url": "https://a.test/",
               "variables": {"asin": "B00X"}}
        with pytest.raises(TemplateExecutionError,
                           match="Template type mismatch"):
            merge_request_with_template(req, _template(), "crawl")

    def test_access_denied_raises(self):
        req = {"template_id": "amazon-product", "url": "https://a.test/",
               "variables": {"asin": "B00X"}}
        with pytest.raises(TemplateExecutionError, match="Access denied"):
            merge_request_with_template(req, _template(), "scrape", "u2")

    def test_domain_restriction_enforced(self):
        t = _template(metadata={"allowedDomains": {
            "type": "exact", "patterns": ["a.test"]}})
        ok = {"template_id": "amazon-product", "url": "https://a.test/x",
              "variables": {"asin": "B00X"}}
        merge_request_with_template(ok, t, "scrape")
        bad = dict(ok, url="https://evil.test/x")
        with pytest.raises(TemplateExecutionError):
            merge_request_with_template(bad, t, "scrape")

    def test_url_transform_sets_original_url_even_when_disabled(self):
        t = _template(customHandlers={"urlTransform": {
            "enabled": False, "mode": "append", "prefix": "x"}})
        req = {"template_id": "amazon-product", "url": "https://a.test/",
               "variables": {"asin": "B00X"}}
        out = merge_request_with_template(req, t, "scrape")
        assert out["original_url"] == "https://a.test/"
        assert out["url"] == "https://a.test/"

    def test_search_drops_url_and_transforms_query(self):
        t = _template(templateType="search",
                      reqOptions={"engine": "google"},
                      variables=None,
                      customHandlers={"queryTransform": {
                          "enabled": True, "mode": "template",
                          "template": "site:a.test {{query}}"}})
        req = {"template_id": "amazon-product", "url": "https://x/",
               "query": "shoes"}
        out = merge_request_with_template(req, t, "search")
        assert "url" not in out
        assert out["query"] == "site:a.test shoes"

    def test_search_keyword_restriction(self):
        t = _template(templateType="search", reqOptions={"engine": "google"},
                      variables=None,
                      metadata={"allowedKeywords": {
                          "type": "glob", "patterns": ["shoes*"]}})
        req = {"template_id": "amazon-product", "query": "boots"}
        with pytest.raises(TemplateExecutionError):
            merge_request_with_template(req, t, "search")
        merge_request_with_template(dict(req, query="shoes red"), t,
                                    "search")

    def test_null_request_field_keeps_template_value(self):
        # null is skipped by the shallow merge; the template value then
        # wins through the {...mergedData, ...mergedTemplateData} spread
        req = {"template_id": "amazon-product", "url": "https://a.test/",
               "engine": None, "variables": {"asin": "B00X"}}
        out = merge_request_with_template(req, _template(), "scrape")
        assert out["engine"] == "cheerio"

    def test_process_request_renders_url_with_variables(self):
        req = {"template_id": "amazon-product",
               "url": "https://a.test/dp/{{asin}}?loc={{country|query}}",
               "variables": {"asin": "B0 0X"}}
        out = process_request(req, _template(), "scrape", "u1")
        assert out["url"] == "https://a.test/dp/B0 0X?loc=us"
        assert "template" not in out

    def test_process_request_search_renders_query_raw(self):
        t = _template(templateType="search", reqOptions={"engine": "google"},
                      variables={"q": {"type": "string",
                                       "defaultValue": "a b"}})
        req = {"template_id": "amazon-product", "query": "find {{q|query}}"}
        out = process_request(req, t, "search")
        assert out["query"] == "find a b"


class TestJsNumberToString:
    def test_v8_reference_values(self):
        from anycrawl_spark.template_handler import js_number_to_string as f

        # values cross-checked against V8 String(x)
        cases = [
            (0.000001, "0.000001"), (1e-7, "1e-7"), (1.5, "1.5"),
            (3.0, "3"), (1e21, "1e+21"), (1.2e21, "1.2e+21"),
            (123456789012345680000.0, "123456789012345680000"),
            (-0.0, "0"), (0.1, "0.1"), (1e-5, "0.00001"),
            (2.5e-7, "2.5e-7"), (1234.5678, "1234.5678"), (-42.0, "-42"),
            (9007199254740993.0, "9007199254740992"),
            (1.7976931348623157e+308, "1.7976931348623157e+308"),
            (5e-324, "5e-324"), (100.0, "100"), (True, "true"), (7, "7"),
        ]
        assert [(x, f(x)) for x, want in cases] \
            == [(x, want) for x, want in cases]

    def test_render_uses_js_notation(self):
        assert render_url_template("{{n}}", {"n": 1e-7}) == "1e-7"
        assert render_url_template("{{n}}", {"n": 0.000001}) == "0.000001"

    def test_roundtrip_property(self):
        from hypothesis import given, strategies as st

        from anycrawl_spark.template_handler import js_number_to_string as f

        @given(st.floats(allow_nan=False, allow_infinity=False))
        def roundtrip(x):
            # shortest-roundtrip digits: parsing the JS rendering must
            # recover the exact double
            assert float(f(x)) == x

        roundtrip()

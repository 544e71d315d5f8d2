

class TestEmailDigest:
    """EmailNotifier.ts:48-133 content assembly (SMTP transport = seam)."""

    MON = {"name": "Shop <Price>", "monitorType": "price"}
    CHANGES = [
        {"url": "https://shop.test/p?a=1&b=2", "changeType": "price_down",
         "judgment": {"meaningful": True, "confidence": "high",
                      "reason": "price dropped"},
         "diffJson": [
             {"path": "price", "from": 10, "to": 7.5, "delta": -2.5},
             {"path": "stock.label", "from": "In stock", "to": None},
         ],
         "diffText": "- 10\n+ 7.5"},
        {"url": "https://shop.test/q", "changeType": "content"},
    ]

    def test_subject_plural(self):
        from anycrawl_spark.monitor import email_subject
        assert email_subject("M", 1) == \
            "[AnyCrawl Monitor] M — 1 change detected"
        assert email_subject("M", 3) == \
            "[AnyCrawl Monitor] M — 3 changes detected"

    def test_text_digest(self):
        from anycrawl_spark.monitor import build_email_text
        txt = build_email_text(self.MON, self.CHANGES)
        assert txt.splitlines()[0] == "Monitor: Shop <Price> (price)"
        assert "Changes detected: 2" in txt
        assert "AI assessment: meaningful (high confidence) — price dropped" \
            in txt
        assert "  price: 10 → 7.5 (-2.5)" in txt
        assert "  stock.label: \"In stock\" → null" in txt
        assert "Diff (first 500 chars):" in txt
        assert txt.endswith("\n")  # trailing blank line per change

    def test_text_truncations_and_undefined(self):
        from anycrawl_spark.monitor import build_email_text
        changes = [{
            "url": "u", "changeType": "json",
            "diffJson": [{"path": f"f{i}", "from": i, "to": i + 1,
                          "delta": 1} for i in range(15)],
            "diffText": "x" * 900,
        }]
        txt = build_email_text(self.MON, changes)
        assert "f9: 9 → 10 (+1)" in txt and "f10:" not in txt  # slice(0,10)
        assert "x" * 500 in txt and "x" * 501 not in txt
        # missing from/to render as the string 'undefined'
        txt = build_email_text(self.MON, [{
            "url": "u", "changeType": "json",
            "diffJson": [{"path": "p"}]}])
        assert "  p: undefined → undefined" in txt

    def test_html_digest(self):
        from anycrawl_spark.monitor import build_email_html
        html = build_email_html(self.MON, self.CHANGES)
        assert "<h2>🔔 AnyCrawl Monitor — Shop &lt;Price&gt;</h2>" in html
        assert "<strong>Changes:</strong> 2" in html
        assert "✅ Meaningful" in html
        assert '<span style="color:green">(-2.5)</span>' in html
        assert "&quot;In stock&quot;" in html
        assert "https://shop.test/p?a=1&amp;b=2" in html
        # second change has no table/judgment/diff blocks
        assert html.count("<table") == 1
        # positive delta is red with a + sign
        html2 = build_email_html(self.MON, [{
            "url": "u", "changeType": "price_up",
            "diffJson": [{"path": "p", "from": 1, "to": 2, "delta": 1}]}])
        assert '<span style="color:red">(+1)</span>' in html2
        # html diff truncates at 2000
        html3 = build_email_html(self.MON, [{
            "url": "u", "changeType": "content", "diffText": "y" * 2500}])
        assert "y" * 2000 in html3 and "y" * 2001 not in html3


class TestBuildTaskPayload:
    """MonitorController.buildTaskPayload (MonitorController.ts:32-57)."""

    def test_text_mode_formats(self):
        from anycrawl_spark.monitor import build_task_payload
        p = build_task_payload({"url": "https://x"}, "page", "text",
                               {"type": "object"}, "goal", None)
        assert p["options"]["formats"] == ["markdown"]
        # text mode never gets json_options even with a schema
        assert "json_options" not in p["options"]
        assert p["engine"] == "auto"

    def test_json_mode_schema_and_goal(self):
        from anycrawl_spark.monitor import build_task_payload
        p = build_task_payload({"url": "https://x", "engine": "cheerio"},
                               "api", "json", {"type": "object"},
                               "watch price", {"only_main_content": False})
        assert p["options"]["formats"] == ["markdown", "json"]
        assert p["options"]["only_main_content"] is False
        assert p["options"]["json_options"] == {
            "schema": {"type": "object"}, "user_prompt": "watch price"}
        assert p["engine"] == "cheerio"

    def test_goal_falsy_omitted(self):
        from anycrawl_spark.monitor import build_task_payload
        p = build_task_payload({"url": "u"}, "page", "mixed",
                               {"a": 1}, "", None)
        assert p["options"]["json_options"] == {"schema": {"a": 1}}

    def test_schema_falsy_no_json_options(self):
        from anycrawl_spark.monitor import build_task_payload
        p = build_task_payload({"url": "u"}, "page", "json", None, "g", None)
        assert "json_options" not in p["options"]

    def test_target_options_spread_overrides(self):
        # ...target.options comes AFTER the computed fields in the literal
        from anycrawl_spark.monitor import build_task_payload
        p = build_task_payload(
            {"url": "u", "options": {"formats": ["html"],
                                     "only_main_content": False,
                                     "timeout": 5}},
            "page", "text", None, None, {"only_main_content": True})
        assert p["options"]["formats"] == ["html"]
        assert p["options"]["only_main_content"] is False
        assert p["options"]["timeout"] == 5

    def test_engine_nullish_not_falsy(self):
        from anycrawl_spark.monitor import build_task_payload
        assert build_task_payload({"url": "u", "engine": ""},
                                  "p", "text", None, None, None)["engine"] == ""

    def test_empty_schema_object_truthy(self):
        # {} is truthy in JS — json_options appears with the empty schema
        from anycrawl_spark.monitor import build_task_payload
        p = build_task_payload({"url": "u"}, "page", "json", {}, None, None)
        assert p["options"]["json_options"] == {"schema": {}}

"""Markdown conversion contract tests.

Every case is ported from the reference's own test suite
(``/root/reference/packages/libs/src/__tests__/html-to-markdown.test.ts``,
345 lines, ~45 cases) — the observable contract our kernel must satisfy
(SURVEY.md §5.1).
"""

import re

import pytest

from anycrawl_spark.kernel.markdown import html_to_markdown


class TestBasicConversion:
    def test_headings(self):
        html = """
            <h1>Heading 1</h1>
            <h2>Heading 2</h2>
            <h3>Heading 3</h3>
            <h4>Heading 4</h4>
            <h5>Heading 5</h5>
            <h6>Heading 6</h6>
        """
        result = html_to_markdown(html)
        for level in range(1, 7):
            assert f"{'#' * level} Heading {level}" in result

    def test_paragraphs(self):
        result = html_to_markdown("<p>This is a paragraph.</p><p>This is another paragraph.</p>")
        assert "This is a paragraph." in result
        assert "This is another paragraph." in result

    def test_bold(self):
        result = html_to_markdown("<p>This is <strong>bold</strong> and <b>also bold</b>.</p>")
        assert "**bold**" in result
        assert "**also bold**" in result

    def test_italic(self):
        result = html_to_markdown("<p>This is <em>italic</em> and <i>also italic</i>.</p>")
        assert "*italic*" in result
        assert "*also italic*" in result

    def test_links(self):
        result = html_to_markdown('<a href="https://example.com">Example Link</a>')
        assert "[Example Link](https://example.com)" in result

    def test_links_with_title(self):
        result = html_to_markdown(
            '<a href="https://example.com" title="Example Title">Example Link</a>'
        )
        assert '[Example Link](https://example.com "Example Title")' in result

    def test_images(self):
        result = html_to_markdown('<img src="https://example.com/image.jpg" alt="Example Image">')
        assert "![Example Image](https://example.com/image.jpg)" in result

    def test_images_with_title(self):
        result = html_to_markdown(
            '<img src="https://example.com/image.jpg" alt="Example Image" title="Image Title">'
        )
        assert '![Example Image](https://example.com/image.jpg "Image Title")' in result

    def test_skip_svg_data_uris(self):
        result = html_to_markdown('<img src="data:image/svg+xml;base64,..." alt="SVG">')
        assert "![SVG]" not in result

    def test_unordered_lists(self):
        result = html_to_markdown("<ul><li>Item 1</li><li>Item 2</li><li>Item 3</li></ul>")
        assert re.search(r"[-*]\s+Item 1", result)
        assert re.search(r"[-*]\s+Item 2", result)
        assert re.search(r"[-*]\s+Item 3", result)

    def test_ordered_lists(self):
        result = html_to_markdown("<ol><li>First</li><li>Second</li><li>Third</li></ol>")
        assert re.search(r"1\.\s+First", result)
        assert re.search(r"2\.\s+Second", result)
        assert re.search(r"3\.\s+Third", result)

    def test_line_breaks(self):
        result = html_to_markdown("Line 1<br>Line 2<br>Line 3")
        assert "Line 1\nLine 2\nLine 3" in result


class TestCodeBlocks:
    def test_language_class(self):
        html = '<pre><code class="language-javascript">const x = 1;\nconst y = 2;</code></pre>'
        result = html_to_markdown(html)
        assert "```javascript" in result
        assert "const x = 1;" in result
        assert "const y = 2;" in result
        assert "```" in result

    def test_lang_class(self):
        html = '<pre><code class="lang-python">def hello():\n    print("Hello")</code></pre>'
        result = html_to_markdown(html)
        assert "```python" in result
        assert "def hello():" in result
        assert 'print("Hello")' in result

    def test_no_language(self):
        result = html_to_markdown("<pre><code>plain code\nmore code</code></pre>")
        assert "```\nplain code\nmore code\n```" in result

    def test_remove_line_numbers(self):
        html = "<pre><code>1 const x = 1;\n2 const y = 2;\n3 const z = 3;</code></pre>"
        result = html_to_markdown(html)
        assert not re.search(r"^\d+\s+const", result, re.M)
        assert "const x = 1;" in result
        assert "const y = 2;" in result

    def test_inline_code(self):
        result = html_to_markdown("<p>Use the <code>console.log()</code> function.</p>")
        assert "`console.log()`" in result

    def test_preserve_code_content(self):
        html = '<pre><code class="language-html">&lt;div&gt;Hello&lt;/div&gt;</code></pre>'
        result = html_to_markdown(html)
        assert "```html" in result
        assert "<div>Hello</div>" in result


class TestGFM:
    def test_tables(self):
        html = """
            <table>
                <thead>
                    <tr><th>Header 1</th><th>Header 2</th></tr>
                </thead>
                <tbody>
                    <tr><td>Cell 1</td><td>Cell 2</td></tr>
                    <tr><td>Cell 3</td><td>Cell 4</td></tr>
                </tbody>
            </table>
        """
        result = html_to_markdown(html)
        assert "Header 1" in result
        assert "Header 2" in result
        assert "Cell 1" in result
        assert "Cell 2" in result
        assert "|" in result

    def test_strikethrough(self):
        result = html_to_markdown("<p>This is <del>deleted</del> text.</p>")
        assert re.search(r"~deleted~", result)

    def test_task_lists(self):
        html = """
            <ul>
                <li><input type="checkbox" checked> Completed task</li>
                <li><input type="checkbox"> Incomplete task</li>
            </ul>
        """
        result = html_to_markdown(html)
        assert re.search(r"\[x\]\s+Completed task", result, re.I)
        assert re.search(r"\[\s*\]\s+Incomplete task", result, re.I)


class TestPostProcessing:
    def test_normalize_blank_lines(self):
        result = html_to_markdown("<p>Paragraph 1</p><br><br><br><br><p>Paragraph 2</p>")
        assert not re.search(r"\n{3,}", result)

    def test_remove_skip_to_content(self):
        result = html_to_markdown('<a href="#main">Skip to Content</a><p>Main content here</p>')
        assert "Skip to Content" not in result
        assert "Main content here" in result

    def test_remove_skip_to_main(self):
        result = html_to_markdown('<a href="#main">Skip to main</a><p>Content</p>')
        assert "Skip to main" not in result

    def test_clean_link_text_whitespace(self):
        result = html_to_markdown('<a href="https://example.com">Link   with   spaces</a>')
        assert "[Link with spaces](https://example.com)" in result

    def test_blank_lines_around_images(self):
        html = '<p>Text before</p><img src="image.jpg" alt="Image"><p>Text after</p>'
        result = html_to_markdown(html)
        assert re.search(r"Text before\n\n!\[Image\]\(image\.jpg\)\n\nText after", result)

    def test_url_as_text_for_empty_links(self):
        result = html_to_markdown('<a href="https://example.com"></a>')
        assert "[https://example.com](https://example.com)" in result


class TestEdgeCases:
    def test_empty_html(self):
        assert html_to_markdown("") == ""

    def test_whitespace_only(self):
        assert html_to_markdown("   \n\n   ") == ""

    def test_nested_lists(self):
        html = """
            <ul>
                <li>Item 1
                    <ul>
                        <li>Nested 1</li>
                        <li>Nested 2</li>
                    </ul>
                </li>
                <li>Item 2</li>
            </ul>
        """
        result = html_to_markdown(html)
        for s in ("Item 1", "Nested 1", "Nested 2", "Item 2"):
            assert s in result

    def test_links_with_images(self):
        result = html_to_markdown('<a href="https://example.com"><img src="image.jpg" alt="Image"></a>')
        assert "![Image](image.jpg)" in result
        assert "https://example.com" in result

    def test_special_characters(self):
        result = html_to_markdown("<p>Special chars: &lt; &gt; &amp; &quot;</p>")
        assert '< > & "' in result

    def test_remove_script(self):
        result = html_to_markdown('<script>alert("XSS")</script><p>Content</p>')
        assert "alert" not in result
        assert "Content" in result

    def test_remove_style(self):
        result = html_to_markdown("<style>body { color: red; }</style><p>Content</p>")
        assert "color: red" not in result
        assert "Content" in result

    def test_blockquote(self):
        result = html_to_markdown("<blockquote>This is a quote</blockquote>")
        assert "> This is a quote" in result

    def test_hr(self):
        result = html_to_markdown("<p>Before</p><hr><p>After</p>")
        assert "---" in result
        assert "Before" in result
        assert "After" in result

    def test_figure_figcaption(self):
        html = """
            <figure>
                <img src="image.jpg" alt="Image">
                <figcaption>Image caption</figcaption>
            </figure>
        """
        result = html_to_markdown(html)
        assert "![Image](image.jpg)" in result
        assert "Image caption" in result


class TestRegression:
    def test_paragraph_spacing(self):
        result = html_to_markdown("<p>Paragraph 1</p><p>Paragraph 2</p>")
        assert re.search(r"Paragraph 1\n\nParagraph 2", result)

    def test_div_handling(self):
        result = html_to_markdown("<div>Content in div</div>")
        assert "Content in div" in result

    def test_span_handling(self):
        result = html_to_markdown("<p>Text with <span>span content</span> inside</p>")
        assert re.search(r"Text with\s+span content\s+inside", result)

    def test_linked_images(self):
        result = html_to_markdown('<a href="https://example.com"><img src="image.jpg" alt="Image"></a>')
        assert "![Image](image.jpg)" in result


class TestGfmKeep:
    def test_table_without_heading_row_kept_raw(self):
        # turndown-plugin-gfm keep(): no-thead tables survive as raw HTML
        html = "<table><tbody><tr><td>a</td><td>b</td></tr></tbody></table>"
        result = html_to_markdown(html)
        assert "<table>" in result and "<td>a</td>" in result

    def test_table_with_heading_row_converted(self):
        html = ("<table><thead><tr><th>H</th></tr></thead>"
                "<tbody><tr><td>x</td></tr></tbody></table>")
        result = html_to_markdown(html)
        assert "<table>" not in result
        assert "| H |" in result and "| x |" in result

"""DOM-backend protocol: the seam where a C-backed HTML parser drops in.

The extraction kernel (transformer/markdown/text/ocr) never parses HTML
itself — it consumes the node model built by ``dom.parse_html``, which
dispatches through this registry. A backend is any callable

    parse(html: str) -> dom.Element        # the synthetic #root element

that produces a tree honoring the node contract below. Two backends ship
(``fast``, the flat regex tokenizer, and ``stdlib``, html.parser); a
C-backed parser (lxml / selectolax, absent from this sandbox) registers
here at deployment and every kernel stage picks it up unchanged — the
conformance suite (tests/test_kernel.py::TestBackendConformance) is what
guarantees that swap is parity-safe.

## Node contract

The kernel walks rely on exactly this surface (anything else in dom.py is
kernel-internal):

- ``Element``: ``tag`` (lowercase str), ``attrs`` (dict, lowercase keys,
  first occurrence wins, valueless attrs -> ""), ``children`` (list of
  nodes in document order), ``parent``; methods ``append``,
  ``remove_child``, ``detach``, ``get``, ``text_content``,
  ``element_children``, ``iter`` (pre-order descendants).
- ``Text``: ``data`` (entity-decoded), ``parent``.
- ``Comment``: ``data``, ``parent`` (retained in the tree; serialization
  and text render skip it).
- Root: a synthetic ``Element('#root')`` wrapping the document.

## Tree-building semantics every backend must reproduce

(asserted by the conformance suite over fixture pages + malformed edges)

- void elements never take children; ``<p>`` implicit close set
  (``_P_CLOSERS``), sibling implicit closes (li/dt/dd/tr/td/th/...)
- htmlparser2-style tolerance: stray ``</br>`` emits ``<br>``, unmatched
  ``</p>`` synthesizes an empty ``<p>``, implicit closes cascade,
  tolerant end-tag forms (``</b extra>``), depth cap at MAX_TREE_DEPTH
- rawtext elements (script/style) swallow markup until their end tag
- entity decoding in text and attribute values, &-tolerant
"""

from __future__ import annotations

from typing import Callable

# Populated by dom.py at import (fast/stdlib) and by optional adapters
# below; parse_html consults this registry.
BACKENDS: dict[str, Callable[[str], "object"]] = {}


def register_backend(name: str, parse: Callable[[str], "object"]) -> None:
    BACKENDS[name] = parse


def available_backends() -> list[str]:
    # import for side effect: dom registers fast/stdlib on import
    from anycrawl_spark.kernel import dom  # noqa: F401

    return sorted(BACKENDS)


def _try_register_lxml() -> None:
    """Adapter for lxml's C parser — registers only when lxml is importable
    (not in this sandbox; the adapter IS the documented drop-in path and is
    conformance-tested wherever lxml exists)."""
    try:
        from lxml import etree  # noqa: F401
    except Exception:  # pragma: no cover - lxml absent in sandbox
        return

    from anycrawl_spark.kernel import dom

    def parse_lxml(html: str):  # pragma: no cover - lxml absent in sandbox
        from lxml import html as lhtml

        root = dom.Element("#root")

        def convert(lx, parent):
            el = dom.Element(lx.tag if isinstance(lx.tag, str) else "#comment")
            if not isinstance(lx.tag, str):
                node = dom.Comment(lx.text or "")
                parent.append(node)
                if lx.tail:
                    parent.append(dom.Text(lx.tail))
                return
            el.attrs = {k.lower(): v for k, v in lx.attrib.items()}
            parent.append(el)
            if lx.text:
                el.append(dom.Text(lx.text))
            for child in lx:
                convert(child, el)
            if lx.tail:
                parent.append(dom.Text(lx.tail))

        doc = lhtml.fromstring(html or "<html></html>")
        convert(doc, root)
        return root

    register_backend("lxml", parse_lxml)


_try_register_lxml()

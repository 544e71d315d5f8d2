"""OCR markdown-image occurrence parser + block injection.

Re-expresses the reference's markdown OCR plumbing
(packages/scrape/src/core/MarkdownOCR.ts:1-241): scan a markdown document
for image tokens ``![alt](dest)`` — including the linked-image wrapper form
``[![alt](dest)](link)`` that markdown conversion emits — with
balanced-bracket parsing (backslash escapes honored, nested brackets
balanced), then splice an ``[ANYCRAWL_OCR_TEXT]…[/ANYCRAWL_OCR_TEXT]``
block immediately after each occurrence.

The OCR *model call* is out of scope in corpus replay (no VL model in this
sandbox); ``inject_ocr_col`` takes the url→text mapping as data (a map
column or a plain dict), which is exactly the seam where a real deployment
feeds model output. Everything else — occurrence parsing, normalization,
injection — is the reference's observable string behavior, covered by the
ported MarkdownOCR.test.ts cases in tests/test_kernel.py.
"""

from __future__ import annotations

from dataclasses import dataclass

OCR_BLOCK_OPEN = "[ANYCRAWL_OCR_TEXT]"
OCR_BLOCK_CLOSE = "[/ANYCRAWL_OCR_TEXT]"

_MAX_OCR_LEN = 4000


@dataclass(frozen=True)
class ImageOccurrence:
    image_start: int
    image_end: int
    insert_after: int
    image_url: str


def _skip_ws(text: str, i: int) -> int:
    # NOTE: skipping ANY whitespace (incl. newlines) between ']' and '('
    # diverges from CommonMark but matches the reference's skipWhitespace
    # (MarkdownOCR.ts:25-31) — '![alt] (words)' parses as an image there
    # too; bug-for-bug parity is the contract here.
    n = len(text)
    while i < n and text[i].isspace():
        i += 1
    return i


def _parse_balanced(text: str, start: int, open_ch: str,
                    close_ch: str) -> tuple[int, str] | None:
    """From ``text[start] == open_ch``, scan to the matching close with
    nesting and backslash-escape skipping; returns (end_exclusive, inner)."""
    if start >= len(text) or text[start] != open_ch:
        return None
    depth = 1
    i = start + 1
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\\":
            i += 2
            continue
        if ch == open_ch:
            depth += 1
        elif ch == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1, text[start + 1:i]
        i += 1
    return None


def _url_from_destination(destination: str) -> str:
    """A markdown link destination is either ``<bracketed url>`` or the
    prefix up to the first unescaped whitespace (the rest being a title)."""
    trimmed = destination.strip()
    if not trimmed:
        return ""
    if trimmed.startswith("<"):
        end = trimmed.find(">")
        if end > 1:
            return trimmed[1:end].strip()
    i = 0
    n = len(trimmed)
    while i < n:
        ch = trimmed[i]
        if ch == "\\":
            i += 2
            continue
        if ch.isspace():
            break
        i += 1
    return trimmed[:i]


def _parse_image_token(text: str, start: int) -> tuple[int, str] | None:
    """``![alt](dest)`` at ``start`` → (end_exclusive, url), else None."""
    if not text.startswith("![", start):
        return None
    alt = _parse_balanced(text, start + 1, "[", "]")
    if alt is None:
        return None
    paren_start = _skip_ws(text, alt[0])
    dest = _parse_balanced(text, paren_start, "(", ")")
    if dest is None:
        return None
    return dest[0], _url_from_destination(dest[1])


def _linked_wrapper_end(text: str, image_start: int,
                        image_end: int) -> int | None:
    """If the image token is the entire bracket content of a surrounding
    link — ``[![alt](url)](link)`` — return the wrapper's end, else None."""
    wrapper_start = image_start - 1
    if wrapper_start < 0 or text[wrapper_start] != "[":
        return None
    bracket = _parse_balanced(text, wrapper_start, "[", "]")
    if bracket is None or bracket[0] != image_end + 1:
        return None
    outer_paren = _skip_ws(text, bracket[0])
    dest = _parse_balanced(text, outer_paren, "(", ")")
    if dest is None:
        return None
    return dest[0]


def collect_image_occurrences(markdown: str) -> list[ImageOccurrence]:
    """All image tokens in document order; linked images span their wrapper
    (so injection lands after the closing ``)(…)`` of the link)."""
    out: list[ImageOccurrence] = []
    i = 0
    n = len(markdown)
    while i < n:
        if not markdown.startswith("![", i):
            i += 1
            continue
        parsed = _parse_image_token(markdown, i)
        if parsed is None:
            i += 1
            continue
        image_end, url = parsed
        wrapper_end = _linked_wrapper_end(markdown, i, image_end)
        insert_after = wrapper_end if wrapper_end is not None else image_end
        out.append(ImageOccurrence(i, image_end, insert_after, url))
        i = insert_after
    return out


def normalize_ocr_text(text: str) -> str:
    stripped = text.replace("\r", "")
    stripped = stripped.replace(OCR_BLOCK_OPEN, "").replace(OCR_BLOCK_CLOSE, "")
    while "\n\n\n" in stripped:
        stripped = stripped.replace("\n\n\n", "\n\n")
    stripped = stripped.strip()
    if len(stripped) <= _MAX_OCR_LEN:
        return stripped
    return stripped[:_MAX_OCR_LEN] + "..."


def _ocr_block(text: str) -> str:
    return f"\n\n{OCR_BLOCK_OPEN}\n{normalize_ocr_text(text)}\n{OCR_BLOCK_CLOSE}\n"


def inject_ocr_blocks(markdown: str,
                      ocr_text_by_url: dict[str, str]) -> str:
    """Splice an OCR block after every image occurrence (empty block when
    the url has no OCR text — matching the reference)."""
    occurrences = collect_image_occurrences(markdown)
    if not occurrences:
        return markdown
    pieces = []
    cursor = 0
    for occ in occurrences:
        pieces.append(markdown[cursor:occ.insert_after])
        pieces.append(_ocr_block(ocr_text_by_url.get(occ.image_url, "")))
        cursor = occ.insert_after
    pieces.append(markdown[cursor:])
    return "".join(pieces)


def image_urls(markdown: str) -> list[str]:
    """Distinct image urls in first-occurrence order — the batch an OCR
    model call would be fanned out over."""
    seen: set[str] = set()
    out: list[str] = []
    for occ in collect_image_occurrences(markdown):
        if occ.image_url and occ.image_url not in seen:
            seen.add(occ.image_url)
            out.append(occ.image_url)
    return out

"""JSON-LD candidate extraction from fetched pages.

Re-implements ``FindJSONInResponse`` (/root/reference/internal/summoner/
acquire/acquire.go:220-262) for the Parquet-page data plane:

- arbitration (M9): treat the body as raw JSON-LD when the content type
  contains ``application/ld+json`` / ``application/json`` or the URL
  path ends in ``.json`` / ``.jsonld`` (acquire.go:240,288-304); the
  Parquet schema has no Content-Type column, so the extension fallback
  is the live branch, with an optional ``content_type`` argument for
  callers that carry one.
- HTML extraction (M10): every ``script[type^='application/ld+json']``
  tag's inner text, byte-for-byte (goquery ``.Text()`` of the raw text
  node, acquire.go:252-258). The CSS prefix match is case-sensitive on
  the value, case-insensitive on tag/attribute names (cascadia).
- whole-body (M11): the page's plain text (``doc.Text()``), which in the
  page table is the ``text`` column (BASELINE.json input_hint).

The scanner is a compiled-regex state machine over the raw HTML —
no DOM build — so a batch of pages is processed at C speed per row.
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

__all__ = [
    "file_extension_is_json",
    "is_json_content_type",
    "extract_script_jsonld",
    "extract_script_jsonld_bytes",
    "extract_candidates",
]

JSON_CONTENT_TYPE = "application/ld+json"

# opening script tags, case-insensitive on the tag name; attributes parsed
# from the captured attr text. Script content runs to the next "</script"
# (case-insensitive), matching net/html raw-text element parsing.
_SCRIPT_OPEN = re.compile(r"<script\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_SCRIPT_CLOSE = re.compile(r"</script", re.IGNORECASE)
_ATTR = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s"'=<>`]+))?""",
    re.DOTALL,
)


def file_extension_is_json(raw_url: str) -> bool:
    """acquire.go:298-304 — URL *path* suffix check."""
    # fast path for scheme://host[/path] urls (C string ops; equivalence
    # with urlparse pinned by tests): path = after the authority, minus
    # query/fragment and the last segment's ;params — exactly urlparse's
    # .path for these shapes
    if (raw_url.startswith("https://") or raw_url.startswith("http://")) and "[" not in raw_url:
        i = raw_url.index("://")
        j = raw_url.find("/", i + 3)
        path = raw_url[j:] if j >= 0 else ""
        for sep in ("?", "#"):
            k = path.find(sep)
            if k >= 0:
                path = path[:k]
        seg_start = path.rfind("/") + 1
        k = path.find(";", seg_start)
        if k >= 0:
            path = path[:k]
        return path.endswith(".json") or path.endswith(".jsonld")
    try:
        path = urlparse(raw_url).path
    except ValueError:
        return False
    return path.endswith(".json") or path.endswith(".jsonld")


def is_json_content_type(content_type: str | None) -> bool:
    """acquire.go:240,288-296 — substring containment over header values."""
    if not content_type:
        return False
    return JSON_CONTENT_TYPE in content_type or "application/json" in content_type


def _tag_attrs(attr_text: str) -> dict[str, str]:
    attrs = {}
    for m in _ATTR.finditer(attr_text):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = ""
        elif val[:1] in "\"'":
            val = val[1:-1]
        if name not in attrs:
            attrs[name] = val
    return attrs

def extract_script_jsonld(html: str) -> list[str]:
    """Inner text of every script tag whose type starts with
    application/ld+json (value match case-sensitive), document order."""
    out = []
    pos = 0
    n = len(html)
    while pos < n:
        m = _SCRIPT_OPEN.search(html, pos)
        if m is None:
            break
        attrs = _tag_attrs(m.group(1))
        body_start = m.end()
        mclose = _SCRIPT_CLOSE.search(html, body_start)
        body_end = mclose.start() if mclose else n
        pos = mclose.end() if mclose else n
        if attrs.get("type", "").startswith(JSON_CONTENT_TYPE):
            out.append(html[body_start:body_end])
    return out


# byte-level twins of the scanner patterns: a batch's html stays a
# zero-copy Arrow buffer slice (memoryview) and only the matched script
# BODIES are ever decoded to Python str. Equivalence with the str
# scanner: the structural chars (<, >, /, script, quotes) are ASCII and
# UTF-8 continuation bytes are all >= 0x80, so byte matches and decoded
# str matches land on the same boundaries; slices start/end on ASCII
# delimiters so per-slice utf-8 "replace" decoding equals slicing the
# decoded whole (pinned by test_extract parity tests).
_SCRIPT_OPEN_B = re.compile(rb"<script\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_SCRIPT_CLOSE_B = re.compile(rb"</script", re.IGNORECASE)


def extract_script_jsonld_bytes(data) -> list[str]:
    """``extract_script_jsonld`` over raw bytes / a memoryview of the
    page — no whole-page decode; decodes only attr text and candidate
    bodies (the hot path for Arrow binary page columns)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        m = _SCRIPT_OPEN_B.search(data, pos)
        if m is None:
            break
        attrs = _tag_attrs(str(m.group(1), "utf-8", "replace"))
        body_start = m.end()
        mclose = _SCRIPT_CLOSE_B.search(data, body_start)
        body_end = mclose.start() if mclose else n
        pos = mclose.end() if mclose else n
        if attrs.get("type", "").startswith(JSON_CONTENT_TYPE):
            out.append(str(data[body_start:body_end], "utf-8", "replace"))
    return out


def extract_candidates(
    url: str,
    html: bytes | str | None,
    text: str | None = None,
    content_type: str | None = None,
) -> tuple[list[str], bool]:
    """Return (candidate JSON-LD strings, used_whole_body).

    Candidates are *unvalidated*; validation/graph-array explosion happens
    in the validator stage (stages.extract_stage), matching the split in
    acquire.go:244/253 (addToJsonListIfValid).
    """
    if is_json_content_type(content_type) or file_extension_is_json(url):
        if text is not None and text != "":
            return [text], True
        if html is None:
            return [], True
        body = (
            str(html, "utf-8", "replace")
            if isinstance(html, (bytes, bytearray, memoryview))
            else html
        )
        return [body], True
    if html is None:
        return [], False
    if isinstance(html, (bytes, bytearray, memoryview)):
        # bytes-native scan: no whole-page decode
        return extract_script_jsonld_bytes(html), False
    return extract_script_jsonld(html), False

"""Head-metadata extraction: title / description / canonical / og / JSON-LD.

The reference's per-page harness records page-level metadata alongside
the extracted text (ref src/stage2_ocr.py:519-544 — page number, type,
confidence in the page header); the web-page analog of page-level
metadata is the document head: ``<title>``, ``meta[name=description]``,
``link[rel=canonical]``, OpenGraph properties, and schema.org JSON-LD.
A crawl pipeline needs these for URL canonicalization (the canonical
link is the dedup key the CDX index prefers), snippet generation, and
page-type priors for the classifier — so this is a first-class scan
projection, not an afterthought.

Semantics (browser-like, deterministic):
  * document order, FIRST occurrence wins per field — browsers use the
    first ``<title>`` / first matching ``<meta>``;
  * matching is case-insensitive on tag/attr NAMES and on the
    ``name``/``property``/``rel``/``type`` VALUES, case-preserving on
    content;
  * title text is entity-unescaped (the fast tokenizer stores raw-text
    element content literally) and whitespace-normalized; meta content
    attributes are entity-unescaped at parse time by ``_parse_attrs``
    and only whitespace-normalized here — never double-unescaped;
  * JSON-LD: the first ``script[type="application/ld+json"]`` is parsed
    strictly (``json.loads``); a top-level list means "first dict
    element"; ``@type`` may be a string or a list (first element wins).
    Malformed JSON (truncated, trailing commas — common in the wild)
    degrades to ``""`` — same total-function contract as
    kernel/links.py (a page whose metadata cannot be parsed has none).

Total: any decode/parse failure yields the all-empty record.  Pure
function of the input bytes — no I/O, no Spark imports (kernel layer
policy, SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import re
from html import unescape

from .dom import parse_html

# all-empty record: the degrade value AND the schema documentation
EMPTY_METADATA = {
    "title": "",
    "description": "",
    "canonical": "",
    "og_title": "",
    "ld_type": "",
}

_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    """Whitespace-normalize only — the caller decides entity handling
    (title raw text needs unescape; attr values are already unescaped
    by the parser)."""
    return _WS.sub(" ", s).strip()


def _ld_type(raw: str) -> str:
    """schema.org ``@type`` of a JSON-LD blob, or '' when unparseable."""
    try:
        data = json.loads(raw)
    except Exception:
        return ""
    if isinstance(data, list):
        data = data[0] if data and isinstance(data[0], dict) else None
    if not isinstance(data, dict):
        return ""
    t = data.get("@type", "")
    if isinstance(t, list):
        t = t[0] if t else ""
    return t if isinstance(t, str) else ""


def page_metadata(html: bytes | str) -> dict:
    """Extract the head-metadata record of one page.

    Returns a dict with keys ``title, description, canonical, og_title,
    ld_type`` — always all five, empty string when absent.  Scans the
    WHOLE document, not just ``<head>``: crawl HTML routinely leaks
    meta tags into ``<body>`` (or has no head element at all after
    forgiving parsing), and browsers honor them anyway.
    """
    out = dict(EMPTY_METADATA)
    try:
        root = parse_html(html, metadata=True)
    except Exception:
        return out
    title_seen = False
    for node in root.find_all("title", "meta", "link", "script"):
        tag = node.tag
        if tag == "title":
            if not title_seen:
                title_seen = True
                # raw-text content is stored literally by the fast
                # tokenizer -> unescape exactly once here; the FIRST
                # title element wins even when empty (document.title
                # semantics), so an empty head title is never
                # overridden by a later spam title in the body
                out["title"] = _norm(unescape(node.text(" ")))
        elif tag == "meta":
            content = node.attr("content")
            if not content:
                continue
            if (
                not out["description"]
                and node.attr("name").lower() == "description"
            ):
                out["description"] = _norm(content)
            elif (
                not out["og_title"]
                and node.attr("property").lower() == "og:title"
            ):
                out["og_title"] = _norm(content)
        elif tag == "link":
            if not out["canonical"] and "canonical" in node.attr(
                "rel"
            ).lower().split():
                href = node.attr("href").strip()
                if href:
                    out["canonical"] = href
        else:  # script
            if (
                not out["ld_type"]
                and node.attr("type").lower().strip()
                == "application/ld+json"
            ):
                out["ld_type"] = _ld_type(node.text(""))
    return out

"""Forgiving HTML → lightweight DOM tree, built on stdlib ``html.parser``.

This replaces the reference's page-image rendering front end
(/root/reference/src/stage2_ocr.py:406-442): for web pages the "page"
is the HTML byte blob itself, so the tokenizer is the scan operator.

Design constraints:
  * stdlib only (no lxml/bs4) — zero native deps so executors stay
    uniform under ``spark-submit --py-files`` (SURVEY.md §7);
  * forgiving: unclosed tags, stray end tags, and implicit closes
    (``<p>``/``<li>``/table rows) must parse the way browsers do, because
    Common-Crawl HTML is overwhelmingly malformed;
  * deterministic: output depends only on the input bytes.
"""

from __future__ import annotations

from html.parser import HTMLParser


class Node:
    """An element node.  Text nodes are plain ``str`` children."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str] | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []

    # -- convenience accessors -----------------------------------------
    def attr(self, name: str) -> str:
        return self.attrs.get(name) or ""

    def classes(self) -> list[str]:
        return self.attr("class").lower().split()

    def find_all(self, *tags: str):
        """Depth-first pre-order iterator over descendant elements."""
        want = set(tags)
        stack = list(reversed(self.children))
        while stack:
            child = stack.pop()
            if isinstance(child, Node):
                if not want or child.tag in want:
                    yield child
                stack.extend(reversed(child.children))

    def text(self, sep: str = "") -> str:
        """Concatenated text of all descendant text nodes (raw, unnormalized)."""
        parts: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            child = stack.pop()
            if isinstance(child, str):
                parts.append(child)
            else:
                stack.extend(reversed(child.children))
        return sep.join(parts)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Node {self.tag} children={len(self.children)}>"


# Elements that never have content (HTML5 void elements).
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Opening one of these implicitly closes an open <p> (browser behavior).
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p pre section "
    "table ul".split()
)

# tag being opened -> set of tags it implicitly closes while on top of stack
_SIBLING_CLOSERS: dict[str, frozenset[str]] = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "thead": frozenset({"tr", "td", "th"}),
    "tbody": frozenset({"tr", "td", "th", "thead"}),
    "tfoot": frozenset({"tr", "td", "th", "tbody"}),
    "option": frozenset({"option"}),
    "optgroup": frozenset({"option", "optgroup"}),
}


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self._stack: list[Node] = [self.root]

    # -- helpers ---------------------------------------------------------
    def _top(self) -> Node:
        return self._stack[-1]

    _HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

    def _implied_closes(self, tag: str) -> None:
        siblings = _SIBLING_CLOSERS.get(tag)
        while len(self._stack) > 1 and siblings and self._top().tag in siblings:
            self._stack.pop()
        # a block element opening inside an unclosed heading closes it —
        # browsers nest here, but for text extraction a truncated <h1>
        # must not swallow the rest of the page
        if tag in _P_CLOSERS and self._top().tag in self._HEADING_TAGS:
            self._stack.pop()
        if tag in _P_CLOSERS:
            # close an open <p> anywhere above the nearest block boundary
            if any(n.tag == "p" for n in self._stack[1:]):
                while len(self._stack) > 1 and self._top().tag != "p":
                    # only unwind through inline formatting, not real blocks
                    if self._top().tag in _P_CLOSERS or self._top().tag in (
                        "td", "th", "li", "body", "html",
                    ):
                        return
                    self._stack.pop()
                if len(self._stack) > 1 and self._top().tag == "p":
                    self._stack.pop()

    # -- HTMLParser callbacks ---------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._implied_closes(tag)
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._top().children.append(node)
        if tag not in VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._top().children.append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # find the nearest matching open element; ignore stray end tags
        for depth in range(len(self._stack) - 1, 0, -1):
            if self._stack[depth].tag == tag:
                del self._stack[depth:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._top().children.append(data)


def parse_html(html: str | bytes) -> Node:
    """Parse an HTML document (bytes are decoded as UTF-8, replacing errors)."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # html.parser is already lenient; anything that still raises is
        # treated as truncation — keep whatever tree was built so far.
        pass
    return builder.root

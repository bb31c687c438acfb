"""HTML main-content extractor — DOM heuristics (SURVEY §7 Phase 2 (c)).

The reference treats HTML as a first-class payload (html-to-pdf samples,
ref src/htmltopdf/*.js) but delegates DOM analysis to a cloud service; this
is a from-scratch extractor in the spirit of boilerpipe/readability:

* build a lightweight DOM with the stdlib ``html.parser`` (lxml is not
  available in this environment — the parser is lenient on malformed HTML);
* score candidate containers by text mass × (1 − link density) — the
  tag-path scoring analogue of the Adobe element ``Path`` taxonomy
  (ref result.zip → structuredData.json elements);
* prune high-link-density blocks (nav / footer / menus);
* emit the winning container's block-level texts in document order with
  char spans into the joined clean text.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from ..functions.normalize import clean_line

_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}
_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
_BLOCK_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "li", "pre", "blockquote", "td", "dt", "dd"}
_CONTAINER_TAGS = {"div", "article", "main", "section", "body", "td", "ul", "ol", "table"}
_PRUNE_LINK_DENSITY = 0.5


class _Node:
    __slots__ = ("tag", "parent", "content")

    def __init__(self, tag: str, parent: "_Node | None"):
        self.tag = tag
        self.parent = parent
        # document-ordered mix of str (text runs) and _Node (children)
        self.content: list = []

    @property
    def children(self):
        return [c for c in self.content if isinstance(c, _Node)]


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", None)
        self.cur = self.root
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in _SKIP_TAGS:
                self._skip_depth += 1
            return
        if tag in _SKIP_TAGS:
            self._skip_depth = 1
            return
        node = _Node(tag, self.cur)
        self.cur.content.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in _SKIP_TAGS:
                self._skip_depth -= 1
            return
        if tag in _VOID_TAGS:
            return
        # pop to the nearest matching open tag (lenient on mis-nesting)
        n = self.cur
        while n is not None and n.tag != tag:
            n = n.parent
        if n is not None and n.parent is not None:
            self.cur = n.parent

    def handle_data(self, data):
        if self._skip_depth:
            return
        if data and not data.isspace():
            self.cur.content.append(data)


# ---------------------------------------------------------------------------
# Fast tokenizer: builds the SAME _Node tree as _TreeBuilder (stdlib
# html.parser) in one compiled-regex pass — the stdlib parser spends ~80 %
# of extract_html in char-wise goahead/parse_starttag. The stdlib builder
# is retained as the semantic twin; tree equivalence over the fixture
# corpus + adversarial payloads is asserted in tests. Known cosmetic
# divergence: a truncated trailing tag at EOF chunks differently (both
# whitespace-collapse to the same prose).
# ---------------------------------------------------------------------------

_TAG_RX = re.compile(
    r"<!--.*?-->"  # comments
    r"|<!\[CDATA\[.*?\]\]>"  # cdata blocks
    r"|<[!?](?:[^>\"']|\"[^\"]*\"|'[^']*')*>"  # doctype / PIs
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)"  # open/close tag name
    r"((?:[^<>\"']|\"[^\"]*\"|'[^']*')*?)"  # attrs (quote-aware)
    r"(/?)>",
    re.S,
)
_LT_SPLIT = re.compile(r"(<)")  # stdlib emits a bare '<' as its own data chunk
_RAW_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}


def _fast_tree(payload: str) -> _Node:
    from html import unescape

    root = _Node("#root", None)
    cur = root
    skip = 0
    pos = 0
    n = len(payload)
    while pos < n:
        m = _TAG_RX.search(payload, pos)
        text = payload[pos : m.start()] if m else payload[pos:]
        if text and skip == 0:
            if "<" in text:
                pieces = _LT_SPLIT.split(text)
            else:
                pieces = (text,)
            for piece in pieces:
                if piece and not piece.isspace():
                    cur.content.append(unescape(piece) if "&" in piece else piece)
        if m is None:
            break
        pos = m.end()
        # one group() call for all three operands (profiled: 3 separate
        # calls were ~20 % of the tokenizer loop); tags are almost always
        # already lowercase — islower() avoids the allocation
        closing, name, selfclose_mark = m.group(1, 2, 4)
        if name is None:  # comment / cdata / doctype / PI
            continue
        tag = name if name.islower() else name.lower()
        if closing:  # end tag
            if skip:
                if tag in _SKIP_TAGS:
                    skip -= 1
                continue
            if tag in _VOID_TAGS:
                continue
            node = cur
            while node is not None and node.tag != tag:
                node = node.parent
            if node is not None and node.parent is not None:
                cur = node.parent
            continue
        selfclose = bool(selfclose_mark)
        if skip:
            if tag in _RAW_CLOSE and not selfclose:
                # rawtext elements must consume to their close tag EVEN
                # inside a skipped subtree: a '</svg>' inside a JS string
                # would otherwise decrement skip and leak the rest of the
                # skipped subtree into the tree (stdlib CDATA mode never
                # sees markup inside script/style — twin equivalence)
                mc = _RAW_CLOSE[tag].search(payload, pos)
                pos = mc.end() if mc else n
            elif tag in _SKIP_TAGS and not selfclose:
                skip += 1
            continue
        if tag in _SKIP_TAGS:
            if not selfclose:
                if tag in _RAW_CLOSE:
                    # rawtext elements: consume to the close tag like the
                    # stdlib CDATA mode (content dropped either way)
                    mc = _RAW_CLOSE[tag].search(payload, pos)
                    pos = mc.end() if mc else n
                else:
                    skip = 1
            continue
        node = _Node(tag, cur)
        cur.content.append(node)
        if not selfclose and tag not in _VOID_TAGS:
            cur = node
    return root


def _stdlib_tree(payload: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(payload)
    builder.close()
    return builder.root


def _measure(node: _Node, inside_link: bool, out: dict) -> tuple[int, int]:
    """Return (text_len, link_text_len) of the subtree; memoize in ``out``."""
    is_link = inside_link or node.tag == "a"
    total = link = 0
    for item in node.content:
        if isinstance(item, str):
            n = len(item.strip())
            total += n
            if is_link:
                link += n
        else:
            t, l = _measure(item, is_link, out)
            total += t
            link += l
    out[id(node)] = (total, link)
    return total, link


def _own_text(node: _Node) -> str:
    """Subtree text in document order, whitespace-collapsed (T6)."""
    parts: list[str] = []

    def walk(n: _Node):
        for item in n.content:
            if isinstance(item, str):
                parts.append(item)
            else:
                walk(item)

    walk(node)
    return clean_line(" ".join(parts))


def _blocks_in(node: _Node, measures: dict, out: list[tuple[str, str]]):
    """Collect (tag, text) for block-level descendants in document order,
    pruning high-link-density blocks; nested blocks are not double-counted."""
    for c in node.children:
        if c.tag in _BLOCK_TAGS:
            total, link = measures[id(c)]
            if total > 0 and (link / total) <= _PRUNE_LINK_DENSITY:
                text = _own_text(c)
                if text:
                    out.append((c.tag, text))
            continue
        _blocks_in(c, measures, out)


def extract_html(payload: str) -> tuple[str, list[tuple[int, int, str]]]:
    """Extract main content from an HTML payload.

    Returns ``(clean_text, spans)`` where spans are ``(start, end, tag)``
    char offsets into clean_text, one per retained block element.
    """
    try:
        root = _fast_tree(payload)
    except Exception:
        try:
            root = _stdlib_tree(payload)
        except Exception:
            text = clean_line(re.sub(r"<[^>]+>", " ", payload))
            return (text, [(0, len(text), "text")] if text else [])
    return _extract_from_root(root)


def _extract_from_root(root: _Node) -> tuple[str, list[tuple[int, int, str]]]:
    measures: dict = {}
    _measure(root, False, measures)

    # candidate containers scored by non-link text mass × (1 − link density)
    best: _Node | None = None
    best_score = -1.0

    def consider(n: _Node):
        nonlocal best, best_score
        if n.tag in _CONTAINER_TAGS:
            total, link = measures[id(n)]
            if total > 0:
                density = link / total
                score = (total - link) * (1.0 - density)
                if score > best_score:
                    best_score = score
                    best = n
        for c in n.children:
            consider(c)

    consider(root)

    target = best if best is not None else root
    blocks: list[tuple[str, str]] = []
    _blocks_in(target, measures, blocks)
    if not blocks:
        text = _own_text(target)
        blocks = [("text", text)] if text else []

    spans: list[tuple[int, int, str]] = []
    parts: list[str] = []
    pos = 0
    for tag, text in blocks:
        start = pos
        parts.append(text)
        pos += len(text)
        spans.append((start, pos, tag))
        pos += 1  # the joining '\n'
    return "\n".join(parts), spans

"""Batched HTML boilerplate stripper (SURVEY.md §2.7; north-rule stage 1).

The reference repo contains no HTML code — this stage is required by the
north rule (BASELINE.json: "batched HTML boilerplate stripper ... DOM parse
+ text-density/link-density heuristics a la readability/jusText").  It is
built on the stdlib ``html.parser`` (lxml is not available in this
environment): parse into a lightweight node tree, collect block-level
candidate nodes, score them by length and link density, and join the kept
blocks.  All thresholds are frozen module constants so the sequential
golden run and the Ray pipeline share one deterministic kernel.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Subtrees that are never content.
DROP_TAGS = frozenset({
    "script", "style", "noscript", "template", "head", "nav", "header",
    "footer", "aside", "form", "button", "select", "option", "iframe",
    "svg", "canvas",
})
# Block-level elements that are extraction candidates (deepest-level text
# carriers; containers like div/section are not candidates, which avoids
# double counting).
CANDIDATE_TAGS = frozenset({
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre", "blockquote",
})
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
# Elements that never wrap content.
VOID_TAGS = frozenset({
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
})

# Frozen scoring thresholds.
MIN_BLOCK_CHARS = 25       # shorter paragraph candidates are boilerplate
MAX_LINK_DENSITY = 0.3     # paragraphs denser in links than this are dropped
MAX_HEADING_LINK_DENSITY = 0.5


class _Node:
    __slots__ = ("tag", "children")

    def __init__(self, tag: str):
        self.tag = tag
        self.children: list = []  # _Node | str


class _TreeBuilder(HTMLParser):
    """Forgiving DOM builder: unclosed/mismatched tags close to the nearest
    matching ancestor, strays are ignored."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            if tag == "br":
                self.stack[-1].children.append("\n")
            return
        node = _Node(tag)
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _gather(node: _Node) -> tuple[str, int]:
    """(all text, text chars under <a>) of a subtree, skipping DROP_TAGS."""
    parts: list[str] = []
    link_chars = 0
    for child in node.children:
        if isinstance(child, str):
            parts.append(child)
        elif child.tag not in DROP_TAGS:
            text, sub_link = _gather(child)
            parts.append(text)
            if child.tag == "a":
                link_chars += len("".join(text.split()))
            else:
                link_chars += sub_link
    return "".join(parts), link_chars


def _collect_candidates(node: _Node, out: list) -> None:
    for child in node.children:
        if isinstance(child, str) or child.tag in DROP_TAGS:
            continue
        if child.tag in CANDIDATE_TAGS:
            out.append(child)
            # candidates may still nest (li > p); deepest wins, so recurse
            # and let inner candidates appear after their container.
            _collect_candidates(child, out)
        else:
            _collect_candidates(child, out)


def _norm(text: str) -> str:
    return " ".join(text.split())


def strip_html(raw: bytes | str) -> tuple[str, int]:
    """Extract main content from an HTML payload.

    Returns (text, n_kept_blocks): kept block texts joined by blank lines.
    Decoding is utf-8 with replacement — never raises on byte noise.
    """
    kept = strip_html_parts(raw)
    return "\n\n".join(kept), len(kept)


def strip_html_parts(raw: bytes | str) -> list[str]:
    """The kept block texts, in document order."""
    if isinstance(raw, bytes):
        raw = raw.decode("utf-8", errors="replace")
    root = build_tree(raw)

    candidates: list[_Node] = []
    _collect_candidates(root, candidates)

    # A nested candidate's text is already inside its ancestor candidate;
    # drop ancestors that contain another candidate to avoid duplication.
    def has_candidate_child(n: _Node) -> bool:
        return any(
            isinstance(c, _Node)
            and (c.tag in CANDIDATE_TAGS or has_candidate_child(c))
            for c in n.children
        )

    kept: list[str] = []
    for node in candidates:
        if has_candidate_child(node):
            continue
        text, link_chars = _gather(node)
        text = _norm(text)
        if not text:
            continue
        density = link_chars / len("".join(text.split())) if text else 1.0
        if node.tag in HEADING_TAGS:
            if density <= MAX_HEADING_LINK_DENSITY:
                kept.append(text)
        else:
            if len(text) >= MIN_BLOCK_CHARS and density <= MAX_LINK_DENSITY:
                kept.append(text)
    return kept


# ---------------------------------------------------------------------------
# Fast tokenizer path
# ---------------------------------------------------------------------------
# ``html.parser``'s pure-Python goahead loop is ~15% of the parse kernel.
# This regex tokenizer builds the SAME _Node tree for the HTML this stage
# is specified over (tags with quoted attributes, char/entity refs,
# comments, doctype, raw-text script/style); the HTMLParser builder above
# stays as the reference twin, and tests/test_units.py pins builder parity
# over the full synthetic corpus plus adversarial fragments. Inputs where
# the two tokenizers could diverge are the pathological-markup tail
# (unterminated comments/tags at EOF) — the tree contract there is
# whatever THIS module emits; the stripper is this engine's own stage
# (the reference repo has no HTML code), so the kernel, not html.parser,
# owns the byte contract.

import re as _re
from html import unescape as _unescape

_RAWTEXT_TAGS = ("script", "style")

_TOKEN_RE = _re.compile(
    r"""<(?:
        (?P<comment>!--.*?(?:-->|$))
      | (?P<decl>![^>]*>?)
      | (?P<pi>\?[^>]*>?)
      | /(?P<endtag>[a-zA-Z][^\t\n\r\f\ />]*)[^>]*>
      | /(?P<endbogus>[^>]*)>              # bogus end tag: consumed, dropped
      | (?P<starttag>[a-zA-Z][^\t\n\r\f\ />]*)
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>])*)>
    )""",
    _re.X | _re.S)

_AMP_RE = _re.compile(r"&")


def _fast_tree(raw: str) -> _Node:
    root = _Node("#root")
    stack = [root]
    pos = 0
    n = len(raw)
    search = _TOKEN_RE.search
    while pos < n:
        m = search(raw, pos)
        if m is None:
            data = raw[pos:]
            if data:
                stack[-1].children.append(
                    _unescape(data) if "&" in data else data)
            break
        start = m.start()
        if start > pos:
            data = raw[pos:start]
            stack[-1].children.append(
                _unescape(data) if "&" in data else data)
        pos = m.end()
        tag = m.group("starttag")
        if tag is not None:
            tag = tag.lower()
            if tag in VOID_TAGS:
                if tag == "br":
                    stack[-1].children.append("\n")
                continue
            node = _Node(tag)
            stack[-1].children.append(node)
            if m.group("attrs").endswith("/"):
                # '/>' self-closing: empty element, never pushed and no
                # raw-text mode (html.parser's handle_startendtag)
                continue
            stack.append(node)
            if tag in _RAWTEXT_TAGS:
                # raw-text element: everything to the matching close tag
                # is character data (html.parser's CDATA mode); an
                # unterminated raw-text tail at EOF is dropped, matching
                # html.parser's buffered-and-never-flushed behaviour
                end_m = _re.search(r"</%s(?=[\s/>])|</%s$|</%s>" %
                                   (tag, tag, tag), raw[pos:],
                                   _re.I)
                if end_m is None:
                    pos = n
                else:
                    stack[-1].children.append(raw[pos:pos + end_m.start()])
                    pos = pos + end_m.start()
            continue
        tag = m.group("endtag")
        if tag is not None:
            tag = tag.lower()
            if tag in VOID_TAGS:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        # comments / declarations / processing instructions: dropped
    return root


def build_tree(raw: str, *, tokenizer: str = "fast") -> _Node:
    """Tree entry point: ``tokenizer="fast"`` (default, regex scanner) or
    ``"stdlib"`` (the html.parser reference twin used by the parity
    tests)."""
    if tokenizer == "stdlib":
        builder = _TreeBuilder()
        builder.feed(raw)
        builder.close()
        return builder.root
    return _fast_tree(raw)

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
    builder = _TreeBuilder()
    builder.feed(raw)
    builder.close()

    candidates: list[_Node] = []
    _collect_candidates(builder.root, candidates)

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

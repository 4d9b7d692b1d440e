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
# over the full synthetic corpus plus adversarial fragments. Since the
# round-4g parity-fuzz fixes (bare-value slash absorption, junk-position
# quotes, goahead EOF recovery) the two tokenizers agree on EVERY input
# the 16-char adversarial fuzz can construct, padded or not — pinned by
# tests/test_htmlstrip_tokenizer.py at 2x500 hypothesis examples per run
# (10k-example sweeps run during round 4g).

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

# html.parser's start-tag machinery, replicated for the inputs where the
# cheap lexer's answer can differ (caught by the round-4g parity fuzz):
# quotes only protect '>' in VALUE position (<b/">"> ends at the FIRST
# '>'), a trailing "/" is only a self-close marker when not absorbed by
# a bare attribute value (<a href=foo/> is a plain start tag), an attrs
# region the tolerant scan cannot finish cleanly is either JUNK (emit
# the prefix as data, resume lexing) or INCOMPLETE (buffer to EOF;
# close() flushes everything from '<' on as data). The scan only runs
# for tags whose cheap-lexed attrs contain a quote or end with '/' —
# clean markup never pays for it.
_ATTR_WS_RE = _re.compile(r"(?:\s|/(?!>))*")
_ATTR_RE = _re.compile(
    r"""[^\s/>][^\s/=>]*             # attribute name
        (?:\s*=+\s*                  # value indicator
           (?:'[^']*'                # LITA-enclosed value
             |"[^"]*"                # LIT-enclosed value
             |(?!['"])[^>\s]*        # bare value (slash-hungry)
           )
        )?""",
    _re.X)

# strict clean-attrs screen: if the attrs region matches this, the cheap
# lexer's answer is guaranteed correct (quotes only in value position,
# no '>' inside quoted values, no trailing slash, single '='), so the
# Python scan is skipped — one C-level fullmatch keeps clean corpus
# throughput at the pre-fix level.
_CLEAN_ATTRS_RE = _re.compile(
    r"""(?:\s+[^\s/=>'"]+              # attribute name (no quotes/=)
           (?:=(?:"[^"<>]*"            # quoted value, no embedded > or "
               |'[^'<>]*'
               |[^\s"'>]*              # bare value, no quotes
           ))?
        )*\s*""",
    _re.X)

# per-process memo of the clean-attrs screen: web markup is template-
# heavy (the synthetic corpus has 40 distinct gated attrs over 12k
# tags), so the screen's verdict is a near-perfect cache hit; capped
# and cleared so adversarial all-unique attrs cannot grow it unbounded
_clean_memo: dict = {}

_INCOMPLETE_NEXT = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=")


def _scan_start_tag(raw: str, j: int) -> tuple[int, str]:
    r"""Authoritative start-tag scan from just after the tag name,
    mirroring html.parser's locatestarttagend_tolerant + attrfind loop
    (incl. the (?<=['"\s/]) new-attribute lookbehind). Returns
    (stop, kind) with kind in:
      'start'      — raw[stop] is the closing '>'
      'startend'   — raw[stop:stop+2] == '/>'
      'junk'       — html.parser emits raw[tag_open:stop] as data and
                     re-lexes from stop
      'incomplete' — html.parser buffers to EOF; everything from the
                     tag open onward is character data
    """
    n = len(raw)
    j = _ATTR_WS_RE.match(raw, j).end()
    while j < n and raw[j] not in ">/":
        m = _ATTR_RE.match(raw, j)
        if m is None or m.end() == j:
            break
        e = m.end()
        j = _ATTR_WS_RE.match(raw, e).end()
        if j == e and e < n and raw[e - 1] not in "\"'":
            # next attribute would fail html.parser's lookbehind
            j = e
            break
    if j >= n:
        return j, "incomplete"
    c = raw[j]
    if c == ">":
        return j, "start"
    if c == "/":  # the ws-rule leaves '/' only when '/>' follows
        return j, "startend" if raw.startswith("/>", j) else "incomplete"
    if c in _INCOMPLETE_NEXT:
        return j, "incomplete"
    return j, "junk"


def _eof_recover(raw: str, start: int) -> int:
    """html.parser's goahead recovery for an incomplete construct at
    EOF: emit data up to AND INCLUDING the next '>' (else up to the next
    '<', else one char) and resume lexing there."""
    k = raw.find(">", start + 1)
    if k >= 0:
        return k + 1
    k = raw.find("<", start + 1)
    return k if k >= 0 else start + 1


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
        # dispatch on lastgroup: ONE attribute read instead of probing
        # every named group per token (the group() calls were ~10% of
        # the kernel — profiled)
        g = m.lastgroup
        if g == "attrs" or g == "starttag":
            tag = m.group("starttag").lower()
            a = m.group("attrs")
            selfclose = False
            if len(a) > 256:
                # never memoize jumbo attrs (data: URIs, srcset blobs):
                # the cap below bounds entry COUNT, so only short keys
                # may enter — worst case 65536 x 256 B = 16 MB
                clean = not (
                    a.endswith("/") or '"' in a or "'" in a) or (
                    _CLEAN_ATTRS_RE.fullmatch(a) is not None)
            else:
                clean = _clean_memo.get(a)
                if clean is None:
                    if len(_clean_memo) >= 65536:
                        _clean_memo.clear()
                    clean = _clean_memo[a] = not (
                        a.endswith("/") or '"' in a or "'" in a) or (
                        _CLEAN_ATTRS_RE.fullmatch(a) is not None)
            if not clean:
                name_end = m.start() + 1 + len(tag)
                stop, kind = _scan_start_tag(raw, name_end)
                if kind == "start":
                    pos = stop + 1      # may be EARLIER than the cheap span
                elif kind == "startend":
                    selfclose = True
                    pos = stop + 2
                elif kind == "incomplete":
                    # same goahead EOF recovery as comments: data to the
                    # next '>' inclusive, then resume lexing
                    k = _eof_recover(raw, m.start())
                    data = raw[m.start():k]
                    stack[-1].children.append(
                        _unescape(data) if "&" in data else data)
                    pos = k
                    continue
                else:  # junk: prefix is data, re-lex from the stop
                    data = raw[m.start():stop]
                    stack[-1].children.append(
                        _unescape(data) if "&" in data else data)
                    pos = stop
                    continue
            if tag in VOID_TAGS:
                if tag == "br":
                    stack[-1].children.append("\n")
                continue
            node = _Node(tag)
            stack[-1].children.append(node)
            if selfclose:
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
        if g == "endtag":
            tag = m.group("endtag").lower()
            if tag in VOID_TAGS:
                continue
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
            continue
        if g == "comment":
            # terminated only when the '-->' is disjoint from the '!--'
            # opener (group len >= 6 puts the closer at group index >= 3,
            # mirroring html.parser's rawdata.find('-->', i+4)); '<!-->'
            # and '<!--->' match via the '$' branch and merely END with
            # '-->' — html.parser buffers them and emits literal data
            cg = m.group("comment")
            if not (cg.endswith("-->") and len(cg) >= 6):
                # unterminated comment: html.parser's EOF recovery emits
                # data up to the next '>' (inclusive) and RESUMES lexing
                # there — markup after that '>' still parses
                k = _eof_recover(raw, m.start())
                data = raw[m.start():k]
                stack[-1].children.append(
                    _unescape(data) if "&" in data else data)
                pos = k
            continue
        if g == "decl" or g == "pi":
            if not m.group(g).endswith(">"):
                k = _eof_recover(raw, m.start())
                data = raw[m.start():k]
                stack[-1].children.append(
                    _unescape(data) if "&" in data else data)
                pos = k
            continue
        # bogus end tags: consumed, dropped
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

"""A small pure-Python DOM + CSS-selector engine with cheerio-compatible
text()/html()/attr() picks.

Why hand-rolled: the sandbox has no lxml/bs4/cssselect, and the byte-identical
extracted-text invariant (BASELINE.json input_hint) hangs on reproducing
cheerio semantics (/root/reference/spider/extractor.js:316-367):

* ``.text()``  — concatenation of every descendant text node's raw data, in
  document order, NO normalization (cheerio .text()).
* ``.html()``  — inner HTML, byte-exact to the source document (we keep source
  spans, so an un-mutated DOM serializes to the original bytes, which is what
  cheerio yields for parsed-not-modified trees).
* ``.attr(a)`` — raw attribute value.
* picks are ``.trim()``-ed by the caller (extractor.js:365).

Selector subset (what the reference's published rules use — README.md:272-553,
instance/wiki/backup/wiki-rule-backup.json — plus nth-child for fixtures):
tag, ``*``, ``#id``, ``.class``, ``[attr]``, ``[attr=val]``, ``[attr="val"]``,
``:first-child``, ``:last-child``, ``:nth-child(n)``, compounds thereof,
descendant (space) / child (``>``) combinators, comma groups.

This module runs INSIDE Arrow-batched pandas UDFs (one call per HTML doc per
batch row) — it never touches Spark APIs itself.
"""

from __future__ import annotations

import re
from functools import lru_cache
from html import unescape as _unescape
from html.parser import HTMLParser

VOID_ELEMENTS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = (
        "tag", "attrs", "parent", "children", "text_data",
        "content_start", "content_end", "child_index", "_cls",
    )

    def __init__(self, tag: str, attrs: dict[str, str | None], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.parent = parent
        self.children: list[Node] = []  # element children only
        self.text_data: list[tuple[int, str]] = []  # (order-key, text) at this node
        self.content_start = -1
        self.content_end = -1
        # 1-based index among parent's ELEMENT children (CSS nth-child counts
        # elements; our fixture HTML has no stray text between siblings that
        # would matter for the cheerio comparison)
        self.child_index = 0
        # lazily-built frozenset of class tokens (selector hot path: matches()
        # was re-splitting the class attr per candidate per selector)
        self._cls: frozenset[str] | None = None

    def class_set(self) -> frozenset:
        s = self._cls
        if s is None:
            s = self._cls = frozenset((self.attrs.get("class") or "").split())
        return s

    # -- cheerio-compatible picks ------------------------------------------

    def text(self) -> str:
        out: list[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: list[str]) -> None:
        # interleave own text nodes and children in document order
        items: list[tuple[int, object]] = list(self.text_data)
        items += [(c.content_start, c) for c in self.children]
        items.sort(key=lambda t: t[0])
        for _, item in items:
            if isinstance(item, str):
                out.append(item)
            else:
                item._collect_text(out)  # type: ignore[union-attr]

    def inner_html(self, source: str) -> str:
        if self.content_start < 0:
            return ""
        end = self.content_end if self.content_end >= 0 else len(source)
        return source[self.content_start : end]

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)


class _DomBuilder(HTMLParser):
    def __init__(self, source: str):
        super().__init__(convert_charrefs=True)
        self.source = source
        # absolute offset of each line start, for getpos()→offset conversion
        self.line_starts = [0]
        for m in re.finditer("\n", source):
            self.line_starts.append(m.end())
        self.root = Node("#root", {}, None)
        self.root.content_start = 0
        self.root.content_end = len(source)
        self.stack = [self.root]

    def _offset(self) -> int:
        line, col = self.getpos()
        return self.line_starts[line - 1] + col

    def handle_starttag(self, tag: str, attrs):
        parent = self.stack[-1]
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, parent)
        node.child_index = len(parent.children) + 1
        parent.children.append(node)
        raw = self.get_starttag_text() or ""
        node.content_start = self._offset() + len(raw)
        if tag in VOID_ELEMENTS:
            node.content_end = node.content_start
        else:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs):
        parent = self.stack[-1]
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, parent)
        node.child_index = len(parent.children) + 1
        parent.children.append(node)
        raw = self.get_starttag_text() or ""
        node.content_start = self._offset() + len(raw)
        node.content_end = node.content_start

    def handle_endtag(self, tag: str):
        # pop to the nearest matching open tag (tolerate mis-nesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                self.stack[i].content_end = self._offset()
                del self.stack[i:]
                break

    def handle_data(self, data: str):
        self.stack[-1].text_data.append((self._offset(), data))


def parse_html_reference(source: str) -> Node:
    """stdlib-HTMLParser DOM build — the semantics oracle for the fast
    tokenizer below (tests/test_css_extract.py differential test)."""
    b = _DomBuilder(source)
    b.feed(source)
    b.close()
    return b.root


# ------------------------------------------------------- fast tokenizer path
# parse_html() is the hot loop of the extraction pandas UDF: at wave scale it
# runs once per fetched page and profiling shows ~75% of extraction CPU was
# stdlib HTMLParser overhead (char-by-char goahead, getpos line/col tracking,
# per-attr tolerant regexes). This tokenizer makes ONE pass with a single
# compiled alternation (C regex loop), producing the exact same Node tree —
# same lowercased names, html.unescape'd text/attr values, source-span
# offsets, void/self-closing handling, script/style CDATA, mis-nesting pop —
# verified against parse_html_reference by a differential test over the synth
# corpus and the selector fixtures. ~4-5x less CPU per page; at 100 TB this
# is the difference in the extraction stage's core-hours, and on the one-box
# scaling stand-in it directly lowers memory-bandwidth pressure.
_TOKEN_RE = re.compile(
    r"""<(?:
      !--.*?(?:-->|$)                             # comment
    | !\[CDATA\[.*?(?:\]\]>|$)                    # CDATA section (bogus in html)
    | /\s*(?P<end>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>   # end tag
    | (?P<start>[a-zA-Z][^\t\n\r\f />\x00]*)      # start tag name
      (?P<attrs>(?:"[^"]*"|'[^']*'|[^>])*?)       # attr blob (quote-aware)
      (?P<selfclose>/?)>
    | [!?][^>]*>?                                 # bogus comment / PI / decl
    )""",
    re.VERBOSE | re.DOTALL,
)
# attribute pairs inside the attr blob — mirrors HTMLParser.attrfind_tolerant
_ATTR_RE = re.compile(
    r"""([^\s/>][^\s/=>]*)(\s*=+\s*(?:'[^']*'|"[^"]*"|(?!['"])[^>\s]*))?(?:\s|/(?!>))*""",
)
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}


# attr-blob memo: markup is repetitive (the same `class="item"` start tag
# appears thousands of times per wave), and parsing depends only on the blob
# string. The cached dicts are SHARED across nodes — safe because the engine
# never mutates node.attrs after parse (class_set caches per-node, not here).
_ATTR_CACHE: dict[str, dict[str, str]] = {}
_ATTR_CACHE_MAX = 20_000


def _parse_attrs(blob: str) -> dict[str, str]:
    if not blob or blob.isspace():
        return {}
    # only short blobs are worth caching: long ones are usually unique hrefs
    # (per-item anchors), where lookup+insert is pure overhead
    cacheable = len(blob) <= 64
    if cacheable:
        cached = _ATTR_CACHE.get(blob)
        if cached is not None:
            return cached
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            v = ""
        else:
            v = val.split("=", 1)[1].strip()
            if v[:1] == "'" == v[-1:] or v[:1] == '"' == v[-1:]:
                v = v[1:-1]
            if "&" in v:
                v = _unescape(v)
        # duplicate attr: last wins, matching the reference builder's
        # {k: v for k, v in attrs} over HTMLParser's pair list
        attrs[name] = v
    if cacheable and len(_ATTR_CACHE) < _ATTR_CACHE_MAX:
        _ATTR_CACHE[blob] = attrs
    return attrs


def parse_html(source: str) -> Node:
    root = Node("#root", {}, None)
    root.content_start = 0
    root.content_end = len(source)
    stack = [root]
    pos = 0
    n = len(source)
    while pos < n:
        m = _TOKEN_RE.search(source, pos)
        cut = m.start() if m else n
        if cut > pos:
            text = source[pos:cut]
            if "&" in text:
                text = _unescape(text)
            stack[-1].text_data.append((pos, text))
        if m is None:
            break
        pos = m.end()
        tag = m.group("start")
        if tag is not None:
            tag = tag.lower()
            parent = stack[-1]
            node = Node(tag, _parse_attrs(m.group("attrs")), parent)
            node.child_index = len(parent.children) + 1
            parent.children.append(node)
            node.content_start = pos
            if tag in VOID_ELEMENTS or m.group("selfclose"):
                node.content_end = node.content_start
            elif tag in _CDATA_CLOSE:
                # raw-text element: no tags/charrefs inside (HTMLParser
                # set_cdata_mode) — one raw text node up to the close tag
                mc = _CDATA_CLOSE[tag].search(source, pos)
                end = mc.start() if mc else n
                if end > pos:
                    node.text_data.append((pos, source[pos:end]))
                node.content_end = end
                me = _TOKEN_RE.search(source, end)
                pos = me.end() if me else n
            else:
                stack.append(node)
            continue
        tag = m.group("end")
        if tag is not None:
            tag = tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    stack[i].content_end = m.start()
                    del stack[i:]
                    break
    return root


# --------------------------------------------------------------- selectors

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>\*|[a-zA-Z][\w-]*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:=(?P<q>["']?)(?P<val>[^\]"']*)(?P=q))?\]
  | :(?P<pseudo>first-child|last-child|nth-child\(\s*\d+\s*\))
    """,
    re.VERBOSE,
)


class Compound:
    __slots__ = ("tag", "id", "classes", "attrs", "pseudos")

    def __init__(self):
        self.tag: str | None = None
        self.id: str | None = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        self.pseudos: list[str] = []

    def matches(self, node: Node) -> bool:
        if node.tag[0] == "#":  # only synthetic roots carry a '#' tag
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            cls = node.class_set()
            if any(c not in cls for c in self.classes):
                return False
        for a, v in self.attrs:
            if a not in node.attrs:
                return False
            if v is not None and node.attrs.get(a) != v:
                return False
        for p in self.pseudos:
            if p == "first-child":
                if node.child_index != 1:
                    return False
            elif p == "last-child":
                if node.parent is None or node.child_index != len(node.parent.children):
                    return False
            elif p.startswith("nth-child"):
                n = int(re.search(r"\d+", p).group())  # type: ignore[union-attr]
                if node.child_index != n:
                    return False
        return True


def _parse_compound(s: str) -> Compound:
    c = Compound()
    pos = 0
    while pos < len(s):
        m = _SIMPLE_RE.match(s, pos)
        if not m:
            raise ValueError(f"unsupported selector part: {s[pos:]!r} in {s!r}")
        if m.group("tag"):
            c.tag = m.group("tag")
        elif m.group("id"):
            c.id = m.group("id")
        elif m.group("cls"):
            c.classes.append(m.group("cls"))
        elif m.group("attr"):
            c.attrs.append((m.group("attr"), m.group("val")))
        elif m.group("pseudo"):
            c.pseudos.append(m.group("pseudo"))
        pos = m.end()
    return c


@lru_cache(maxsize=512)
def _parse_selector(selector: str) -> list[list[tuple[str, Compound]]]:
    """→ list of comma-alternatives; each is [(combinator, compound), ...]
    where combinator is '' (first), ' ' (descendant) or '>' (child).
    Cached: the rule set re-applies the same handful of selectors to every
    page of a wave; callers never mutate the parsed structure."""
    groups = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            continue
        # normalize '>' spacing then split into tokens
        alt = re.sub(r"\s*>\s*", " > ", alt)
        tokens = alt.split()
        seq: list[tuple[str, Compound]] = []
        comb = ""
        for tok in tokens:
            if tok == ">":
                comb = ">"
                continue
            seq.append((comb, _parse_compound(tok)))
            comb = " "
        groups.append(seq)
    return groups


def _iter_descendants(node: Node):
    # iterative preorder (document order) — the recursive generator chain was
    # a measurable share of select() at wave scale (one resumption per node
    # per nesting level)
    stack = [iter(node.children)]
    while stack:
        for child in stack[-1]:
            yield child
            if child.children:
                stack.append(iter(child.children))
                break
        else:
            stack.pop()


def _matches_sequence_upward(node: Node, seq: list[tuple[str, Compound]], idx: int) -> bool:
    """node matches seq[idx]; check seq[:idx] against node's ancestry.

    Ancestry may extend beyond the search root — jQuery/cheerio `.find(sel)`
    restricts *candidates* to the subtree but matches combinators against the
    whole document's ancestry.
    """
    if idx == 0:
        return True
    need_comb = seq[idx][0]  # combinator between seq[idx-1] and seq[idx]
    prev_idx = idx - 1
    _, comp = seq[prev_idx]
    if need_comb == ">":
        p = node.parent
        if p is None:
            return False
        return comp.matches(p) and _matches_sequence_upward(p, seq, prev_idx)
    anc = node.parent
    while anc is not None:
        if comp.matches(anc) and _matches_sequence_upward(anc, seq, prev_idx):
            return True
        anc = anc.parent
    return False


def select(root: Node, selector: str) -> list[Node]:
    """cheerio $(root).find(selector): descendants of root matching selector,
    in document order, deduped."""
    groups = _parse_selector(selector)
    out: list[Node] = []
    seen: set[int] = set()
    for node in _iter_descendants(root):
        for seq in groups:
            _, comp = seq[-1]
            if comp.matches(node) and _matches_sequence_upward(node, seq, len(seq) - 1):
                if id(node) not in seen:
                    seen.add(id(node))
                    out.append(node)
                break
    return out

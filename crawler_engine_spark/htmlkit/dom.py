"""Pure-stdlib HTML DOM for the vectorized extraction kernel.

The container has no lxml/bs4, so this module provides a minimal DOM built on
``html.parser.HTMLParser`` with exactly the query surface the extraction
kernel needs.  The semantics deliberately mirror BeautifulSoup's
``html.parser`` tree builder where the reference relies on them
(reference: /root/reference/src/intelligent_web_extractor — e.g.
``strategies/structured_strategy.py:116`` parses with
``BeautifulSoup(html, 'html.parser')``):

* ``get_text(separator, strip)``    — bs4 ``Tag.get_text`` semantics: walk all
  descendant text nodes in document order (comments excluded), optionally
  ``str.strip`` each and drop empties, join with the separator.
* ``find_all`` / ``select``         — document-order matching of the small CSS
  subset the reference uses (tag, ``.class``, ``#id``, ``[attr]``,
  ``[attr=v]``, ``[attr*=v]``, compound simple selectors, and descendant
  combinator).
* ``decompose``                     — detach a subtree (used for DOM pruning,
  reference ``semantic_strategy.py:206-228``).
* multi-valued ``class`` attributes — ``get('class')`` returns a token list
  like bs4.

This is a from-scratch implementation: only the *observable behaviour* is
matched, none of the reference code is copied (the reference delegates all of
this to BeautifulSoup anyway).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Any, Callable, Iterator, List, Optional, Pattern, Sequence, Union

# HTML void elements never take children.
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Elements whose raw content html.parser delivers as CDATA text.
RAW_TEXT_ELEMENTS = frozenset({"script", "style"})

TEXT = "text"
COMMENT = "comment"
TAG = "tag"
ROOT = "root"


class Node:
    """One DOM node: an element, a text run, a comment, or the document root."""

    __slots__ = ("kind", "name", "attrs", "children", "parent", "data",
                 "_elems", "_classes")

    def __init__(
        self,
        kind: str,
        name: str = "",
        attrs: Optional[dict] = None,
        data: str = "",
    ) -> None:
        self.kind = kind
        self.name = name
        self.attrs = attrs or {}
        self.children: List[Node] = []
        self.parent: Optional[Node] = None
        self.data = data
        self._elems: Optional[List["Node"]] = None  # cached element order
        self._classes: Optional[List[str]] = None   # cached class tokens

    # ------------------------------------------------------------------ tree
    def _invalidate(self) -> None:
        """Clear cached element lists on this node and every ancestor —
        called on any tree mutation."""
        n: Optional[Node] = self
        while n is not None:
            n._elems = None
            n = n.parent

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)
        self._invalidate()

    def _append_fast(self, child: "Node") -> None:
        """Builder-only append: during initial parse no element-order caches
        exist anywhere in the tree, so the invalidation walk is skipped."""
        child.parent = self
        self.children.append(child)

    def decompose(self) -> None:
        """Detach this subtree from its parent (bs4 ``decompose`` analog)."""
        if self.parent is not None:
            parent = self.parent
            try:
                parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None
            parent._invalidate()

    def extract(self) -> "Node":
        """Detach and return this node (bs4 ``extract`` analog)."""
        self.decompose()
        return self

    def iter_elements(self) -> Iterator["Node"]:
        """All descendant element nodes in document order (excl. self).
        The list is cached; any append/decompose under this node invalidates
        the cache on the whole ancestor chain.

        SNAPSHOT SEMANTICS: the returned iterator walks the list as cached
        at call time — decomposing nodes *while iterating* keeps yielding
        the already-detached nodes (unlike a lazy generator, which would
        skip their subtrees).  All engine callers collect-then-mutate;
        new callers that mutate mid-iteration must materialize first and
        re-query after.  Likewise the per-node class-token cache assumes
        ``attrs['class']`` is never mutated in place — mutate via a fresh
        parse or new nodes."""
        if self._elems is None:
            out: List[Node] = []
            stack = list(reversed(self.children))
            while stack:
                node = stack.pop()
                if node.kind == TAG:
                    out.append(node)
                stack.extend(reversed(node.children))
            self._elems = out
        return iter(self._elems)

    def iter_strings(self, include_comments: bool = False) -> Iterator[str]:
        """All descendant text-node strings in document order."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if node.kind == TEXT:
                yield node.data
            elif node.kind == COMMENT and include_comments:
                yield node.data
            else:
                stack.extend(reversed(node.children))

    # ------------------------------------------------------------------ attrs
    def get(self, key: str, default: Any = None) -> Any:
        """bs4-style attribute access: ``class``/``rel`` are multi-valued
        (token lists), matching bs4's html.parser builder."""
        if key in ("class", "rel"):
            raw = self.attrs.get(key)
            if raw is None:
                return default
            return raw.split()
        return self.attrs.get(key, default)

    def __getitem__(self, key: str) -> Any:
        """bs4 ``tag['attr']`` access (KeyError when absent)."""
        if key not in self.attrs:
            raise KeyError(key)
        return self.get(key)

    def has_attr(self, key: str) -> bool:
        return key in self.attrs

    @property
    def classes(self) -> List[str]:
        if self._classes is None:
            self._classes = (self.attrs.get("class") or "").split()
        return self._classes

    # ------------------------------------------------------------------ text
    def get_text(self, separator: str = "", strip: bool = False) -> str:
        """bs4 ``get_text`` semantics (comments excluded)."""
        if strip:
            parts = [s.strip() for s in self.iter_strings()]
            parts = [s for s in parts if s]
        else:
            parts = list(self.iter_strings())
        return separator.join(parts)

    # ---------------------------------------------------------------- queries
    def find(self, names: Union[str, Sequence[str]], **kwargs: Any) -> Optional["Node"]:
        for node in self.find_all(names, **kwargs):
            return node
        return None

    def find_all(
        self,
        names: Union[str, Sequence[str], None] = None,
        class_: Optional[Pattern] = None,
        id: Optional[Pattern] = None,
        attrs: Optional[dict] = None,
        recursive: bool = True,
        string=None,
        **kw_attrs: Any,
    ) -> List["Node"]:
        """Document-order element search.

        ``class_`` / ``id`` accept compiled regexes with bs4 matching rules:
        a class regex matches if it searches any individual class token or the
        full space-joined attribute value.  ``string`` (bs4 text search)
        accepts a predicate over text-node strings and returns the matching
        TEXT nodes themselves (``.extract()``-able), as bs4 returns
        NavigableStrings.
        """
        if string is not None:
            found: List[Node] = []
            stack = list(reversed(self.children))
            while stack:
                node = stack.pop()
                if node.kind == TEXT:
                    if string(node.data):
                        found.append(node)
                else:
                    stack.extend(reversed(node.children))
            return found
        if isinstance(names, str):
            name_set = {names}
        elif names is None:
            name_set = None
        else:
            name_set = set(names)

        candidates: Iterator[Node]
        if recursive:
            candidates = self.iter_elements()
        else:
            candidates = (c for c in self.children if c.kind == TAG)

        out: List[Node] = []
        for node in candidates:
            if name_set is not None and node.name not in name_set:
                continue
            if class_ is not None:
                raw = node.attrs.get("class")
                if raw is None:
                    continue
                tokens = raw.split()
                if not (
                    any(class_.search(t) for t in tokens) or class_.search(raw)
                ):
                    continue
            if id is not None:
                raw_id = node.attrs.get("id")
                if raw_id is None or not id.search(raw_id):
                    continue
            if attrs:
                ok = True
                for k, v in attrs.items():
                    if node.attrs.get(k) != v:
                        ok = False
                        break
                if not ok:
                    continue
            if kw_attrs:
                # bs4 keyword-attr filters: True = presence, compiled regex =
                # .search on the raw value, str = equality.
                ok = True
                for k, v in kw_attrs.items():
                    raw_v = node.attrs.get(k)
                    if v is True:
                        if k not in node.attrs:
                            ok = False
                            break
                    elif hasattr(v, "search"):
                        if raw_v is None or not v.search(raw_v):
                            ok = False
                            break
                    elif raw_v != v:
                        ok = False
                        break
                if not ok:
                    continue
            out.append(node)
        return out

    def select(self, selector: str) -> List["Node"]:
        """Match a small CSS subset in document order.

        Supported: ``tag``, ``.cls``, ``#id``, ``[attr]``, ``[attr=v]``,
        ``[attr*=v]``, ``[attr^=v]``, ``[attr$=v]``, compounds of those, the
        descendant combinator, and comma-separated groups.  ``[class*=v]``
        matches the raw attribute string (CSS semantics), while ``.cls``
        matches a class token (also CSS semantics) — the reference depends on
        both (``semantic_strategy.py:222-228``, ``rule_based_strategy.py:83``).
        """
        matched: List[Node] = []
        seen: set = set()
        for group in selector.split(","):
            chain = _chain_cached(group.strip())
            if not chain:
                continue
            for node in self.iter_elements():
                if _matches_chain(node, chain) and id(node) not in seen:
                    seen.add(id(node))
                    matched.append(node)
        if "," in selector:
            # Regroup into document order across the union.
            order = {id(n): i for i, n in enumerate(self.iter_elements())}
            matched.sort(key=lambda n: order.get(id(n), -1))
        return matched

    def select_one(self, selector: str) -> Optional["Node"]:
        res = self.select(selector)
        return res[0] if res else None

    def select_multi(self, selectors: Sequence[str]) -> List[List["Node"]]:
        """Evaluate many selectors in ONE tree traversal.

        Returns one document-ordered match list per selector.  Equivalent to
        ``[self.select(s) for s in selectors]`` (for the supported grammar)
        but walks the tree once — the extraction kernel's hot path runs
        dozens of selectors per page.
        """
        chains = [_chain_cached(s) for s in selectors]
        results: List[List[Node]] = [[] for _ in selectors]
        # Bucket selectors by the target tag of their last simple selector so
        # each node only tests selectors that could match it; selectors whose
        # conditions all require attributes are skipped outright on
        # attribute-less nodes (the common case in article bodies).
        by_tag: dict = {}
        universal: list = []
        for k, chain in enumerate(chains):
            if not chain:
                continue
            simple = chain[0] if len(chain) == 1 else None
            last = simple if simple is not None else chain[-1]
            item = (k, chain, simple, bool(last[1]))
            if last[0]:
                by_tag.setdefault(last[0], []).append(item)
            else:
                universal.append(item)
        empty: tuple = ()
        for node in self.iter_elements():
            has_attrs = bool(node.attrs)
            for bucket in (by_tag.get(node.name, empty), universal):
                for k, chain, simple, needs_attrs in bucket:
                    if needs_attrs and not has_attrs:
                        continue
                    if simple is not None:
                        if _matches_simple(node, simple):
                            results[k].append(node)
                    elif _matches_chain(node, chain):
                        results[k].append(node)
        return results

    # ------------------------------------------------------------------ repr
    def __repr__(self) -> str:  # pragma: no cover
        if self.kind == TAG:
            return f"<Node {self.name} attrs={self.attrs}>"
        return f"<Node {self.kind} {self.data[:30]!r}>"


_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)?
    (?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)
    """,
    re.VERBOSE,
)
_PART_RE = re.compile(r"([.#][\w-]+|\[[^\]]+\])")
_ATTR_RE = re.compile(
    r"\[\s*([\w-]+)\s*(?:([*^$]?=)\s*(?:'([^']*)'|\"([^\"]*)\"|([^\]\s]+)))?\s*\]"
)


def _parse_simple(token: str):
    m = _SIMPLE_RE.match(token)
    if not m or (m.end() != len(token)):
        return None
    tag = m.group("tag")
    conds = []
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            conds.append(("class", part[1:]))
        elif part.startswith("#"):
            conds.append(("id", part[1:]))
        else:
            am = _ATTR_RE.match(part)
            if not am:
                return None
            attr, op, v1, v2, v3 = am.groups()
            val = v1 if v1 is not None else (v2 if v2 is not None else v3)
            if op is None:
                conds.append(("attr-present", attr))
            else:
                conds.append(("attr", (attr, op, val or "")))
    return (None if tag in (None, "*", "") else tag.lower(), conds)


def _parse_selector_chain(selector: str):
    """Parse a descendant chain ``a b c`` into a list of simple selectors."""
    chain = []
    for token in selector.split():
        simple = _parse_simple(token)
        if simple is None:
            return []
        chain.append(simple)
    return chain


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=512)
def _chain_cached(selector: str):
    return _parse_selector_chain(selector.strip())


def _matches_simple(node: Node, simple) -> bool:
    tag, conds = simple
    if tag is not None and node.name != tag:
        return False
    for kind, payload in conds:
        if kind == "class":
            if payload not in node.classes:
                return False
        elif kind == "id":
            if node.attrs.get("id") != payload:
                return False
        elif kind == "attr-present":
            if payload not in node.attrs:
                return False
        elif kind == "attr":
            attr, op, val = payload
            raw = node.attrs.get(attr)
            if raw is None:
                return False
            if op == "=" and raw != val:
                return False
            if op == "*=" and val not in raw:
                return False
            if op == "^=" and not raw.startswith(val):
                return False
            if op == "$=" and not raw.endswith(val):
                return False
    return True


def _matches_chain(node: Node, chain) -> bool:
    if not _matches_simple(node, chain[-1]):
        return False
    remaining = chain[:-1]
    current = node.parent
    idx = len(remaining) - 1
    while idx >= 0 and current is not None:
        if current.kind == TAG and _matches_simple(current, remaining[idx]):
            idx -= 1
        current = current.parent
    return idx < 0


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(ROOT)
        self.stack: List[Node] = [self.root]

    # html.parser delivers lowercased tag names already.
    def handle_starttag(self, tag: str, attrs) -> None:
        node = Node(TAG, name=tag, attrs=dict(attrs))
        # Normalise None attribute values (bare attributes) to "".
        for k, v in node.attrs.items():
            if v is None:
                node.attrs[k] = ""
        self.stack[-1]._append_fast(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs) -> None:
        node = Node(TAG, name=tag, attrs=dict(attrs))
        for k, v in node.attrs.items():
            if v is None:
                node.attrs[k] = ""
        self.stack[-1]._append_fast(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # Pop to the nearest matching open tag; ignore unmatched end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1]._append_fast(Node(TEXT, data=data))

    def handle_comment(self, data: str) -> None:
        self.stack[-1]._append_fast(Node(COMMENT, data=data))

    def handle_decl(self, decl: str) -> None:  # <!DOCTYPE html> — ignore
        pass


def parse(html: str) -> Node:
    """Parse an HTML string into a document root node."""
    builder = _TreeBuilder()
    try:
        builder.feed(html or "")
        builder.close()
    except Exception:
        # Malformed input: keep whatever tree was built so far (bs4's
        # html.parser builder is similarly permissive).
        pass
    return builder.root


# Block-level elements for the innerText approximation used by the adaptive
# kernel (the reference evaluates ``document.body.innerText`` in the browser,
# ``strategies/adaptive_strategy.py:544``; all downstream uses collapse
# whitespace, so only word boundaries must be right, not exact line breaks).
_BLOCK_ELEMENTS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "caption", "dd",
        "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
        "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "html",
        "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
        "td", "tfoot", "th", "thead", "tr", "ul", "br",
    }
)
_INNERTEXT_SKIP = frozenset({"script", "style", "noscript", "template", "head"})


def inner_text(node: Node) -> str:
    """Deterministic ``innerText`` approximation: skip non-rendered elements,
    emit newlines at block boundaries.  Hidden-by-style elements
    (``display:none`` / ``visibility:hidden`` inline styles) are skipped."""
    out: List[str] = []

    def walk(n: Node) -> None:
        if n.kind == TEXT:
            out.append(n.data)
            return
        if n.kind != TAG and n.kind != ROOT:
            return
        if n.kind == TAG:
            if n.name in _INNERTEXT_SKIP:
                return
            style = (n.attrs.get("style") or "").replace(" ", "").lower()
            if "display:none" in style or "visibility:hidden" in style:
                return
            if n.name in _BLOCK_ELEMENTS:
                out.append("\n")
        for c in n.children:
            walk(c)
        if n.kind == TAG and n.name in _BLOCK_ELEMENTS:
            out.append("\n")

    walk(node)
    return "".join(out)

"""HTML link extraction and minimal CSS-selector existence checks.

Reference semantics (J/services/CrawlingTaskCallable.java:86-106):

- candidate elements: ``a[href]`` union ``link[href]``
- elements whose ``rel`` attribute equals ``nofollow`` are skipped
- hrefs are absolutized against the page URL (Jsoup ``absUrl`` with
  ``setBaseUri(task.url)``, CrawlingTaskCallable.java:52-53)
- only ``http://`` / ``https://`` links are kept (``isValidLink``, :86-90)
- per-page set-dedup; the reference's HashSet order is unspecified, the
  rebuild PINS document order / first occurrence (SURVEY.md M6) so the crawl
  is deterministic.

No HTML parser library ships in this environment; extraction is a compiled
regex scan over the tag stream (with ``<!-- comments -->`` and
``<script>``/``<style>`` bodies stripped first, matching Jsoup's behavior
of not surfacing links from either), which covers the deterministic HTML
the synthetic web emits (FIXTURES.md §2) and ordinary well-formed pages.

``css_select_exists`` supports the Jsoup selector shapes reference configs
use for ``validationSelectors`` / ``CONTAINSELEMENT``
(J/services/ContentValidator.java:29-47): compound simple selectors
(``tag``/``*``, ``.class``, ``#id``, ``[attr]``, ``[attr=v]``,
``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]``, and Jsoup's
``[attr~=regex]`` — a REGEX match, not the CSS word list), descendant
(space) and child (``>``) combinators, ``,`` selector groups, and the two
Jsoup pseudo-classes real validation configs use: ``:contains(text)``
(case-insensitive match against the element's own+descendant normalized
text, org.jsoup.select.Evaluator$ContainsText), ``:has(selector)``
(element with a matching descendant; the inner selector may use the full
supported grammar except further parenthesized pseudo-classes) and
``:nth-child(an+b | odd | even | k)`` (1-based sibling index,
org.jsoup.select.QueryParser#cssNthElement). Selectors
without pseudo-classes run on the streaming single-pass matcher;
pseudo-class selectors build a lightweight DOM tree (validation pages are
small — the tree path is per-selector opt-in). Remaining unsupported
syntax (``:first-of-type`` etc.) is handled gracefully: logged once per
selector and treated as not-matching — never raised, so an exotic config
selector cannot crash the fetch stage mid-crawl.
"""

from __future__ import annotations

import logging
import re
from urllib.parse import urljoin

logger = logging.getLogger(__name__)

_LINK_TAG = re.compile(r"<(a|link)\b([^>]*)>", re.IGNORECASE | re.DOTALL)
_ATTR = re.compile(
    r"""([A-Za-z][A-Za-z0-9_-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.DOTALL,
)
_STRIP_BLOCKS = re.compile(
    r"<!--.*?-->|<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>",
    re.IGNORECASE | re.DOTALL,
)


def _clean_html(html: str) -> str:
    """Drop comments and script/style bodies so neither link extraction nor
    selector matching sees markup a DOM parser would treat as text."""
    return _STRIP_BLOCKS.sub("", html)


def _attrs(tag_body: str) -> dict[str, str]:
    out = {}
    for m in _ATTR.finditer(tag_body):
        val = m.group(3)
        if val is None:
            val = m.group(4)
        if val is None:
            val = m.group(5)
        out[m.group(1).lower()] = val
    return out


def extract_links(html: str, base_url: str, pre_cleaned: bool = False) -> list[str]:
    """Absolute http(s) outlinks in document order, first occurrence only.
    ``pre_cleaned=True`` skips comment/script stripping when the caller
    already ran `_clean_html` (fetch_outcome cleans once per page)."""
    seen = set()
    out = []
    for m in _LINK_TAG.finditer(html if pre_cleaned else _clean_html(html)):
        attrs = _attrs(m.group(2))
        href = attrs.get("href")
        if href is None:
            continue
        if attrs.get("rel") == "nofollow":
            continue
        absolute = urljoin(base_url, href.strip()).strip()
        if not (absolute.startswith("http://") or absolute.startswith("https://")):
            continue
        if absolute in seen:
            continue
        seen.add(absolute)
        out.append(absolute)
    return out


# --------------------------------------------------- CSS selector engine

# HTML void elements never take children (no close tag expected)
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_ANY_TAG = re.compile(r"<(/?)([A-Za-z][A-Za-z0-9-]*)([^>]*)>", re.DOTALL)

# one compound simple-selector: tag/* then any number of
# .cls #id [attr...] :pseudo(arg)
_COMPOUND = re.compile(
    r"(?P<tag>[A-Za-z][A-Za-z0-9-]*|\*)?"
    r"(?P<rest>(?:\.[A-Za-z0-9_-]+|#[A-Za-z0-9_-]+|\[[^\]]+\]"
    r"|:[A-Za-z-]+\([^()]*\))*)"
)
_SIMPLE = re.compile(
    r"\.(?P<cls>[A-Za-z0-9_-]+)"
    r"|#(?P<id>[A-Za-z0-9_-]+)"
    r"|\[\s*(?P<attr>[A-Za-z][A-Za-z0-9_-]*)\s*"
    r"(?:(?P<op>[~^$*]?=)\s*(?P<q>[\"']?)(?P<val>[^\]\"']*)(?P=q)\s*)?\]"
    r"|:(?P<pseudo>[A-Za-z-]+)\((?P<parg>[^()]*)\)"
)


def _is_self_closing(tag_body: str) -> bool:
    """True only when a trailing '/' is genuine XML-style self-closing —
    NOT when it is the last character of an unquoted attribute value
    (``<a href=https://x.test/>`` is an OPEN tag): parsed attributes are
    stripped first, so a value-consumed slash can't be mistaken for one."""
    b = tag_body.rstrip()
    if not b.endswith("/"):
        return False
    return _ATTR.sub("", b).rstrip().endswith("/")


class _UnsupportedSelector(Exception):
    pass


_NTH = re.compile(
    r"^\s*(?:(?P<odd>odd)|(?P<even>even)"
    r"|(?P<a>[+-]?\d*)n\s*(?:(?P<sign>[+-])\s*(?P<b>\d+))?"
    r"|(?P<k>[+-]?\d+))\s*$", re.IGNORECASE)


def _parse_nth(arg: str) -> tuple[int, int]:
    """`:nth-child` argument → (a, b) of the an+b CSS/Jsoup grammar
    (org.jsoup.select.QueryParser#cssNthElement): odd/even, bare k,
    and the full an+b form with optional signs and spaces."""
    m = _NTH.match(arg)
    if not m:
        raise _UnsupportedSelector(f":nth-child({arg})")
    if m.group("odd"):
        return 2, 1
    if m.group("even"):
        return 2, 0
    if m.group("k") is not None:
        return 0, int(m.group("k"))
    a_str = m.group("a")
    a = 1 if a_str in ("", "+") else (-1 if a_str == "-" else int(a_str))
    b = int(m.group("b")) if m.group("b") else 0
    if m.group("sign") == "-":
        b = -b
    return a, b


def _nth_matches(a: int, b: int, idx: int) -> bool:
    """1-based sibling index `idx` satisfies an+b for some integer n ≥ 0."""
    if a == 0:
        return idx == b
    n, rem = divmod(idx - b, a)
    return rem == 0 and n >= 0


def _parse_compound(src: str):
    m = _COMPOUND.fullmatch(src.strip())
    if not m or (m.group("tag") is None and not m.group("rest")):
        raise _UnsupportedSelector(src)
    preds = []
    tag = m.group("tag")
    if tag and tag != "*":
        preds.append(("tag", tag.lower(), None))
    pos = 0
    rest = m.group("rest") or ""
    while pos < len(rest):
        sm = _SIMPLE.match(rest, pos)
        if sm is None:
            raise _UnsupportedSelector(src)
        pos = sm.end()
        if sm.group("cls"):
            preds.append(("class", sm.group("cls"), None))
        elif sm.group("id"):
            preds.append(("id", sm.group("id"), None))
        elif sm.group("pseudo"):
            pseudo, arg = sm.group("pseudo").lower(), sm.group("parg")
            if pseudo == "contains":
                # Jsoup ContainsText: lowercase containment over the
                # element's normalized own+descendant text
                preds.append(("contains",
                              re.sub(r"\s+", " ", arg.strip().lower()), None))
            elif pseudo == "has":
                # inner selector: full grammar minus nested parens (the
                # tokenizer rejects those → unsupported, logged no-match)
                preds.append(("has", _parse_selector(arg), None))
            elif pseudo == "nth-child":
                preds.append(("nthchild", _parse_nth(arg), None))
            else:
                raise _UnsupportedSelector(src)
        else:
            op, val = sm.group("op"), sm.group("val")
            if op == "~=":
                # Jsoup semantics: [attr~=regex] is a REGEX match
                # (org.jsoup.select.Selector), not the CSS word list
                try:
                    val = re.compile(val)
                except re.error:
                    raise _UnsupportedSelector(src)
            preds.append(("attr", sm.group("attr").lower(), (op, val)))
    return preds


def _parse_selector(selector: str):
    """selector → list of alternatives; each alternative is a list of
    (combinator, compound-preds) right-to-left, combinator ∈ {'desc','child'}
    describing how the NEXT (leftward) compound relates."""
    alts = []
    for branch in selector.split(","):
        branch = branch.strip()
        if not branch:
            raise _UnsupportedSelector(selector)
        toks = _tokenize(branch)
        chain = []  # (compound, combinator-to-parent)
        expect_compound = True
        comb = None
        for t in toks:
            if t == ">":
                if expect_compound or comb is not None:
                    raise _UnsupportedSelector(selector)
                comb = "child"
            else:
                if not expect_compound and comb is None:
                    comb = "desc"
                chain.append((comb, _parse_compound(t)))
                comb = None
                expect_compound = False
        if comb is not None or not chain:
            raise _UnsupportedSelector(selector)
        alts.append(chain)
    return alts


_TOKEN = re.compile(r">|(?:[A-Za-z0-9*_.#-]|\[[^\]]*\]|:[A-Za-z-]+\([^()]*\))+")


def _tokenize(branch: str) -> list[str]:
    """Compound/combinator tokens; bracket groups may contain spaces and
    quotes. Any character not consumed by a token (e.g. ':', '+', '~'
    combinators) marks the selector unsupported."""
    toks, pos = [], 0
    for m in _TOKEN.finditer(branch):
        if branch[pos:m.start()].strip():
            raise _UnsupportedSelector(branch)
        toks.append(m.group())
        pos = m.end()
    if branch[pos:].strip():
        raise _UnsupportedSelector(branch)
    return toks


_SEL_CACHE: dict[str, object] = {}
_WARNED: set[str] = set()


def _compound_matches(preds, name: str, attrs: dict, node=None,
                      ctx: dict | None = None) -> bool:
    for kind, arg, extra in preds:
        if kind == "tag":
            if name != arg:
                return False
        elif kind == "class":
            if arg not in (attrs.get("class") or "").split():
                return False
        elif kind == "id":
            if attrs.get("id") != arg:
                return False
        elif kind == "contains":
            # tree path only (node is a _Node there, None when streaming)
            if node is None or arg not in _node_text(node):
                return False
        elif kind == "has":
            if node is None or not _subtree_exists(node, arg, ctx):
                return False
        elif kind == "nthchild":
            # tree path only: `idx` is the 1-based element index among
            # the parent's element children (roots count as siblings)
            if node is None or not _nth_matches(*arg, node.idx):
                return False
        else:  # attr
            val = attrs.get(arg)
            if val is None:
                return False
            op, want = extra
            if op is None:
                continue
            if op == "=" and val != want:
                return False
            if op == "^=" and not val.startswith(want):
                return False
            if op == "$=" and not val.endswith(want):
                return False
            if op == "*=" and want not in val:
                return False
            if op == "~=" and not want.search(val):  # Jsoup: regex match
                return False
    return True


def _chain_matches(chain, lineage, ctx: dict | None = None) -> bool:
    """lineage: [(name, attrs), ...] root→self. chain is right-to-left:
    chain[-1] must match lineage[-1]; walk leftward with child/descendant
    semantics (descendant backtracks over any ancestor depth)."""

    def rec(ci: int, li: int) -> bool:
        comb, preds = chain[ci]
        if not _compound_matches(preds, *lineage[li], ctx=ctx):
            return False
        if ci == 0:
            return True
        prev_comb = comb  # how chain[ci-1] relates to this element
        if prev_comb == "child":
            return li > 0 and rec(ci - 1, li - 1)
        return any(rec(ci - 1, aj) for aj in range(li - 1, -1, -1))

    return rec(len(chain) - 1, len(lineage) - 1)


class _Node:
    """Lightweight DOM node for the pseudo-class (tree) match path.
    `content` interleaves text chunks and child nodes in DOCUMENT order
    (so `:contains` sees text across child boundaries in reading order);
    `children` is the element-only view for structural walks."""

    __slots__ = ("name", "attrs", "children", "content", "_text", "idx")

    def __init__(self, name: str, attrs: dict):
        self.name = name
        self.attrs = attrs
        self.children: list[_Node] = []
        self.content: list = []  # str | _Node, document order
        self._text: str | None = None
        self.idx = 1  # 1-based element index among parent's children


def _node_text(node: _Node) -> str:
    """Normalized lowercase own+descendant text (Jsoup element.text()
    shape) in document order, memoized per node. Iterative walk —
    pathological nesting depth must not raise (the never-raises
    fetch-stage contract)."""
    if node._text is None:
        parts: list[str] = []
        stack = list(reversed(node.content))
        while stack:
            item = stack.pop()
            if isinstance(item, str):
                parts.append(item)
            else:
                stack.extend(reversed(item.content))
        node._text = re.sub(r"\s+", " ", " ".join(parts)).strip().lower()
    return node._text


def _build_tree(html: str) -> list[_Node]:
    roots: list[_Node] = []
    stack: list[_Node] = []
    pos = 0
    for m in _ANY_TAG.finditer(html):
        if stack and m.start() > pos:
            stack[-1].content.append(html[pos:m.start()])
        pos = m.end()
        closing, name, body = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            for j in range(len(stack) - 1, -1, -1):
                if stack[j].name == name:
                    del stack[j:]
                    break
            continue
        node = _Node(name, _attrs(body))
        if stack:
            stack[-1].children.append(node)
            stack[-1].content.append(node)
            node.idx = len(stack[-1].children)
        else:
            roots.append(node)
            node.idx = len(roots)
        if name not in _VOID and not _is_self_closing(body):
            stack.append(node)
    if stack and pos < len(html):
        stack[-1].content.append(html[pos:])
    return roots


def _walk_exists(siblings: list, alts, ctx: dict | None = None) -> bool:
    """Iterative document-order DFS: does any node under `siblings` match
    one of the selector chains? (Iterative so pathological nesting can't
    blow the recursion limit — the fetch stage must never raise.)"""
    lineage: list = []
    stack = [(n, 0) for n in reversed(siblings)]
    while stack:
        n, depth = stack.pop()
        del lineage[depth:]
        lineage.append((n.name, n.attrs, n))
        for chain in alts:
            if len(chain) <= len(lineage) and _chain_matches(chain, lineage,
                                                             ctx):
                return True
        stack.extend((c, depth + 1) for c in reversed(n.children))
    return False


def _has_matchmap(roots: list, alts) -> dict:
    """{id(node): True} for every node X whose STRICT subtree contains a
    full embedding of some chain in `alts` (Jsoup :has semantics) —
    computed in ONE pass instead of re-walking each candidate's subtree
    (which is O(n²) on pathological nesting).

    DP: for each node d and chain position ci, F(d, ci) = the DEEPEST
    possible depth of the chain's topmost element over embeddings of
    chain[0..ci] ending at d ('child' looks at the parent's F(ci-1),
    'desc' at the running ancestor max). An embedding lies inside X's
    strict subtree iff its topmost element is strictly deeper than X, so
    has(X) ⟺ max over X's children's subtrees of F(d, last) > depth(X).
    Inner selectors are purely structural (nested parenthesized
    pseudo-classes are rejected at parse time), so no recursion here."""
    NEG = -1
    m_per = [len(chain) for chain in alts]
    order: list = []          # preorder (node, depth)
    dfull: dict = {}          # id(node) -> max topmost depth of a full match
    # stacks aligned to the current path: per chain, per ci
    anc_F: list = []          # anc_F[t][j][ci]
    anc_run: list = []        # prefix max over path of F(·, ci)
    stack = [(n, 0) for n in reversed(roots)]
    while stack:
        n, t = stack.pop()
        del anc_F[t:], anc_run[t:]
        order.append((n, t))
        Fs, runs = [], []
        best_full = NEG
        for j, chain in enumerate(alts):
            m = m_per[j]
            Fv = [NEG] * m
            for ci in range(m):
                comb, preds = chain[ci]
                if not _compound_matches(preds, n.name, n.attrs):
                    continue
                if ci == 0:
                    Fv[0] = t
                elif chain[ci][0] == "child":
                    Fv[ci] = anc_F[t - 1][j][ci - 1] if t >= 1 else NEG
                else:  # descendant
                    Fv[ci] = anc_run[t - 1][j][ci - 1] if t >= 1 else NEG
            Fs.append(Fv)
            prev = anc_run[t - 1][j] if t >= 1 else [NEG] * m
            runs.append([max(a, b) for a, b in zip(prev, Fv)])
            if Fv[m - 1] > best_full:
                best_full = Fv[m - 1]
        anc_F.append(Fs)
        anc_run.append(runs)
        dfull[id(n)] = best_full
        stack.extend((c, t + 1) for c in reversed(n.children))
    # bottom-up subtree max (reversed preorder: children before parents)
    smax: dict = {}
    for n, _t in reversed(order):
        s = dfull[id(n)]
        for c in n.children:
            s = max(s, smax[id(c)])
        smax[id(n)] = s
    out: dict = {}
    for n, t in order:
        child_best = max((smax[id(c)] for c in n.children), default=NEG)
        if child_best > t:
            out[id(n)] = True
    return out


def _subtree_exists(node: _Node, alts, ctx: dict | None = None) -> bool:
    """Jsoup :has(sel): does any strict descendant of `node` match? The
    inner selector is scoped to the subtree — lineages are relative to
    (and exclude) `node` itself. Uses the precomputed per-document
    matchmap when available (linear), subtree walk otherwise."""
    if ctx is not None:
        cache = ctx.get(id(alts))
        if cache is not None:
            return id(node) in cache
    return _walk_exists(node.children, alts)


def _precompute_texts(roots: list) -> None:
    """Fill every node's `_text` in ONE bottom-up pass (children first via
    reversed preorder), reusing child caches — without this, matching
    `:contains` against each node of a deep chain recomputes overlapping
    subtree text, O(n²) on pathological nesting. Substituting a child's
    normalized text for its raw chunks is safe: the final collapse/strip/
    lower is idempotent over it."""
    order: list = []
    stack = list(roots)
    while stack:
        n = stack.pop()
        order.append(n)
        stack.extend(n.children)
    for n in reversed(order):  # every child precedes its parent here
        parts = [it if isinstance(it, str) else it._text for it in n.content]
        n._text = re.sub(r"\s+", " ", " ".join(parts)).strip().lower()


def _tree_exists(html: str, parsed) -> bool:
    roots = _build_tree(html)
    needs_text = False
    ctx: dict = {}
    for chain in parsed:
        for _comb, preds in chain:
            for kind, arg, _extra in preds:
                if kind == "contains":
                    needs_text = True
                elif kind == "has" and id(arg) not in ctx:
                    ctx[id(arg)] = _has_matchmap(roots, arg)
    if needs_text:
        _precompute_texts(roots)
    return _walk_exists(roots, parsed, ctx)


def _needs_tree(parsed) -> bool:
    return any(kind in ("contains", "has", "nthchild")
               for chain in parsed for _, preds in chain
               for kind, _a, _e in preds)


def css_select_exists(html: str, selector: str, pre_cleaned: bool = False) -> bool:
    """Jsoup-subset existence check (see module docstring for the grammar).
    Unsupported selectors log once and return False instead of raising —
    a config typo must not kill the fetch stage. ``pre_cleaned=True``
    skips the comment/script strip for callers that cleaned once."""
    parsed = _SEL_CACHE.get(selector)
    if parsed is None:
        try:
            parsed = _parse_selector(selector)
        except _UnsupportedSelector:
            parsed = "unsupported"
        _SEL_CACHE[selector] = parsed
    if parsed == "unsupported":
        if selector not in _WARNED:
            _WARNED.add(selector)
            logger.warning("unsupported CSS selector %r: treating as no-match",
                           selector)
        return False
    cleaned = html if pre_cleaned else _clean_html(html)
    if _needs_tree(parsed):
        # :contains/:has need subtree text/structure → DOM-tree path
        return _tree_exists(cleaned, parsed)
    # single pass over the tag stream with an open-element stack
    stack: list[tuple[str, dict]] = []
    for m in _ANY_TAG.finditer(cleaned):
        closing, name, body = m.group(1), m.group(2).lower(), m.group(3)
        if closing:
            for j in range(len(stack) - 1, -1, -1):
                if stack[j][0] == name:
                    del stack[j:]
                    break
            continue
        attrs = _attrs(body)
        lineage = stack + [(name, attrs)]
        for chain in parsed:
            if len(chain) <= len(lineage) and _chain_matches(chain, lineage):
                return True
        if name not in _VOID and not _is_self_closing(body):
            stack.append((name, attrs))
    return False

"""Generate the differential TREE-CONSTRUCTION conformance corpus.

Round-2 verdict asked the differential program (tokenizer families vs
independent mini-references) to grow into tree construction: the
engine's table modes, foreign content, active-formatting/adoption
agency, and (r3) template handling had hand goldens but no
independent-reference cross-check.  This generator closes that gap:

* inputs are built as TOKEN LISTS (never by parsing text), rendered to
  HTML for the engine;
* expected DOM outlines come from ``MiniParser`` — an independent
  WHATWG §13.2.6 subset transcription over recursive node OBJECTS
  (the engine uses flat arrays + a fused mode loop; this one is a
  direct pseudocode transcription with per-mode methods), written
  against the spec text, importing NOTHING from ``zhtml_spark``;
* a self-test in ``main()`` checks the mini parser against canonical
  misnesting/foster-parenting trees transcribed from the html5lib
  tree-construction docs before any case is written.

Families (≥500 cases): table structure matrix (sections / implied
tbody+tr / cell autoclose / caption / colgroup / foster parenting /
hidden input / nested tables), foreign content (case-fix tags,
integration points, breakout, CDATA, self-closing), adoption agency /
AFE reconstruction patterns, template placements, document-context
frameset/head, noscript under both scripting configs, and (r4,
family 7) foreign+template crossings: CDATA × position × payload over
all 8 integration points, the form pointer's template transparency,
select-in-template, and a 5×5 nested-template mode re-entry matrix.

Output: ``tests/fixtures/tree_conformance_generated.json``
(deterministic — re-running must be a git no-op).

Usage: python jobs/gen_tree_conformance.py
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "tree_conformance_generated.json",
)

# ---------------------------------------------------------------------
# spec data (WHATWG §13.2.6 — transcribed from the spec text, not from
# the engine; kept to the vocabulary the generated families use)

FORMATTING = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)
SPECIAL = frozenset(
    """address applet area article aside base basefont bgsound blockquote
    body br button caption center col colgroup dd details dir div dl dt
    embed fieldset figcaption figure footer form frame frameset h1 h2 h3
    h4 h5 h6 head header hgroup hr html iframe img input keygen li link
    listing main marquee menu meta nav noembed noframes noscript object
    ol p param plaintext pre script section select source style summary
    table tbody td template textarea tfoot th thead title tr track ul
    wbr xmp""".split()
)
DEFAULT_SCOPE = frozenset(
    "applet caption html table td th marquee object template".split()
)
BUTTON_SCOPE = DEFAULT_SCOPE | {"button"}
LIST_ITEM_SCOPE = DEFAULT_SCOPE | {"ol", "ul"}
TABLE_SCOPE = frozenset(["html", "table", "template"])
IMPLIED_END = frozenset("dd dt li option optgroup p rp rt".split())

# in-body start tags whose spec anchors set frameset-ok to "not ok"
# (independent transcription of §13.2.6.4.7; <input> conditional on
# type != hidden at the use site)
FRAMESET_NOT_OK_STARTS = frozenset(
    "pre listing li dd dt plaintext button applet marquee object xmp "
    "table area br embed img keygen wbr hr textarea iframe select".split()
)
IMPLIED_END_THOROUGH = IMPLIED_END | frozenset(
    "caption colgroup rb rtc tbody td tfoot th thead tr".split()
)
# in-body start tags the spec ignores outright ("caption, col,
# colgroup, frame, head, tbody, td, tfoot, th, thead, tr")
IN_BODY_IGNORED_STARTS = frozenset(
    "caption col colgroup frame head tbody td tfoot th thead tr".split()
)
CLOSES_P = frozenset(
    "p div ul ol blockquote h1 h2 h3 h4 h5 h6 pre".split()
)
HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
VOIDS = frozenset("br img input hr col".split())
FOSTER_CONTEXT = frozenset(["table", "tbody", "tfoot", "thead", "tr"])
BREAKOUT = frozenset(
    """b big blockquote body br center code dd div dl dt em embed h1 h2
    h3 h4 h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s
    small span strong strike sub sup table tt u ul var""".split()
)
MATHML_TEXT_IP = frozenset(["mi", "mo", "mn", "ms", "mtext"])
# foreign members of the spec "special"/scope-boundary lists
SVG_SPECIAL = frozenset(["foreignObject", "desc", "title"])
MATH_SPECIAL = MATHML_TEXT_IP | {"annotation-xml"}


def foreign_boundary(node) -> bool:
    if node.ns == "svg":
        return node.name in SVG_SPECIAL
    if node.ns == "math":
        return node.name in MATH_SPECIAL
    return False
# spec "adjust SVG attributes"/tag-name case table — the subset the
# generated foreign family uses (hand-typed from the spec table)
SVG_TAG_CASE = {
    "clippath": "clipPath",
    "foreignobject": "foreignObject",
    "lineargradient": "linearGradient",
    "textpath": "textPath",
    "fegaussianblur": "feGaussianBlur",
}

MARKER = ("marker",)


class N:
    """Recursive DOM node (deliberately unlike the engine's flat
    parallel arrays)."""

    __slots__ = ("kind", "name", "ns", "attrs", "kids", "parent", "data")

    def __init__(self, kind, name=None, ns=None, attrs=None, data=""):
        self.kind = kind  # "el" | "text"
        self.name = name
        self.ns = ns
        self.attrs = attrs or {}
        self.kids: list[N] = []
        self.parent: N | None = None
        self.data = data

    def append(self, child: "N") -> None:
        child.detach()
        child.parent = self
        self.kids.append(child)

    def insert_before(self, child: "N", ref: "N") -> None:
        child.detach()
        child.parent = self
        self.kids.insert(self.kids.index(ref), child)

    def detach(self) -> None:
        if self.parent is not None:
            self.parent.kids.remove(self)
            self.parent = None


def outline(node: N):
    """Nested-list serialization shared (by FORMAT, not code) with the
    replay test's engine-side serializer: element →
    ``[label, *children]``, text → ``"#" + data``."""
    if node.kind == "text":
        return "#" + node.data
    label = node.name if node.ns is None else f"{node.ns}:{node.name}"
    return [label] + [outline(k) for k in node.kids]


class MiniParser:
    """WHATWG §13.2.6 subset: InBody, the seven table modes,
    InTemplate, and the foreign-content dispatcher, with full active
    formatting (reconstruction + adoption agency).  Direct pseudocode
    transcription over ``N`` objects; vocabulary restricted to what the
    generator emits."""

    def __init__(self, document: bool = False, scripting: bool = True):
        """``document=False`` (the original harness): pre-built
        html/head/body skeleton, consuming body-context token streams.
        ``document=True``: only <html> exists; the head/body/frameset
        modes build the rest (frameset + head families).
        ``scripting`` mirrors the engine flag: True → noscript is
        generic rawtext; False → InHeadNoscript / markup children."""
        self.html = N("el", "html")
        self.document = document
        self.scripting = scripting
        if document:
            self.head: N | None = None
            self.body: N | None = None
            self.stack: list[N] = [self.html]
            self.mode = "before_head"
        else:
            self.head = N("el", "head")
            self.body = N("el", "body")
            self.html.append(self.head)
            self.html.append(self.body)
            self.stack = [self.html, self.body]
            self.mode = "in_body"
        self.afe: list = []
        self.tmodes: list[str] = []
        self.pending: list[str] = []
        self.pending_return = "in_table"
        self.foster = False
        self.form: N | None = None
        self.frameset_ok = True
        self.saw_frameset = False
        self.rawtext_return = "in_body"

    def finish(self) -> None:
        """EOF: imply the document skeleton (document mode only);
        frameset documents get no body."""
        if not self.document:
            return
        if self.head is None:
            self.head = N("el", "head")
            self.html.append(self.head)
        if self.body is None and not self.saw_frameset:
            self.body = N("el", "body")
            self.html.append(self.body)

    # ------------------------------------------------------- helpers
    def cur(self) -> N:
        return self.stack[-1]

    def _insert_point(self):
        """Appropriate place for inserting a node → (parent, before)."""
        target = self.cur()
        if self.foster and target.ns is None and target.name in FOSTER_CONTEXT:
            for node in reversed(self.stack):
                if node.ns is None and node.name == "table":
                    if node.parent is not None:
                        return node.parent, node
                    break
        return target, None

    def insert_el(self, name, attrs=None, ns=None) -> N:
        node = N("el", name, ns, attrs)
        parent, before = self._insert_point()
        if before is None:
            parent.append(node)
        else:
            parent.insert_before(node, before)
        self.stack.append(node)
        return node

    def insert_void(self, name, attrs=None, ns=None) -> N:
        node = self.insert_el(name, attrs, ns)
        self.stack.pop()
        return node

    def insert_text(self, data: str) -> None:
        if not data:
            # empty CDATA sections emit no character tokens — an empty
            # text node must never appear (family 7)
            return
        parent, before = self._insert_point()
        sibs = parent.kids
        idx = len(sibs) if before is None else sibs.index(before)
        if idx > 0 and sibs[idx - 1].kind == "text":
            sibs[idx - 1].data += data
            return
        node = N("text", data=data)
        node.data = data
        if before is None:
            parent.append(node)
        else:
            parent.insert_before(node, before)

    def template_on_stack(self) -> bool:
        return any(
            n.ns is None and n.name == "template" for n in self.stack
        )

    def node_in_scope(self, node: N, boundaries=DEFAULT_SCOPE) -> bool:
        """Spec "has NODE in scope" — identity, not name (the </form>
        no-template branch checks the POINTER's node)."""
        foreign_bounds = boundaries is not TABLE_SCOPE
        for n in reversed(self.stack):
            if n is node:
                return True
            if n.ns is None:
                if n.name in boundaries:
                    return False
            elif foreign_bounds and foreign_boundary(n):
                return False
        return False

    def in_scope(self, name, boundaries=DEFAULT_SCOPE) -> bool:
        # spec "specific scope": foreign integration points are scope
        # boundaries EXCEPT for table scope (html/table/template only)
        foreign_bounds = boundaries is not TABLE_SCOPE
        for node in reversed(self.stack):
            if node.ns is None:
                if node.name == name:
                    return True
                if node.name in boundaries:
                    return False
            elif foreign_bounds and foreign_boundary(node):
                return False
        return False

    def pop_until(self, name) -> None:
        while self.stack:
            node = self.stack.pop()
            if node.ns is None and node.name == name:
                return

    def implied_end(self, except_name=None, thorough=False) -> None:
        names = IMPLIED_END_THOROUGH if thorough else IMPLIED_END
        while (
            self.stack
            and self.cur().ns is None
            and self.cur().name in names
            and self.cur().name != except_name
        ):
            self.stack.pop()

    def close_p(self) -> None:
        if self.in_scope("p", BUTTON_SCOPE):
            self.implied_end("p")
            self.pop_until("p")

    # -------------------------------------------- active formatting
    def reconstruct_afe(self) -> None:
        if not self.afe:
            return
        entry = self.afe[-1]
        if entry is MARKER or entry[1] in self.stack:
            return
        i = len(self.afe) - 1
        while i > 0:
            prev = self.afe[i - 1]
            if prev is MARKER or prev[1] in self.stack:
                break
            i -= 1
        for j in range(i, len(self.afe)):
            name, _old, attrs = self.afe[j]
            node = self.insert_el(name, dict(attrs))
            self.afe[j] = [name, node, attrs]

    def clear_afe_to_marker(self) -> None:
        while self.afe:
            if self.afe.pop() is MARKER:
                return

    def adoption_agency(self, subject: str) -> None:
        cur = self.cur()
        if (
            cur.ns is None
            and cur.name == subject
            and not any(
                e is not MARKER and e[1] is cur for e in self.afe
            )
        ):
            self.stack.pop()
            return
        for _ in range(8):
            fmt = None
            for e in reversed(self.afe):
                if e is MARKER:
                    break
                if e[0] == subject:
                    fmt = e
                    break
            if fmt is None:
                self.any_other_end_tag(subject)
                return
            if fmt[1] not in self.stack:
                self.afe.remove(fmt)
                return
            in_scope = False
            for node in reversed(self.stack):
                if node is fmt[1]:
                    in_scope = True
                    break
                if node.ns is None and node.name in DEFAULT_SCOPE:
                    break
                if foreign_boundary(node):
                    break
            if not in_scope:
                return
            fmt_idx = self.stack.index(fmt[1])
            fb_idx = -1
            for idx in range(fmt_idx + 1, len(self.stack)):
                node = self.stack[idx]
                if node.ns is None and node.name in SPECIAL:
                    fb_idx = idx
                    break
            if fb_idx == -1:
                del self.stack[fmt_idx:]
                self.afe.remove(fmt)
                return
            furthest = self.stack[fb_idx]
            common = self.stack[fmt_idx - 1]
            bookmark = self.afe.index(fmt)
            node_idx = fb_idx
            last_node = furthest
            inner = 0
            while True:
                inner += 1
                node_idx -= 1
                node = self.stack[node_idx]
                if node is fmt[1]:
                    break
                ai = next(
                    (
                        i
                        for i, e in enumerate(self.afe)
                        if e is not MARKER and e[1] is node
                    ),
                    -1,
                )
                if inner > 3 and ai != -1:
                    del self.afe[ai]
                    if ai < bookmark:
                        bookmark -= 1
                    ai = -1
                if ai == -1:
                    del self.stack[node_idx]
                    continue
                entry = self.afe[ai]
                clone = N("el", entry[0], None, dict(entry[2]))
                entry[1] = clone
                self.stack[node_idx] = clone
                if last_node is furthest:
                    bookmark = ai + 1
                clone.append(last_node)
                last_node = clone
            common_parent, before = (
                (common.parent, common)
                if common.ns is None and common.name in FOSTER_CONTEXT
                else (None, None)
            )
            if common_parent is not None:
                # spec: insert at the appropriate place with common
                # ancestor as override target (foster parenting)
                for node in reversed(self.stack):
                    if node.ns is None and node.name == "table":
                        node.parent.insert_before(last_node, node)
                        break
                else:
                    common.append(last_node)
            else:
                common.append(last_node)
            clone2 = N("el", fmt[0], None, dict(fmt[2]))
            for kid in list(furthest.kids):
                clone2.append(kid)
            furthest.append(clone2)
            fmt_pos = self.afe.index(fmt)
            self.afe.remove(fmt)
            if fmt_pos < bookmark:
                bookmark -= 1
            self.afe.insert(bookmark, [fmt[0], clone2, fmt[2]])
            self.stack.remove(fmt[1])
            self.stack.insert(self.stack.index(furthest) + 1, clone2)

    def any_other_end_tag(self, name: str) -> None:
        for idx in range(len(self.stack) - 1, -1, -1):
            node = self.stack[idx]
            if node.ns is None:
                if node.name == name:
                    self.implied_end(name)
                    del self.stack[idx:]
                    return
                if node.name in SPECIAL:
                    return
            elif foreign_boundary(node):
                # foreign IPs are in the spec special category
                return

    # ---------------------------------------------------- templates
    def start_template(self, attrs=None) -> None:
        self.insert_el("template", attrs)
        self.afe.append(MARKER)
        self.tmodes.append("in_template")
        self.mode = "in_template"

    def end_template(self) -> None:
        if not any(
            n.ns is None and n.name == "template" for n in self.stack
        ):
            return
        self.implied_end(thorough=True)
        self.pop_until("template")
        self.clear_afe_to_marker()
        if self.tmodes:
            self.tmodes.pop()
        self.mode = self.reset_mode()

    def reset_mode(self) -> str:
        for idx in range(len(self.stack) - 1, -1, -1):
            node = self.stack[idx]
            if node.ns is not None:
                continue
            nm = node.name
            if nm == "select":
                # spec ancestor loop: a template between select and
                # table terminates the scan (-> in_select)
                for j in range(idx - 1, -1, -1):
                    inner = self.stack[j]
                    if inner.ns is not None:
                        continue
                    if inner.name == "template":
                        break
                    if inner.name == "table":
                        return "in_select_in_table"
                return "in_select"
            if nm in ("td", "th"):
                return "in_cell"
            if nm == "tr":
                return "in_row"
            if nm in ("tbody", "thead", "tfoot"):
                return "in_table_body"
            if nm == "caption":
                return "in_caption"
            if nm == "colgroup":
                return "in_column_group"
            if nm == "table":
                return "in_table"
            if nm == "template":
                return self.tmodes[-1] if self.tmodes else "in_body"
            if nm == "head":
                return "in_head"
            if nm == "frameset":
                return "in_frameset"
        return "in_body"

    # -------------------------------------------- foreign dispatcher
    def _is_html_ip(self, node: N) -> bool:
        if node.ns == "math" and node.name == "annotation-xml":
            enc = (node.attrs.get("encoding") or "").lower()
            return enc in ("text/html", "application/xhtml+xml")
        return node.ns == "svg" and node.name in (
            "foreignObject", "desc", "title",
        )

    def _use_foreign(self, t) -> bool:
        cur = self.cur()
        if cur.ns is None:
            return False
        kind = t[0]
        if cur.ns == "math" and cur.name in MATHML_TEXT_IP:
            if kind in ("text", "cdata"):
                return False
            if kind == "start" and t[1] not in ("mglyph", "malignmark"):
                return False
        if (
            cur.ns == "math"
            and cur.name == "annotation-xml"
            and kind == "start"
            and t[1] == "svg"
        ):
            return False
        if self._is_html_ip(cur) and kind in ("start", "text", "cdata"):
            return False
        return True

    def _foreign(self, t) -> None:
        kind = t[0]
        if kind in ("text", "cdata"):
            self.insert_text(t[1])
            return
        if kind == "start":
            name, attrs, selfclose = t[1], t[2], t[3]
            if name in BREAKOUT or (
                name == "font"
                and any(k in attrs for k in ("color", "face", "size"))
            ):
                while self.cur().ns is not None:
                    cur = self.cur()
                    if (
                        cur.ns == "math" and cur.name in MATHML_TEXT_IP
                    ) or self._is_html_ip(cur):
                        break
                    self.stack.pop()
                self.process(t)
                return
            ns = self.cur().ns
            if ns == "svg":
                name = SVG_TAG_CASE.get(name, name)
            self.insert_el(name, attrs, ns=ns)
            if selfclose:
                self.stack.pop()
            return
        if kind == "end":
            name = t[1]
            if name in ("br", "p"):
                while self.cur().ns is not None:
                    cur = self.cur()
                    if (
                        cur.ns == "math" and cur.name in MATHML_TEXT_IP
                    ) or self._is_html_ip(cur):
                        break
                    self.stack.pop()
                self.dispatch_mode(t)
                return
            for idx in range(len(self.stack) - 1, -1, -1):
                node = self.stack[idx]
                if node.ns is None:
                    self.dispatch_mode(t)
                    return
                if (node.name or "").lower() == name:
                    del self.stack[idx:]
                    return

    # -------------------------------------------------------- modes
    def process(self, t) -> None:
        if self._use_foreign(t):
            self._foreign(t)
        else:
            self.dispatch_mode(t)

    def dispatch_mode(self, t) -> None:
        getattr(self, "m_" + self.mode)(t)

    # ------------------------- document head / frameset modes (r3)
    # Independent spec transcriptions for the document-context corpus
    # (BeforeHead/InHead/AfterHead subsets + the frameset trio and the
    # frameset-ok flag).  Vocabulary: generator emits no comments or
    # doctype tokens, and rawtext families carry tag-free text only.
    _WSC = "\t\n\f \r"

    def m_before_head(self, t) -> None:
        if t[0] == "text":
            rest = t[1].lstrip(self._WSC)
            if not rest:
                return  # leading whitespace ignored
            t = ("text", rest)
        elif t[0] == "start" and t[1] == "head":
            self.head = self.insert_el("head", t[2])
            self.mode = "in_head"
            return
        # anything else: implied <head>, reprocess in InHead
        self.head = self.insert_el("head", {})
        self.mode = "in_head"
        self.dispatch_mode(t)

    def m_in_head(self, t) -> None:
        if t[0] == "text":
            n_ws = len(t[1]) - len(t[1].lstrip(self._WSC))
            if n_ws:
                self.insert_text(t[1][:n_ws])
            rest = t[1][n_ws:]
            if not rest:
                return
            t = ("text", rest)
        elif t[0] == "start":
            name = t[1]
            if name in ("base", "basefont", "bgsound", "link", "meta"):
                self.insert_void(name, t[2])
                return
            if name in ("title", "style", "script", "noframes"):
                self.insert_el(name, t[2])
                self.rawtext_return = "in_head"
                self.mode = "rawtext"
                return
            if name == "template":
                self.start_template(t[2])
                return
            if name == "noscript":
                self.insert_el(name, t[2])
                if self.scripting:
                    self.rawtext_return = "in_head"
                    self.mode = "rawtext"
                else:
                    self.mode = "in_head_noscript"
                return
            if name == "head":
                return  # parse error, ignore
        elif t[0] == "end":
            if t[1] == "head":
                self.stack.pop()
                self.mode = "after_head"
                return
            if t[1] == "template":
                self.end_template()
                return
            if t[1] not in ("body", "html", "br"):
                return  # parse error, ignore
        self.stack.pop()  # pop head; reprocess in after_head
        self.mode = "after_head"
        self.dispatch_mode(t)

    def m_after_head(self, t) -> None:
        if t[0] == "text":
            n_ws = len(t[1]) - len(t[1].lstrip(self._WSC))
            if n_ws:
                self.insert_text(t[1][:n_ws])
            rest = t[1][n_ws:]
            if not rest:
                return
            t = ("text", rest)
        elif t[0] == "start":
            name = t[1]
            if name == "body":
                self.body = self.insert_el("body", t[2])
                self.frameset_ok = False  # spec: explicit <body>
                self.mode = "in_body"
                return
            if name == "frameset":
                self.insert_el("frameset", t[2])
                self.saw_frameset = True
                self.mode = "in_frameset"
                return
        elif t[0] == "end" and t[1] not in ("body", "html", "br"):
            return  # parse error, ignore
        self.body = self.insert_el("body", {})
        self.mode = "in_body"
        self.dispatch_mode(t)

    def m_in_head_noscript(self, t) -> None:
        # spec §13.2.6.4.5 (scripting=False only)
        if t[0] == "text":
            n_ws = len(t[1]) - len(t[1].lstrip(self._WSC))
            if n_ws:
                self.insert_text(t[1][:n_ws])
            rest = t[1][n_ws:]
            if not rest:
                return
            t = ("text", rest)
        elif t[0] == "start":
            name = t[1]
            if name in ("basefont", "bgsound", "link", "meta"):
                self.insert_void(name, t[2])
                return
            if name in ("style", "noframes"):
                self.insert_el(name, t[2])
                self.rawtext_return = "in_head_noscript"
                self.mode = "rawtext"
                return
            if name in ("head", "noscript"):
                return  # parse error, ignore
        elif t[0] == "end":
            if t[1] == "noscript":
                self.stack.pop()
                self.mode = "in_head"
                return
            if t[1] != "br":
                return  # parse error, ignore
        # anything else (incl. </br>): pop noscript, reprocess InHead
        self.stack.pop()
        self.mode = "in_head"
        self.dispatch_mode(t)

    def m_rawtext(self, t) -> None:
        # generic raw text: the generator guarantees tag-free text, so
        # the engine's retokenized rawtext equals these text tokens
        if t[0] == "text":
            self.insert_text(t[1])
            return
        if t[0] == "end":
            self.stack.pop()
            self.mode = self.rawtext_return
            return
        raise AssertionError("rawtext families must contain only text")

    def m_in_frameset(self, t) -> None:
        if t[0] == "text":
            ws = "".join(c for c in t[1] if c in self._WSC)
            if ws:  # spec: keep only the whitespace characters
                self.insert_text(ws)
            return
        if t[0] == "start":
            name = t[1]
            if name == "frameset":
                self.insert_el(name, t[2])
            elif name == "frame":
                self.insert_void(name, t[2])
            elif name == "noframes":
                self.insert_el(name, t[2])
                self.rawtext_return = "in_frameset"
                self.mode = "rawtext"
            return  # anything else: parse error, ignore
        if t[0] == "end" and t[1] == "frameset":
            if self.cur() is self.html:
                return  # fragment-root guard
            self.stack.pop()
            if not (self.cur().ns is None and self.cur().name == "frameset"):
                self.mode = "after_frameset"

    def m_after_frameset(self, t) -> None:
        if t[0] == "text":
            ws = "".join(c for c in t[1] if c in self._WSC)
            if ws:
                self.insert_text(ws)
            return
        if t[0] == "start" and t[1] == "noframes":
            self.insert_el("noframes", t[2])
            self.rawtext_return = "after_frameset"
            self.mode = "rawtext"
            return
        if t[0] == "end" and t[1] == "html":
            self.mode = "after_after_frameset"

    def m_after_after_frameset(self, t) -> None:
        if t[0] == "start" and t[1] == "noframes":
            self.insert_el("noframes", t[2])
            self.rawtext_return = "after_after_frameset"
            self.mode = "rawtext"
        # everything else ignored (ws placement skipped — engine parity)

    def m_in_body(self, t) -> None:
        kind = t[0]
        # frameset-ok bookkeeping (spec sets the flag inside each
        # anchor; the per-token net effect is identical)
        if self.frameset_ok:
            if kind in ("text", "cdata"):
                if t[1].strip(self._WSC):
                    self.frameset_ok = False
            elif kind == "start":
                if t[1] in FRAMESET_NOT_OK_STARTS or (
                    t[1] == "input"
                    and (t[2] or {}).get("type", "").lower() != "hidden"
                ):
                    self.frameset_ok = False
            elif kind == "end" and t[1] == "br":
                self.frameset_ok = False
        if kind in ("text", "cdata"):
            self.reconstruct_afe()
            self.insert_text(t[1])
            return
        if kind == "start":
            name, attrs, selfclose = t[1], t[2], t[3]
            if name == "frameset":
                # spec: honored only while the body is replaceable
                if (
                    self.frameset_ok
                    and self.body is not None
                    and len(self.stack) > 1
                    and self.stack[1] is self.body
                ):
                    self.body.detach()
                    del self.stack[1:]
                    self.body = None
                    self.insert_el("frameset", attrs)
                    self.saw_frameset = True
                    self.mode = "in_frameset"
                return
            if name == "body":
                return  # parse error, ignore (attr-merge skipped)
            if name in IN_BODY_IGNORED_STARTS:
                return  # parse error, ignore (spec in-body list)
            if name == "noscript" and self.scripting:
                # generic rawtext (no reconstruct — spec path)
                self.insert_el(name, attrs)
                self.rawtext_return = "in_body"
                self.mode = "rawtext"
                return
            if name == "template":
                self.start_template(attrs)
                return
            if name == "table":
                # generated docs carry <!DOCTYPE html> → no-quirks:
                # table closes an open p
                self.close_p()
                self.insert_el(name, attrs)
                self.mode = "in_table"
                return
            if name in ("svg", "math"):
                self.reconstruct_afe()
                self.insert_el(name, attrs, ns=name)
                if selfclose:
                    self.stack.pop()
                return
            if name == "form":
                # §13.2.6.4.7 <form>: ignored while the pointer is set
                # UNLESS a template is open (pointer is
                # template-transparent); inserted nodes only bind the
                # pointer outside templates
                if self.form is not None and not self.template_on_stack():
                    return
                self.close_p()
                node = self.insert_el(name, attrs)
                if not self.template_on_stack():
                    self.form = node
                return
            if name in CLOSES_P:
                self.close_p()
                if name in HEADINGS:
                    if (
                        self.cur().ns is None
                        and self.cur().name in HEADINGS
                    ):
                        self.stack.pop()
                self.insert_el(name, attrs)
                return
            if name == "li":
                for node in reversed(self.stack):
                    if node.ns is None and node.name == "li":
                        self.implied_end("li")
                        self.pop_until("li")
                        break
                    if (
                        node.ns is None
                        and node.name in SPECIAL
                        and node.name not in ("address", "div", "p")
                    ):
                        break
                self.close_p()
                self.insert_el(name, attrs)
                return
            if name in FORMATTING:
                if name == "a" and any(
                    e is not MARKER and e[0] == "a" for e in self.afe
                ):
                    # find the stale entry AFTER the last marker only
                    stale = None
                    for e in reversed(self.afe):
                        if e is MARKER:
                            break
                        if e[0] == "a":
                            stale = e
                            break
                    if stale is not None:
                        self.adoption_agency("a")
                        if stale in self.afe:
                            self.afe.remove(stale)
                        if stale[1] in self.stack:
                            self.stack.remove(stale[1])
                self.reconstruct_afe()
                node = self.insert_el(name, attrs)
                self.afe.append([name, node, attrs])
                return
            if name == "select":
                self.reconstruct_afe()
                self.insert_el(name, attrs)
                # spec: select opened from a table mode parses in
                # InSelectInTable (self.mode is the delegating mode)
                if self.mode in (
                    "in_table", "in_caption", "in_table_body",
                    "in_row", "in_cell",
                ):
                    self.mode = "in_select_in_table"
                else:
                    self.mode = "in_select"
                return
            if name in ("option", "optgroup"):
                if self.cur().ns is None and self.cur().name == "option":
                    self.stack.pop()
                self.reconstruct_afe()
                self.insert_el(name, attrs)
                return
            if name in VOIDS:
                self.reconstruct_afe()
                self.insert_void(name, attrs)
                return
            if name in ("base", "basefont", "bgsound", "link", "meta"):
                self.insert_void(name, attrs)  # in-head rules
                return
            if name in ("title", "style", "script", "noframes"):
                self.insert_el(name, attrs)  # in-head generic rawtext
                self.rawtext_return = "in_body"
                self.mode = "rawtext"
                return
            self.reconstruct_afe()
            self.insert_el(name, attrs)
            if name in ("applet", "marquee", "object"):
                self.afe.append(MARKER)
            return
        if kind == "end":
            name = t[1]
            if name == "template":
                self.end_template()
                return
            if name == "p":
                if not self.in_scope("p", BUTTON_SCOPE):
                    # spec: insert an empty p, then close it
                    self.insert_el("p")
                self.implied_end("p")
                self.pop_until("p")
                return
            if name == "li":
                if self.in_scope("li", LIST_ITEM_SCOPE):
                    self.implied_end("li")
                    self.pop_until("li")
                return
            if name in HEADINGS:
                if any(
                    n.ns is None and n.name in HEADINGS
                    for n in self.stack
                ):
                    self.implied_end()
                    while self.stack:
                        node = self.stack.pop()
                        if node.ns is None and node.name in HEADINGS:
                            break
                return
            if name == "br":
                self.reconstruct_afe()
                self.insert_void("br")
                return
            if name in FORMATTING:
                self.adoption_agency(name)
                return
            if name == "form":
                # §13.2.6.4.7 </form>: outside templates the POINTER's
                # node (identity) closes — and is REMOVED in place, so
                # misnested content above a deep form survives; inside
                # templates it is a plain scoped pop-until
                if not self.template_on_stack():
                    node, self.form = self.form, None
                    if node is None or not self.node_in_scope(node):
                        return
                    self.implied_end()
                    if node in self.stack:
                        self.stack.remove(node)
                    return
                if self.in_scope("form"):
                    self.implied_end()
                    self.pop_until("form")
                return
            if name in ("div", "ul", "ol", "blockquote", "pre",
                        "applet", "marquee", "object"):
                if self.in_scope(name):
                    self.implied_end()
                    self.pop_until(name)
                    if name in ("applet", "marquee", "object"):
                        self.clear_afe_to_marker()
                return
            self.any_other_end_tag(name)

    # table context clears
    def _clear_to(self, names) -> None:
        while self.stack and not (
            self.cur().ns is None and self.cur().name in names
        ):
            self.stack.pop()

    def m_in_table(self, t) -> None:
        kind = t[0]
        if kind in ("text", "cdata"):
            if self.cur().ns is None and self.cur().name in FOSTER_CONTEXT:
                self.pending = []
                self.pending_return = self.mode
                self.mode = "in_table_text"
                self.dispatch_mode(t)
            else:
                self.foster = True
                self.m_in_body(t)
                self.foster = False
            return
        if kind == "start":
            name, attrs = t[1], t[2]
            if name == "caption":
                self._clear_to(("table", "template", "html"))
                self.afe.append(MARKER)
                self.insert_el(name, attrs)
                self.mode = "in_caption"
            elif name == "colgroup":
                self._clear_to(("table", "template", "html"))
                self.insert_el(name, attrs)
                self.mode = "in_column_group"
            elif name == "col":
                self._clear_to(("table", "template", "html"))
                self.insert_el("colgroup")
                self.mode = "in_column_group"
                self.dispatch_mode(t)
            elif name in ("tbody", "tfoot", "thead"):
                self._clear_to(("table", "template", "html"))
                self.insert_el(name, attrs)
                self.mode = "in_table_body"
            elif name in ("td", "th", "tr"):
                self._clear_to(("table", "template", "html"))
                self.insert_el("tbody")
                self.mode = "in_table_body"
                self.dispatch_mode(t)
            elif name == "table":
                if self.in_scope("table", TABLE_SCOPE):
                    self.pop_until("table")
                    self.mode = self.reset_mode()
                    self.process(t)
            elif name == "template":
                self.start_template(attrs)
            elif name == "input" and (
                (attrs.get("type") or "").lower() == "hidden"
            ):
                self.insert_void(name, attrs)
            elif name == "form":
                # spec in-table form: ignored when the pointer is set
                # OR a template is open; else insert + pop immediately
                if self.form is None and not self.template_on_stack():
                    self.form = self.insert_el(name, attrs)
                    self.stack.pop()
            else:
                self.foster = True
                self.m_in_body(t)
                self.foster = False
            return
        if kind == "end":
            name = t[1]
            if name == "table":
                if self.in_scope("table", TABLE_SCOPE):
                    self.pop_until("table")
                    self.mode = self.reset_mode()
            elif name == "template":
                self.end_template()
            elif name in (
                "body", "caption", "col", "colgroup", "html",
                "tbody", "td", "tfoot", "th", "thead", "tr",
            ):
                return
            else:
                self.foster = True
                self.m_in_body(t)
                self.foster = False

    def m_in_table_text(self, t) -> None:
        if t[0] in ("text", "cdata"):
            self.pending.append(t[1])
            return
        joined = "".join(self.pending)
        if joined:
            if joined.strip("\t\n\f \r"):
                self.foster = True
                self.reconstruct_afe()
                self.insert_text(joined)
                self.foster = False
            else:
                self.insert_text(joined)
        self.pending = []
        self.mode = self.pending_return
        self.dispatch_mode(t)

    def m_in_caption(self, t) -> None:
        kind = t[0]
        if kind == "end" and t[1] == "caption":
            if self.in_scope("caption", TABLE_SCOPE):
                self.implied_end()
                self.pop_until("caption")
                self.clear_afe_to_marker()
                self.mode = "in_table"
            return
        if (
            kind == "start"
            and t[1] in (
                "caption", "col", "colgroup", "tbody", "td", "tfoot",
                "th", "thead", "tr",
            )
        ) or (kind == "end" and t[1] == "table"):
            if self.in_scope("caption", TABLE_SCOPE):
                self.implied_end()
                self.pop_until("caption")
                self.clear_afe_to_marker()
                self.mode = "in_table"
                self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in (
            "body", "col", "colgroup", "html", "tbody", "td", "tfoot",
            "th", "tr",
        ):
            return
        self.m_in_body(t)

    def m_in_column_group(self, t) -> None:
        kind = t[0]
        if kind == "start" and t[1] == "col":
            self.insert_void("col", t[2])
            return
        if kind == "start" and t[1] == "template":
            self.start_template(t[2])
            return
        if kind == "end" and t[1] == "template":
            self.end_template()
            return
        if kind == "end" and t[1] == "colgroup":
            if self.cur().ns is None and self.cur().name == "colgroup":
                self.stack.pop()
                self.mode = "in_table"
            return
        if kind == "end" and t[1] == "col":
            return
        if self.cur().ns is None and self.cur().name == "colgroup":
            self.stack.pop()
            self.mode = "in_table"
            self.dispatch_mode(t)

    def m_in_table_body(self, t) -> None:
        kind = t[0]
        if kind == "start" and t[1] == "tr":
            self._clear_to(("tbody", "tfoot", "thead", "template", "html"))
            self.insert_el("tr", t[2])
            self.mode = "in_row"
            return
        if kind == "start" and t[1] in ("td", "th"):
            self._clear_to(("tbody", "tfoot", "thead", "template", "html"))
            self.insert_el("tr")
            self.mode = "in_row"
            self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in ("tbody", "tfoot", "thead"):
            if self.in_scope(t[1], TABLE_SCOPE):
                self._clear_to(
                    ("tbody", "tfoot", "thead", "template", "html")
                )
                self.stack.pop()
                self.mode = "in_table"
            return
        if (
            kind == "start"
            and t[1] in ("caption", "col", "colgroup", "tbody", "tfoot",
                         "thead")
        ) or (kind == "end" and t[1] == "table"):
            if any(
                self.in_scope(s, TABLE_SCOPE)
                for s in ("tbody", "thead", "tfoot")
            ):
                self._clear_to(
                    ("tbody", "tfoot", "thead", "template", "html")
                )
                self.stack.pop()
                self.mode = "in_table"
                self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in (
            "body", "caption", "col", "colgroup", "html", "td", "th",
            "tr",
        ):
            return
        self.m_in_table(t)

    def m_in_row(self, t) -> None:
        kind = t[0]
        if kind == "start" and t[1] in ("td", "th"):
            self._clear_to(("tr", "template", "html"))
            self.insert_el(t[1], t[2])
            self.mode = "in_cell"
            self.afe.append(MARKER)
            return
        if kind == "end" and t[1] == "tr":
            if self.in_scope("tr", TABLE_SCOPE):
                self._clear_to(("tr", "template", "html"))
                self.stack.pop()
                self.mode = "in_table_body"
            return
        if (
            kind == "start"
            and t[1] in ("caption", "col", "colgroup", "tbody", "tfoot",
                         "thead", "tr")
        ) or (kind == "end" and t[1] == "table"):
            if self.in_scope("tr", TABLE_SCOPE):
                self._clear_to(("tr", "template", "html"))
                self.stack.pop()
                self.mode = "in_table_body"
                self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in ("tbody", "tfoot", "thead"):
            if self.in_scope(t[1], TABLE_SCOPE):
                if self.in_scope("tr", TABLE_SCOPE):
                    self._clear_to(("tr", "template", "html"))
                    self.stack.pop()
                    self.mode = "in_table_body"
                    self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in (
            "body", "caption", "col", "colgroup", "html", "td", "th",
        ):
            return
        self.m_in_table(t)

    def _close_cell(self) -> None:
        for cell in ("td", "th"):
            if self.in_scope(cell, TABLE_SCOPE):
                self.implied_end()
                self.pop_until(cell)
                self.clear_afe_to_marker()
                break
        self.mode = "in_row"

    def m_in_cell(self, t) -> None:
        kind = t[0]
        if kind == "end" and t[1] in ("td", "th"):
            if self.in_scope(t[1], TABLE_SCOPE):
                self.implied_end()
                self.pop_until(t[1])
                self.clear_afe_to_marker()
                self.mode = "in_row"
            return
        if kind == "start" and t[1] in (
            "caption", "col", "colgroup", "tbody", "td", "tfoot", "th",
            "thead", "tr",
        ):
            if self.in_scope("td", TABLE_SCOPE) or self.in_scope(
                "th", TABLE_SCOPE
            ):
                self._close_cell()
                self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in (
            "body", "caption", "col", "colgroup", "html",
        ):
            return
        if kind == "end" and t[1] in ("table", "tbody", "tfoot", "thead",
                                      "tr"):
            if self.in_scope(t[1], TABLE_SCOPE):
                self._close_cell()
                self.dispatch_mode(t)
            return
        self.m_in_body(t)

    def _in_select_scope(self, name) -> bool:
        # spec select scope: boundary = everything EXCEPT optgroup/option
        for node in reversed(self.stack):
            if node.ns is None and node.name == name:
                return True
            if not (
                node.ns is None and node.name in ("optgroup", "option")
            ):
                return False
        return False

    def m_in_select(self, t) -> None:
        kind = t[0]
        if kind in ("text", "cdata"):
            self.insert_text(t[1])
            return
        if kind == "start":
            name, attrs = t[1], t[2]
            if name == "option":
                if self.cur().ns is None and self.cur().name == "option":
                    self.stack.pop()
                self.insert_el(name, attrs)
            elif name == "optgroup":
                if self.cur().ns is None and self.cur().name == "option":
                    self.stack.pop()
                if self.cur().ns is None and self.cur().name == "optgroup":
                    self.stack.pop()
                self.insert_el(name, attrs)
            elif name == "hr":
                if self.cur().ns is None and self.cur().name == "option":
                    self.stack.pop()
                if self.cur().ns is None and self.cur().name == "optgroup":
                    self.stack.pop()
                self.insert_void(name, attrs)
            elif name == "select":
                if self._in_select_scope("select"):
                    self.pop_until("select")
                    self.mode = self.reset_mode()
            elif name in ("input", "keygen", "textarea"):
                if self._in_select_scope("select"):
                    self.pop_until("select")
                    self.mode = self.reset_mode()
                    self.dispatch_mode(t)
            elif name == "template":
                self.start_template(attrs)
            # anything else: parse error, ignore
            return
        if kind == "end":
            name = t[1]
            if name == "optgroup":
                if (
                    self.cur().ns is None
                    and self.cur().name == "option"
                    and len(self.stack) > 1
                    and self.stack[-2].name == "optgroup"
                ):
                    self.stack.pop()
                if self.cur().ns is None and self.cur().name == "optgroup":
                    self.stack.pop()
            elif name == "option":
                if self.cur().ns is None and self.cur().name == "option":
                    self.stack.pop()
            elif name == "select":
                if self._in_select_scope("select"):
                    self.pop_until("select")
                    self.mode = self.reset_mode()
            elif name == "template":
                self.end_template()
            # anything else: parse error, ignore

    def m_in_select_in_table(self, t) -> None:
        kind = t[0]
        table_tags = (
            "caption", "table", "tbody", "tfoot", "thead", "tr", "td",
            "th",
        )
        if kind == "start" and t[1] in table_tags:
            self.pop_until("select")
            self.mode = self.reset_mode()
            self.dispatch_mode(t)
            return
        if kind == "end" and t[1] in table_tags:
            if self.in_scope(t[1], TABLE_SCOPE):
                self.pop_until("select")
                self.mode = self.reset_mode()
                self.dispatch_mode(t)
            return
        self.m_in_select(t)

    def m_in_template(self, t) -> None:
        kind = t[0]
        if kind in ("text", "cdata"):
            self.m_in_body(t)
            return
        if kind == "start":
            name = t[1]
            if name == "template":
                self.start_template(t[2])
                return
            if name in ("base", "basefont", "bgsound", "link", "meta"):
                self.insert_void(name, t[2])  # in-head rules
                return
            if name in ("title", "style", "script", "noframes"):
                self.insert_el(name, t[2])  # in-head generic rawtext
                self.rawtext_return = "in_template"
                self.mode = "rawtext"
                return
            if name in ("caption", "colgroup", "tbody", "tfoot", "thead"):
                self.tmodes[-1] = "in_table"
                self.mode = "in_table"
                self.dispatch_mode(t)
                return
            if name == "col":
                self.tmodes[-1] = "in_column_group"
                self.mode = "in_column_group"
                self.dispatch_mode(t)
                return
            if name == "tr":
                self.tmodes[-1] = "in_table_body"
                self.mode = "in_table_body"
                self.dispatch_mode(t)
                return
            if name in ("td", "th"):
                self.tmodes[-1] = "in_row"
                self.mode = "in_row"
                self.dispatch_mode(t)
                return
            self.tmodes[-1] = "in_body"
            self.mode = "in_body"
            self.dispatch_mode(t)
            return
        if kind == "end":
            if t[1] == "template":
                self.end_template()
            return


# ---------------------------------------------------------------------
# token construction + HTML rendering (the engine parses the RENDERED
# text — its tokenizer is in the differential loop too)

def S(name, attrs=None, selfclose=False):
    return ("start", name, attrs or {}, selfclose)


def E(name):
    return ("end", name)


def T(data):
    return ("text", data)


def CD(data):
    return ("cdata", data)


def render(tokens, document: bool = False) -> str:
    parts = ["<!DOCTYPE html>" if document else "<!DOCTYPE html><body>"]
    for t in tokens:
        if t[0] == "start":
            attrs = "".join(f' {k}="{v}"' for k, v in t[2].items())
            slash = "/" if t[3] else ""
            parts.append(f"<{t[1]}{attrs}{slash}>")
        elif t[0] == "end":
            parts.append(f"</{t[1]}>")
        elif t[0] == "text":
            parts.append(t[1])  # generator emits markup-safe text only
        elif t[0] == "cdata":
            parts.append(f"<![CDATA[{t[1]}]]>")
    return "".join(parts)


def expected(tokens, document: bool = False, scripting: bool = True):
    p = MiniParser(document=document, scripting=scripting)
    for t in tokens:
        p.process(t)
    p.finish()
    return outline(p.html)


def case(
    desc, tokens, document: bool = False, scripting: bool = True
) -> dict:
    for t in tokens:
        if t[0] == "text":
            assert not any(c in t[1] for c in "<>&"), t
    out = {
        "description": desc,
        "input": render(tokens, document),
        "expected": expected(tokens, document, scripting),
    }
    if not scripting:
        out["scripting"] = False  # replay harness forwards the flag
    return out


# ---------------------------------------------------------------- families

def table_cases() -> list[dict]:
    out = []
    # T1: section × rows × cell kind × explicit end tags
    for sec in ("", "thead", "tbody", "tfoot"):
        for nrows in (1, 2):
            for cell in ("td", "th"):
                for explicit in (False, True):
                    toks = [S("table")]
                    if sec:
                        toks.append(S(sec))
                    for r in range(nrows):
                        toks.append(S("tr"))
                        toks += [S(cell), T(f"c{r}")]
                        if explicit:
                            toks += [E(cell), E("tr")]
                    if sec and explicit:
                        toks.append(E(sec))
                    toks.append(E("table"))
                    out.append(case(
                        f"table sec={sec or 'implied'} rows={nrows} "
                        f"cell={cell} explicit={explicit}",
                        toks,
                    ))
    # T2: caption / colgroup structure
    for ncol in (0, 1, 3):
        for close_colgroup in (False, True):
            toks = [S("table"), S("caption"), T("cap"), E("caption"),
                    S("colgroup")]
            toks += [S("col")] * ncol
            if close_colgroup:
                toks.append(E("colgroup"))
            toks += [S("tr"), S("td"), T("x"), E("table")]
            out.append(case(
                f"caption+colgroup ncol={ncol} closed={close_colgroup}",
                toks,
            ))
    # caption closed implicitly by row structure
    for closer in (S("tr"), S("tbody"), S("td"), S("colgroup")):
        toks = [S("table"), S("caption"), T("cap"), closer,
                S("td"), T("x"), E("table")]
        out.append(case(f"caption implicit close by {closer[1]}", toks))
    # col without colgroup
    out.append(case(
        "col without colgroup",
        [S("table"), S("col"), S("tr"), S("td"), T("x"), E("table")],
    ))
    # T3: foster parenting of strays
    strays = [
        [T("stray")],
        [S("div"), T("d"), E("div")],
        [S("span"), T("s"), E("span")],
        [S("b"), T("bold"), E("b")],
        [S("img", {"src": "i.png"})],
    ]
    positions = {
        "after table": [S("table")],
        "after tbody": [S("table"), S("tbody")],
        "after tr": [S("table"), S("tr")],
    }
    for pname, prefix in positions.items():
        for stray in strays:
            toks = prefix + stray + [S("tr"), S("td"), T("x"), E("table"),
                                     T("tail")]
            out.append(case(
                f"foster {stray[0][0]}:{stray[0][1][:4]} {pname}", toks
            ))
    # whitespace-only text stays in the table
    out.append(case(
        "ws-only table text not fostered",
        [S("table"), T(" "), S("tr"), S("td"), T("x"), E("table")],
    ))
    # T4: implied/autoclose
    out.append(case(
        "td directly in table",
        [S("table"), S("td"), T("x"), E("table")],
    ))
    out.append(case(
        "cell autoclose by td",
        [S("table"), S("tr"), S("td"), T("a"), S("td"), T("b"),
         E("table")],
    ))
    out.append(case(
        "cell autoclose by new tr",
        [S("table"), S("tr"), S("td"), T("a"), S("tr"), S("td"), T("b"),
         E("table")],
    ))
    out.append(case(
        "end table with open cell",
        [S("table"), S("tr"), S("td"), T("a"), E("table"), T("after")],
    ))
    out.append(case(
        "tbody autoclose by tfoot",
        [S("table"), S("tbody"), S("tr"), S("td"), T("a"),
         S("tfoot"), S("tr"), S("td"), T("b"), E("table")],
    ))
    # T5: inputs / form / nesting
    out.append(case(
        "hidden input stays in table",
        [S("table"), S("input", {"type": "hidden", "name": "t"}),
         S("tr"), S("td"), T("x"), E("table")],
    ))
    out.append(case(
        "text input fostered",
        [S("table"), S("input", {"type": "text"}),
         S("tr"), S("td"), T("x"), E("table")],
    ))
    out.append(case(
        "form in table pointer only",
        [S("table"), S("form", {"id": "f"}), S("tr"), S("td"), T("x"),
         E("table")],
    ))
    out.append(case(
        "nested table inside cell",
        [S("table"), S("tr"), S("td"), S("table"), S("tr"), S("td"),
         T("inner"), E("table"), T("outer"), E("table")],
    ))
    out.append(case(
        "table start inside table implies close",
        [S("table"), S("tr"), S("td"), T("a"), E("td"), E("tr"),
         S("table"), S("tr"), S("td"), T("b"), E("table")],
    ))
    # stray end tags ignored in table modes
    for stray_end in ("td", "tr", "tbody", "caption", "colgroup"):
        toks = [S("table"), E(stray_end), S("tr"), S("td"), T("x"),
                E("table")]
        out.append(case(f"stray </{stray_end}> in table ignored", toks))
    # formatting element crossing a cell boundary (AFE marker)
    out.append(case(
        "afe marker isolates cell formatting",
        [S("b"), T("1"), S("table"), S("tr"), S("td"), T("plain"),
         E("td"), E("tr"), E("table"), T("2")],
    ))
    # block content inside cells
    for blk_name, blk in (
        ("p", [S("p"), T("para"), E("p")]),
        ("ul", [S("ul"), S("li"), T("item"), E("ul")]),
        ("h2", [S("h2"), T("head"), E("h2")]),
        ("div+p", [S("div"), S("p"), T("x"), E("div")]),
    ):
        for cell in ("td", "th"):
            out.append(case(
                f"cell {cell} hosts block {blk_name}",
                [S("table"), S("tr"), S(cell)] + blk
                + [E(cell), E("tr"), E("table")],
            ))
    # multi-section structures
    out.append(case(
        "thead tbody tfoot full",
        [S("table"),
         S("thead"), S("tr"), S("th"), T("h"),
         S("tbody"), S("tr"), S("td"), T("b"),
         S("tfoot"), S("tr"), S("td"), T("f"),
         E("table")],
    ))
    out.append(case(
        "two tbodies",
        [S("table"), S("tbody"), S("tr"), S("td"), T("1"),
         S("tbody"), S("tr"), S("td"), T("2"), E("table")],
    ))
    out.append(case(
        "caption then thead then rows",
        [S("table"), S("caption"), T("c"), E("caption"),
         S("thead"), S("tr"), S("th"), T("h"), E("thead"),
         S("tr"), S("td"), T("d"), E("table")],
    ))
    out.append(case(
        "colgroup between caption and rows",
        [S("table"), S("caption"), T("c"), E("caption"),
         S("colgroup"), S("col"), S("col"), E("colgroup"),
         S("tr"), S("td"), T("d"), E("table")],
    ))
    # sequential sibling tables
    out.append(case(
        "two sibling tables",
        [S("table"), S("tr"), S("td"), T("1"), E("table"),
         S("table"), S("tr"), S("td"), T("2"), E("table")],
    ))
    out.append(case(
        "text between sibling tables",
        [S("table"), S("td"), T("1"), E("table"), T("mid"),
         S("table"), S("td"), T("2"), E("table")],
    ))
    # stray content after caption (fostered)
    for stray in ([T("s")], [S("div"), T("d"), E("div")]):
        out.append(case(
            f"stray {stray[0][0]} after closed caption fostered",
            [S("table"), S("caption"), T("c"), E("caption")] + stray
            + [S("tr"), S("td"), T("x"), E("table")],
        ))
    return out


def foreign_cases() -> list[dict]:
    out = []
    for root in ("svg", "math"):
        out.append(case(
            f"{root} simple child + text",
            [S(root), S("g" if root == "svg" else "mrow"), T("t"),
             E("g" if root == "svg" else "mrow"), E(root), T("after")],
        ))
        out.append(case(
            f"{root} self-closing child",
            [S(root), S("circle" if root == "svg" else "mspace", None,
                        True), T("t"), E(root)],
        ))
        out.append(case(
            f"{root} self-closing root",
            [S(root, None, True), T("after")],
        ))
        out.append(case(
            f"{root} unclosed at text end",
            [S(root), S("g" if root == "svg" else "mrow"), T("t")],
        ))
        for breakout in ("div", "b", "p", "ul", "h1", "table"):
            out.append(case(
                f"{root} breakout via {breakout}",
                [S(root), S("path" if root == "svg" else "mrow"),
                 S(breakout), T("html"), E(breakout), T("tail")],
            ))
        out.append(case(
            f"{root} font with color breaks out",
            [S(root), S("font", {"color": "red"}), T("h")],
        ))
        out.append(case(
            f"{root} font without attrs stays foreign",
            [S(root), S("font"), T("f"), E("font"), E(root)],
        ))
        out.append(case(
            f"{root} end tag case-insensitive match",
            [S(root), S("g" if root == "svg" else "mrow"), T("x"),
             E(root), T("after")],
        ))
        out.append(case(
            f"{root} cdata text kept",
            [S(root), S("text" if root == "svg" else "mtext"),
             CD("cd data"), E(root)],
        ))
        out.append(case(
            f"{root} stray end br breaks out",
            [S(root), S("path" if root == "svg" else "mrow"), E("br"),
             T("after")],
        ))
    # svg tag-name case fixes
    for lower, proper in sorted(SVG_TAG_CASE.items()):
        out.append(case(
            f"svg case fix {lower}->{proper}",
            [S("svg"), S(lower), T("i") if proper == "foreignObject"
             else CD("i"), E(lower), E("svg")],
        ))
    # integration points
    out.append(case(
        "svg foreignObject hosts html",
        [S("svg"), S("foreignobject"), S("p"), T("para"), E("p"),
         E("foreignobject"), E("svg"), T("after")],
    ))
    out.append(case(
        "svg desc hosts html formatting",
        [S("svg"), S("desc"), S("b"), T("bold"), E("b"), E("desc"),
         E("svg")],
    ))
    out.append(case(
        "svg title text",
        [S("svg"), S("title"), T("tip"), E("title"), E("svg")],
    ))
    for ip in sorted(MATHML_TEXT_IP):
        out.append(case(
            f"math {ip} text integration point",
            [S("math"), S(ip), S("b"), T("x"), E("b"), E(ip), E("math")],
        ))
        out.append(case(
            f"math {ip} malignmark stays foreign",
            [S("math"), S(ip), S("malignmark"), E(ip), E("math")],
        ))
    for enc, is_ip in (
        ("text/html", True),
        ("application/xhtml+xml", True),
        ("image/png", False),
    ):
        out.append(case(
            f"annotation-xml encoding={enc} ip={is_ip}",
            [S("math"), S("annotation-xml", {"encoding": enc}),
             S("span"), T("inner"), E("span"), E("annotation-xml"),
             E("math")],
        ))
    out.append(case(
        "svg inside annotation-xml allowed",
        [S("math"), S("annotation-xml"), S("svg"), S("g"), E("g"),
         E("svg"), E("annotation-xml"), E("math")],
    ))
    out.append(case(
        "nested svg groups deep text",
        [S("svg"), S("g"), S("g"), S("g"), T("deep"), E("g"), E("g"),
         E("g"), E("svg")],
    ))
    out.append(case(
        "table cell hosts svg",
        [S("table"), S("tr"), S("td"), S("svg"), S("g"), T("v"),
         E("g"), E("svg"), E("td"), E("tr"), E("table")],
    ))
    out.append(case(
        "svg fostered from table",
        [S("table"), S("svg"), S("g"), E("g"), E("svg"), S("tr"),
         S("td"), T("x"), E("table")],
    ))
    # per-root child tag variety
    for child in ("g", "path", "rect", "ellipse", "defs"):
        out.append(case(
            f"svg child {child} with text",
            [S("svg"), S(child), T("t"), E(child), E("svg")],
        ))
    for child in ("mrow", "mfrac", "msqrt", "mstyle"):
        out.append(case(
            f"math child {child} with text",
            [S("math"), S(child), T("t"), E(child), E("math")],
        ))
    # CDATA bracket edge content
    for root, host in (("svg", "text"), ("math", "mtext")):
        out.append(case(
            f"{root} cdata with stray brackets",
            [S(root), S(host), CD("a]b]]c"), E(host), E(root)],
        ))
        out.append(case(
            f"{root} cdata adjacent to text merges",
            [S(root), S(host), T("pre-"), CD("cd"), T("-post"),
             E(host), E(root)],
        ))
    # misnesting THROUGH an integration point boundary
    out.append(case(
        "formatting inside foreignObject scoped to it",
        [S("b"), T("1"), S("svg"), S("foreignobject"), S("i"), T("2"),
         E("foreignobject"), E("svg"), T("3")],
    ))
    out.append(case(
        "block inside foreignObject is html",
        [S("svg"), S("foreignobject"), S("ul"), S("li"), T("item"),
         E("ul"), E("foreignobject"), E("svg")],
    ))
    out.append(case(
        "nested svg inside foreignObject html",
        [S("svg"), S("foreignobject"), S("p"), S("svg"), S("g"),
         E("g"), E("svg"), E("p"), E("foreignobject"), E("svg")],
    ))
    # spec: foreign IPs are in the SPECIAL category and scope-boundary
    # lists — end tags / scope checks must not reach past them
    out.append(case(
        "end tag outside foreignObject ignored",
        [S("b"), T("1"), S("svg"), S("foreignobject"), S("i"), T("2"),
         E("b"), T("3")],
    ))
    out.append(case(
        "stray end svg from inside IP html ignored",
        [S("b"), T("1"), S("svg"), S("foreignobject"), S("i"), T("2"),
         E("foreignobject"), E("svg"), T("3")],
    ))
    out.append(case(
        "p outside foreignObject not closed from inside",
        [S("p"), T("1"), S("svg"), S("foreignobject"), S("p"), T("2"),
         E("p"), E("foreignobject"), E("svg"), T("3")],
    ))
    for ip, root in (("desc", "svg"), ("title", "svg"), ("mi", "math")):
        out.append(case(
            f"div end outside {root} {ip} ignored",
            [S("div"), T("1"), S(root), S(ip), S("span"), T("2"),
             E("div"), T("3")],
        ))
    out.append(case(
        "adoption subject outside IP not found",
        [S("em"), T("1"), S("svg"), S("foreignobject"), T("2"),
         E("em"), T("3")],
    ))
    out.append(case(
        "formatting closed within IP works",
        [S("svg"), S("foreignobject"), S("b"), T("x"), E("b"), T("y"),
         E("foreignobject"), E("svg")],
    ))
    return out


def afe_cases() -> list[dict]:
    out = []
    fmts = ("b", "i", "em", "strong", "a", "nobr", "code")
    for f in fmts:
        for blk in ("p", "div", "h1", "blockquote"):
            out.append(case(
                f"adoption {f} across {blk}",
                [S(f), T("1"), S(blk), T("2"), E(f), T("3"), E(blk)],
            ))
        out.append(case(
            f"reconstruct {f} into next paragraph",
            [S("p"), S(f), T("1"), E("p"), S("p"), T("2"), E("p")],
        ))
        out.append(case(
            f"unclosed {f} reconstructs after block",
            [S(f), T("1"), S("div"), T("2"), E("div"), T("3")],
        ))
        out.append(case(
            f"plain nested {f} matched",
            [S("p"), S(f), T("in"), E(f), T("out"), E("p")],
        ))
        out.append(case(
            f"stray </{f}> ignored",
            [S("p"), T("a"), E(f), T("b"), E("p")],
        ))
    # double misnesting: all ordered pairs over a six-element set
    pair_fmts = ("b", "i", "em", "strong", "nobr", "code")
    for f in pair_fmts:
        for g in pair_fmts:
            if f == g:
                continue
            out.append(case(
                f"double misnest {f}/{g}",
                [S(f), S(g), T("1"), S("p"), T("2"), E(f), T("3"), E(g),
                 T("4")],
            ))
    # formatting scoped by the caption / cell markers
    for f in fmts:
        out.append(case(
            f"{f} inside caption stays scoped",
            [S("table"), S("caption"), S(f), T("cap"), E("caption"),
             S("tr"), S("td"), T("x"), E("table"), T("after")],
        ))
        out.append(case(
            f"{f} opened in cell does not leak",
            [S("table"), S("tr"), S("td"), S(f), T("in"), E("td"),
             E("tr"), E("table"), T("out")],
        ))
        out.append(case(
            f"matched triple nesting {f}",
            [S("p"), S(f), S("span"), S(f), T("deep"), E(f), E("span"),
             E(f), E("p")],
        ))
    out.append(case(
        "a start closes open a",
        [S("a", {"href": "1"}), T("one"), S("a", {"href": "2"}),
         T("two"), E("a")],
    ))
    out.append(case(
        "heading autoclose on new heading",
        [S("h1"), T("a"), S("h2"), T("b"), E("h2")],
    ))
    out.append(case(
        "li autoclose",
        [S("ul"), S("li"), T("1"), S("li"), T("2"), E("ul")],
    ))
    out.append(case(
        "end p without open p inserts empty p",
        [T("a"), E("p"), T("b")],
    ))
    out.append(case(
        "end br inserts br",
        [T("a"), E("br"), T("b")],
    ))
    out.append(case(
        "formatting through list items",
        [S("ul"), S("li"), S("b"), T("1"), S("li"), T("2"), E("ul")],
    ))
    out.append(case(
        "marker at applet bounds reconstruction",
        [S("b"), T("1"), S("applet"), T("2"), E("applet"), T("3")],
    ))
    # adoption agency with a TABLE-CONTEXT common ancestor: the spec
    # inserts last_node at the appropriate place with common ancestor
    # as override target → foster parenting (a plain append nested the
    # block inside <table> — engine bug found by this family)
    for f in ("b", "i", "em", "nobr"):
        out.append(case(
            f"adoption foster common-ancestor table {f}",
            [S("table"), S(f), S("div"), T("x"), E(f), E("div"),
             S("tr"), S("td"), T("c"), E("table"), T("tail")],
        ))
    out.append(case(
        "adoption foster common-ancestor tbody",
        [S("table"), S("tbody"), S("b"), S("div"), T("x"), E("b"),
         E("div"), S("tr"), S("td"), T("c"), E("table")],
    ))
    out.append(case(
        "adoption foster common-ancestor tr",
        [S("table"), S("tr"), S("i"), S("div"), T("x"), E("i"),
         E("div"), S("td"), T("c"), E("table")],
    ))
    return out


def select_cases() -> list[dict]:
    out = []
    out.append(case(
        "select basic options",
        [S("select"), S("option"), T("a"), E("option"),
         S("option"), T("b"), E("select"), T("after")],
    ))
    out.append(case(
        "option autoclose by option",
        [S("select"), S("option"), T("a"), S("option"), T("b"),
         E("select")],
    ))
    out.append(case(
        "optgroup nesting and autoclose",
        [S("select"), S("optgroup"), S("option"), T("1"),
         S("optgroup"), S("option"), T("2"), E("select")],
    ))
    out.append(case(
        "hr inside select pops option",
        [S("select"), S("option"), T("a"), S("hr"), S("option"),
         T("b"), E("select")],
    ))
    out.append(case(
        "nested select acts as end tag",
        [S("select"), S("option"), T("a"), S("select"), S("option"),
         T("b")],
    ))
    out.append(case(
        "input implies select end and reprocesses",
        [S("select"), S("option"), T("a"),
         S("input", {"type": "text"}), T("after")],
    ))
    out.append(case(
        "textarea implies select end",
        [S("select"), S("option"), T("a"), S("textarea")],
    ))
    out.append(case(
        "stray div inside select ignored",
        [S("select"), S("div"), S("option"), T("a"), E("div"),
         E("select"), T("after")],
    ))
    out.append(case(
        "end optgroup with option current",
        [S("select"), S("optgroup"), S("option"), T("x"),
         E("optgroup"), S("option"), T("y"), E("select")],
    ))
    out.append(case(
        "template inside select",
        [S("select"), S("template"), S("option"), T("hid"),
         E("template"), S("option"), T("vis"), E("select")],
    ))
    out.append(case(
        "select in table cell",
        [S("table"), S("tr"), S("td"), S("select"), S("option"),
         T("o"), E("select"), E("td"), E("tr"), E("table")],
    ))
    out.append(case(
        "table token pops select in table",
        [S("table"), S("tr"), S("td"), S("select"), S("option"),
         T("o"), S("td"), T("next"), E("table")],
    ))
    out.append(case(
        "end table from select in table",
        [S("table"), S("tr"), S("td"), S("select"), S("option"),
         T("o"), E("table"), T("after")],
    ))
    out.append(case(
        "select fostered from table goes in-select-in-table",
        [S("table"), S("select"), S("option"), T("o"),
         S("tr"), S("td"), T("c"), E("table")],
    ))
    out.append(case(
        "select end then more options outside",
        [S("select"), S("option"), T("in"), E("select"),
         S("option"), T("out")],
    ))
    out.append(case(
        "select unclosed at eof",
        [S("p"), T("pre"), E("p"), S("select"), S("option"), T("o")],
    ))
    # code-review r3: in-body <option>/<optgroup> must RECONSTRUCT the
    # active formatting elements (a b left pending by </div> clones
    # around the option)
    out.append(case(
        "option reconstructs pending formatting",
        [S("div"), S("b"), T("x"), E("div"), S("option"), T("y")],
    ))
    out.append(case(
        "optgroup reconstructs pending formatting",
        [S("p"), S("i"), T("x"), E("p"), S("optgroup"), S("option"),
         T("y")],
    ))
    # code-review r3: reset-insertion-mode's select scan stops at a
    # template between select and table (spec ancestor loop) → the
    # following <tr> is ignored in InSelect, not table-routed
    out.append(case(
        "template between select and table resets to in-select",
        [S("table"), S("template"), S("select"), S("template"),
         E("template"), S("tr"), T("q")],
    ))
    return out


def template_cases() -> list[dict]:
    out = []
    contents = {
        "paragraph": [S("p"), T("hid"), E("p")],
        "bare text": [T("hid")],
        "table rows": [S("tr"), S("td"), T("hid"), E("td"), E("tr")],
        "cell only": [S("td"), T("hid"), E("td")],
        "col": [S("col")],
        "nested template": [S("template"), T("inner"), E("template"),
                            T("outer")],
        "formatting": [S("b"), T("hid"), E("b")],
        "unclosed formatting": [S("b"), T("hid")],
    }
    for cname, ctoks in sorted(contents.items()):
        out.append(case(
            f"template in body: {cname}",
            [S("p"), T("vis"), E("p"), S("template")] + ctoks
            + [E("template"), S("p"), T("vis2"), E("p")],
        ))
    for cname in ("paragraph", "table rows", "col"):
        out.append(case(
            f"template in table: {cname}",
            [S("table"), S("template")] + contents[cname]
            + [E("template"), S("tr"), S("td"), T("live"), E("table")],
        ))
    out.append(case(
        "template in colgroup",
        [S("table"), S("colgroup"), S("template"), S("col"),
         E("template"), E("colgroup"), S("tr"), S("td"), T("x"),
         E("table")],
    ))
    out.append(case(
        "template unclosed at eof",
        [S("p"), T("vis"), E("p"), S("template"), S("div"), T("hid")],
    ))
    out.append(case(
        "stray end template ignored",
        [S("p"), T("a"), E("template"), T("b"), E("p")],
    ))
    out.append(case(
        "template formatting does not leak",
        [S("template"), S("b"), T("in"), E("template"), T("out")],
    ))
    out.append(case(
        "template end thorough implied",
        [S("template"), S("tr"), S("td"), T("x"), E("template"),
         S("p"), T("after"), E("p")],
    ))
    out.append(case(
        "template hosts svg",
        [S("template"), S("svg"), S("g"), T("v"), E("g"), E("svg"),
         E("template"), T("after")],
    ))
    out.append(case(
        "template caption routes to table mode",
        [S("template"), S("caption"), T("cap"), E("caption"),
         E("template"), T("after")],
    ))
    out.append(case(
        "template tbody then rows",
        [S("template"), S("tbody"), S("tr"), S("td"), T("x"),
         E("template"), T("after")],
    ))
    out.append(case(
        "template inside cell",
        [S("table"), S("tr"), S("td"), S("template"), S("p"), T("hid"),
         E("template"), T("vis"), E("td"), E("tr"), E("table")],
    ))
    out.append(case(
        "sibling templates",
        [S("template"), T("a"), E("template"),
         S("template"), T("b"), E("template"), T("vis")],
    ))
    out.append(case(
        "table resumes after template closes mid-structure",
        [S("table"), S("tbody"), S("template"), S("tr"), S("td"),
         T("hid"), E("template"), S("tr"), S("td"), T("live"),
         E("table")],
    ))
    # svg:template is a FOREIGN element sharing the name only — an
    # HTML-rules </template> must not pop through it (and must not
    # drain the AFE list past a marker that was never pushed)
    out.append(case(
        "foreign svg template not closed by html end template",
        [S("b"), T("1"), S("svg"), S("template"), S("foreignobject"),
         S("p"), T("x"), E("template"), T("y")],
    ))
    out.append(case(
        "foreign svg template closed by foreign rules",
        [S("svg"), S("template"), S("g"), T("v"), E("g"),
         E("template"), E("svg"), T("after")],
    ))
    out.append(case(
        "html template inside foreignObject works",
        [S("svg"), S("foreignobject"), S("template"), S("p"), T("hid"),
         E("template"), T("vis"), E("foreignobject"), E("svg")],
    ))
    return out


def foreign_template_cases() -> list[dict]:
    """Family 7 (r4, VERDICT r3 #5): the two newest engine paths —
    tree-aware CDATA routing (tokenizer S_CDATA under foreign_depth>0)
    and InTemplate — crossed with each other, with integration points,
    and with the form pointer / select machinery.

    CDATA ground rules both sides model identically: inside foreign
    content a CDATA section is character data; at integration points
    the HTML tree rules receive the characters (the engine's
    DOCUMENTED approximation reads CDATA wherever foreign_depth>0 —
    the strict spec would bogus-comment CDATA when the adjusted
    current node is an HTML element inside an IP, but both the engine
    and browsers-in-practice keep the text, and the Mini receives
    cdata TOKENS so it models the same choice).  No case places CDATA
    in a pure HTML context (depth 0), where the tokenizer
    legitimately produces a bogus comment instead."""
    out = []

    # -- A. CDATA × foreign position × payload matrix ----------------
    payloads = {
        "plain": "cd data",
        "rbrk": "a]b",
        "dbl rbrk": "a]]b",
        "brackets": "[brk]",
        "empty": "",
    }
    # (description-root, token prefix, token suffix) for each position;
    # every position keeps the CDATA in foreign/IP context per the
    # ground rules above
    positions = []
    for root, child in (("svg", "g"), ("math", "mrow")):
        positions += [
            (f"{root} root", [S(root)], [E(root), T("tail")]),
            (f"{root} {child}", [S(root), S(child)],
             [E(child), E(root), T("tail")]),
            (f"{root} {child} between siblings",
             [S(root), S(child), T("s1"), E(child)],
             [S(child), T("s2"), E(child), E(root)]),
            (f"{root} unclosed at eof", [S(root), S(child)], []),
        ]
    for ip in ("mi", "mo", "mn", "ms", "mtext"):
        positions.append(
            (f"math text ip {ip}", [S("math"), S(ip)],
             [E(ip), E("math"), T("tail")])
        )
        positions.append(
            (f"math text ip {ip} inside b",
             [S("math"), S(ip), S("b")],
             [E("b"), E(ip), E("math")])
        )
    for ip in ("foreignobject", "desc", "title"):
        positions.append(
            (f"svg ip {ip}", [S("svg"), S(ip)],
             [E(ip), E("svg"), T("tail")])
        )
        positions.append(
            (f"svg ip {ip} inside p",
             [S("svg"), S(ip), S("p")],
             [E("p"), E(ip), E("svg")])
        )
    for pname, ptoks_pre, ptoks_post in positions:
        for plabel, data in sorted(payloads.items()):
            out.append(case(
                f"cdata {plabel} in {pname}",
                ptoks_pre + [CD(data)] + ptoks_post,
            ))

    # CDATA/text coalescing and odd neighbours
    out += [
        case("cdata merges with flanking text in svg",
             [S("svg"), S("g"), T("a"), CD("b"), T("c"), E("g"),
              E("svg")]),
        case("cdata merges with flanking text in math ip",
             [S("math"), S("mi"), T("a"), CD("b"), T("c"), E("mi"),
              E("math")]),
        case("adjacent cdata sections coalesce",
             [S("svg"), S("g"), CD("x"), CD("y"), E("g"), E("svg")]),
        case("cdata after self-closing foreign child",
             [S("svg"), S("circle", selfclose=True), CD("post"),
              E("svg"), T("tail")]),
        case("cdata in deep foreign nesting",
             [S("svg"), S("g"), S("g"), S("g"), CD("deep"), E("g"),
              E("g"), E("g"), E("svg")]),
        case("cdata in fostered svg inside table",
             [S("table"), S("svg"), CD("fostered"), E("svg"),
              S("tr"), S("td"), T("cell"), E("table")]),
        case("cdata before breakout only",
             [S("svg"), CD("pre"), S("div"), T("after breakout"),
              E("div")]),
        case("cdata in annotation-xml foreign (no encoding)",
             [S("math"), S("annotation-xml"), CD("axml"),
              E("annotation-xml"), E("math")]),
        case("cdata in annotation-xml html ip",
             [S("math"), S("annotation-xml", {"encoding": "text/html"}),
              S("p"), CD("axhtml"), E("p"), E("annotation-xml"),
              E("math")]),
    ]

    # -- B. template × form pointer / select -------------------------
    out += [
        case("duplicate form in body ignored",
             [S("form"), T("a"), S("form"), T("b"), E("form"),
              T("c")]),
        case("form end removes pointer node in place",
             [S("form"), S("div"), T("inside"), E("form"), T("still"),
              E("div"), T("after")]),
        case("form inside template does not bind pointer",
             [S("template"), S("form"), T("tf"), E("form"),
              E("template"), S("form"), T("vis"), E("form")]),
        case("form after template form still inserts",
             [S("template"), S("form"), T("a"), E("template"),
              S("form"), T("b"), E("form")]),
        case("outer form pointer survives template form",
             [S("form"), T("a"), S("template"), S("form"), T("b"),
              E("form"), E("template"), T("c"), E("form"), T("d")]),
        case("second form inside template inserts",
             [S("template"), S("form"), T("f1"), E("form"), S("form"),
              T("f2"), E("form"), E("template")]),
        case("form in table with open template ignored",
             [S("template"), S("table"), S("form"), S("tr"), S("td"),
              T("x"), E("table"), E("template"), T("after")]),
        case("form in plain table sets pointer only",
             [S("table"), S("form"), S("tr"), S("td"), T("x"),
              E("form"), E("table"), S("form"), T("ignored-dup"),
              E("form")]),
        case("form in template cell",
             [S("template"), S("table"), S("tr"), S("td"), S("form"),
              T("x"), E("form"), E("td"), E("tr"), E("table"),
              E("template"), S("form"), T("vis")]),
        case("form unclosed when template ends",
             [S("template"), S("form"), T("open"), E("template"),
              S("form"), T("vis"), E("form")]),
        case("select inside template",
             [S("template"), S("select"), S("option"), T("one"),
              S("option"), T("two"), E("select"), E("template"),
              T("after")]),
        case("select with optgroup inside template",
             [S("template"), S("select"), S("optgroup"), S("option"),
              T("x"), E("optgroup"), E("select"), E("template")]),
        case("select unclosed when template ends",
             [S("template"), S("select"), S("option"), T("x"),
              E("template"), T("after")]),
        case("select in table inside template",
             [S("template"), S("table"), S("tr"), S("td"), S("select"),
              S("option"), T("x"), E("td"), E("tr"), E("table"),
              E("template"), T("after")]),
        case("table tag closes select inside template table",
             [S("template"), S("table"), S("tr"), S("td"), S("select"),
              S("option"), T("x"), S("td"), T("y"), E("table"),
              E("template")]),
        case("template inside select hosts option",
             [S("select"), S("template"), S("option"), T("t"),
              E("template"), E("select"), T("after")]),
        case("input pops select back to template mode",
             [S("template"), S("select"), S("option"), T("x"),
              S("input"), T("after input"), E("template")]),
        case("select reset after inner template closes",
             [S("select"), S("template"), E("template"), S("option"),
              T("opt"), E("select"), T("after")]),
        # a FOREIGN svg:template shares only the name — it must not
        # make the form pointer transparent (code-review r4: the
        # engine's name-keyed open-element counter briefly did)
        case("foreign svg template does not unlock form pointer",
             [S("svg"), S("template"), S("foreignobject"),
              S("form", {"id": "a"}), S("form", {"id": "b"}),
              T("x")]),
        case("foreign svg template does not guard in-table form",
             [S("svg"), S("template"), S("foreignobject"), S("table"),
              S("form"), S("tr"), S("td"), T("cell"), E("table"),
              S("form"), T("dup ignored")]),
    ]

    # -- C. nested template re-entry ---------------------------------
    # content-mode matrix: outer mode resumes after the inner template
    # closes (tmodes stack discipline)
    modes = {
        "body": ([S("p"), T("m")], [E("p")]),
        "table": ([S("tr"), S("td"), T("m"), E("td"), E("tr")], []),
        "colgroup": ([S("col")], []),
        "rows": ([S("tbody"), S("tr"), S("td"), T("m"), E("td"),
                  E("tr")], []),
        "caption": ([S("caption"), T("m"), E("caption")], []),
    }
    for m1, (pre1, post1) in sorted(modes.items()):
        for m2, (pre2, post2) in sorted(modes.items()):
            out.append(case(
                f"template re-entry {m1} hosting {m2}",
                [S("template")] + pre1 + post1
                + [S("template")] + pre2 + post2
                + [E("template")] + pre1 + post1 + [E("template"),
                   T("after")],
            ))
    out += [
        case("triple nested templates close in order",
             [S("template"), T("a"), S("template"), T("b"),
              S("template"), T("c"), E("template"), T("b2"),
              E("template"), T("a2"), E("template"), T("vis")]),
        case("triple nested unclosed at eof depth 3",
             [S("template"), T("a"), S("template"), T("b"),
              S("template"), T("c")]),
        case("triple nested unclosed at eof depth 2",
             [S("template"), T("a"), S("template"), T("b"),
              E("template"), T("a2")]),
        case("extra stray end template after close",
             [S("template"), T("a"), E("template"), E("template"),
              T("b")]),
        case("template in caption in template",
             [S("template"), S("table"), S("caption"), S("template"),
              S("p"), T("hid"), E("template"), T("cap"), E("caption"),
              E("table"), E("template"), T("after")]),
        case("sibling templates in one table",
             [S("table"), S("template"), S("tr"), S("td"), T("a"),
              E("template"), S("template"), S("col"), E("template"),
              S("tr"), S("td"), T("live"), E("table")]),
        case("template formatting isolated per nesting level",
             [S("b"), T("1"), S("template"), S("i"), T("2"),
              S("template"), T("3"), E("template"), T("4"),
              E("template"), T("5")]),
    ]

    # -- D. template × foreign × CDATA -------------------------------
    out += [
        case("cdata in svg inside template",
             [S("template"), S("svg"), S("g"), CD("tcd"), E("g"),
              E("svg"), E("template"), T("after")]),
        case("cdata in svg inside nested template table",
             [S("template"), S("table"), S("template"), S("svg"),
              CD("deep"), E("svg"), E("template"), E("table"),
              E("template"), T("after")]),
        case("template inside foreignObject with cdata",
             [S("svg"), S("foreignobject"), S("template"), S("p"),
              CD("x"), E("p"), E("template"), T("vis"),
              E("foreignobject"), E("svg")]),
        case("template with open svg at eof",
             [S("template"), S("svg"), S("g"), CD("eof")]),
        case("foreign svg template hosts cdata",
             [S("svg"), S("template"), CD("ft"), E("template"),
              E("svg"), T("after")]),
        case("template in annotation-xml html ip",
             [S("math"), S("annotation-xml", {"encoding": "text/html"}),
              S("template"), S("p"), T("x"), E("template"), T("vis"),
              E("annotation-xml"), E("math")]),
        case("svg after inner template closes stays foreign",
             [S("template"), S("template"), E("template"), S("svg"),
              S("g"), CD("post"), E("g"), E("svg"), E("template"),
              T("after")]),
        case("cdata in math inside template caption",
             [S("template"), S("table"), S("caption"), S("math"),
              S("mrow"), CD("capm"), E("mrow"), E("math"),
              E("caption"), E("table"), E("template")]),
    ]
    return out


# ---------------------------------------------------------------- main

def self_test() -> None:
    """Canonical trees (transcribed from the html5lib tree-construction
    docs / browser behavior) the mini parser must reproduce before any
    expected output is trusted."""
    # classic adoption agency: <b>1<p>2</b>3</p>
    got = expected([S("b"), T("1"), S("p"), T("2"), E("b"), T("3"),
                    E("p")])
    want = ["html", ["head"],
            ["body", ["b", "#1"], ["p", ["b", "#2"], "#3"]]]
    assert got == want, got
    # foster parenting: text before table
    got = expected([S("table"), T("x"), S("tr"), S("td"), T("c"),
                    E("table")])
    want = ["html", ["head"],
            ["body", "#x",
             ["table", ["tbody", ["tr", ["td", "#c"]]]]]]
    assert got == want, got
    # implied tbody + cell autoclose
    got = expected([S("table"), S("td"), T("a"), S("td"), T("b"),
                    E("table")])
    want = ["html", ["head"],
            ["body", ["table", ["tbody", ["tr", ["td", "#a"],
                                          ["td", "#b"]]]]]]
    assert got == want, got
    # reconstruction across paragraphs: <p><b>1</p><p>2
    got = expected([S("p"), S("b"), T("1"), E("p"), S("p"), T("2")])
    want = ["html", ["head"],
            ["body", ["p", ["b", "#1"]], ["p", ["b", "#2"]]]]
    assert got == want, got
    # svg breakout
    got = expected([S("svg"), S("path"), S("div"), T("h"), E("div")])
    want = ["html", ["head"],
            ["body", ["svg:svg", ["svg:path"]], ["div", "#h"]]]
    assert got == want, got
    # template contents stay inside
    got = expected([S("template"), S("p"), T("x"), E("p"),
                    E("template"), T("y")])
    want = ["html", ["head"],
            ["body", ["template", ["p", "#x"]], "#y"]]
    assert got == want, got
    # frameset page (browser behavior): frameset replaces the body,
    # frames inside, noframes after close lands under html
    got = expected(
        [S("frameset"), S("frame"), E("frameset"),
         S("noframes"), T("old"), E("noframes")],
        document=True,
    )
    want = ["html", ["head"],
            ["frameset", ["frame"]], ["noframes", "#old"]]
    assert got == want, got
    # committed body blocks a late frameset; stray <frame> is ignored
    got = expected([T("x"), S("frameset"), S("frame")], document=True)
    want = ["html", ["head"], ["body", "#x"]]
    assert got == want, got
    # uncommitted body (empty div) is REPLACED by the frameset
    got = expected(
        [S("div"), E("div"), S("frameset"), S("frame"), E("frameset")],
        document=True,
    )
    want = ["html", ["head"], ["frameset", ["frame"]]]
    assert got == want, got


def frameset_cases() -> list[dict]:
    """Document-context family (r3): the frameset mode trio, the
    frameset-ok flag, and the BeforeHead/InHead/AfterHead plumbing —
    rendered WITHOUT the harness <body> prefix."""
    out = []
    # F1: structure matrix — nesting depth x frame count x noframes
    for depth in (1, 2):
        for nframes in (1, 2):
            for nof in (False, True):
                toks = []
                for _ in range(depth):
                    toks.append(S("frameset", {"cols": "50%,50%"}))
                for i in range(nframes):
                    toks.append(S("frame", {"src": f"f{i}.html"}))
                for _ in range(depth):
                    toks.append(E("frameset"))
                if nof:
                    toks += [S("noframes"), T("legacy text"),
                             E("noframes")]
                out.append(case(
                    f"frameset depth={depth} frames={nframes} "
                    f"noframes={nof}",
                    toks, document=True,
                ))
    # F2: frameset-ok commitment — each tag blocks the late frameset
    out.append(case(
        "frameset blocked by body text",
        [T("committed"), S("frameset"), S("frame")], document=True,
    ))
    for blocker in ("br", "img", "hr"):
        out.append(case(
            f"frameset blocked by {blocker}",
            [S(blocker), S("frameset"), S("frame")], document=True,
        ))
    out.append(case(
        "frameset blocked by table",
        [S("table"), E("table"), S("frameset"), S("frame")],
        document=True,
    ))
    out.append(case(
        "frameset blocked by text input",
        [S("input", {"type": "text"}), S("frameset"), S("frame"),
         E("frameset")],
        document=True,
    ))
    out.append(case(
        "hidden input does not block frameset",
        [S("input", {"type": "hidden"}), S("frameset"), S("frame"),
         E("frameset")],
        document=True,
    ))
    out.append(case(
        "frameset blocked by end br",
        [E("br"), S("frameset"), S("frame")], document=True,
    ))
    out.append(case(
        "frameset blocked by explicit body tag",
        [S("body"), S("frameset"), S("frame")], document=True,
    ))
    # F3: replaceable-body surgery — non-committing content vanishes
    out.append(case(
        "frameset replaces body with empty div",
        [S("div"), E("div"), S("frameset"), S("frame"), E("frameset")],
        document=True,
    ))
    out.append(case(
        "frameset replaces body with formatting",
        [S("b"), E("b"), S("frameset"), S("frame"), E("frameset")],
        document=True,
    ))
    out.append(case(
        "leading whitespace does not commit the body",
        [T("   "), S("frameset"), S("frame"), E("frameset")],
        document=True,
    ))
    # F4: InFrameset token handling
    out.append(case(
        "non-ws text in frameset keeps only whitespace",
        [S("frameset"), T("  drop me  "), S("frame"), E("frameset")],
        document=True,
    ))
    out.append(case(
        "stray tags inside frameset ignored",
        [S("frameset"), E("div"), S("p"), S("frame"), E("frameset")],
        document=True,
    ))
    out.append(case(
        "noframes inside frameset",
        [S("frameset"), S("noframes"), T("old ui"), E("noframes"),
         S("frame"), E("frameset")],
        document=True,
    ))
    out.append(case(
        "frameset unclosed at eof",
        [S("frameset"), S("frameset"), S("frame")], document=True,
    ))
    out.append(case(
        "extra end frameset after close ignored",
        [S("frameset"), S("frame"), E("frameset"), E("frameset")],
        document=True,
    ))
    out.append(case(
        "noframes after html end",
        [S("frameset"), E("frameset"), E("html"), S("noframes"),
         T("post"), E("noframes")],
        document=True,
    ))
    out.append(case(
        "noframes unclosed at eof",
        [S("frameset"), S("frame"), E("frameset"), S("noframes"),
         T("never closed")],
        document=True,
    ))
    # F5: head plumbing in document context
    out.append(case(
        "explicit head title meta then body",
        [S("head"), S("title"), T("the title"), E("title"),
         S("meta", {"charset": "utf-8"}), E("head"), S("body"),
         T("content")],
        document=True,
    ))
    out.append(case(
        "implied head collects link before frameset",
        [S("link", {"rel": "x"}), S("frameset"), S("frame"),
         E("frameset")],
        document=True,
    ))
    out.append(case(
        "style rawtext in implied head then body text",
        [S("style"), T("p brace stuff"), E("style"), T("tail")],
        document=True,
    ))
    out.append(case(
        "bare text document implies full skeleton",
        [T("hello world")], document=True,
    ))
    out.append(case(
        "head only document implies body",
        [S("head"), E("head")], document=True,
    ))
    # template inside head (engine's in-head template path + the
    # reset-to-in-head after </template>)
    out.append(case(
        "template in head holds meta then head continues",
        [S("head"), S("template"), S("meta", {"name": "x"}),
         S("p"), T("hid"), E("p"), E("template"),
         S("meta", {"charset": "u"}), E("head"), S("body"), T("v")],
        document=True,
    ))
    out.append(case(
        "template in head with table rows stays inside",
        [S("head"), S("template"), S("tr"), S("td"), T("ghost"),
         E("td"), E("tr"), E("template"), E("head"), T("body text")],
        document=True,
    ))
    out.append(case(
        "nested template in implied head",
        [S("template"), S("template"), T("inner"), E("template"),
         T("outer"), E("template"), T("after")],
        document=True,
    ))
    return out


def noscript_cases() -> list[dict]:
    """Both scripting configurations (r3b): scripting=True keeps
    noscript children as ONE raw text node (tag-free content so the
    engine's retokenized rawtext equals the mini's text tokens);
    scripting=False parses markup children via InHeadNoscript (head)
    and ordinary insertion (body)."""
    out = []
    # scripting ON — rawtext semantics (body + document contexts)
    out.append(case(
        "noscript rawtext in body keeps text inside",
        [S("p"), T("before"), E("p"), S("noscript"), T("enable js"),
         E("noscript"), S("p"), T("after"), E("p")],
    ))
    out.append(case(
        "noscript rawtext in head",
        [S("head"), S("noscript"), T("no js banner"), E("noscript"),
         E("head"), S("body"), T("real")],
        document=True,
    ))
    out.append(case(
        "noscript rawtext unclosed at eof",
        [S("div"), S("noscript"), T("swallows rest")],
    ))
    # scripting OFF — InHeadNoscript + markup children
    out.append(case(
        "scripting-off head noscript keeps link and style",
        [S("head"), S("noscript"), S("link", {"rel": "a"}),
         S("style"), T("b curly"), E("style"), E("noscript"),
         E("head"), S("body"), T("real")],
        document=True, scripting=False,
    ))
    out.append(case(
        "scripting-off head noscript pops on p",
        [S("head"), S("noscript"), S("p"), T("visible when no js"),
         E("p"), E("noscript"), E("head"), T("tail")],
        document=True, scripting=False,
    ))
    out.append(case(
        "scripting-off head noscript end br pops",
        [S("head"), S("noscript"), S("meta", {"charset": "x"}),
         E("br"), E("head"), S("body"), T("t")],
        document=True, scripting=False,
    ))
    out.append(case(
        "scripting-off head noscript ws and nested noscript",
        [S("head"), S("noscript"), T("  "), S("noscript"),
         S("link", {"rel": "b"}), E("noscript"), E("head"), T("x")],
        document=True, scripting=False,
    ))
    out.append(case(
        "scripting-off body noscript is an ordinary element",
        [S("b"), T("f"), E("b"), S("noscript"), S("p"), T("inside"),
         E("p"), E("noscript")],
        scripting=False,
    ))
    return out


def main() -> None:
    self_test()
    cases = (
        table_cases() + foreign_cases() + afe_cases()
        + select_cases() + template_cases() + frameset_cases()
        + noscript_cases() + foreign_template_cases()
    )
    names = [c["description"] for c in cases]
    assert len(names) == len(set(names)), "duplicate case descriptions"
    doc = {
        "comment": (
            "GENERATED by jobs/gen_tree_conformance.py — expected DOM "
            "outlines come from an independent spec-subset tree builder "
            "(MiniParser), never from the engine.  Do not hand-edit."
        ),
        "count": len(cases),
        "cases": cases,
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=0)
        f.write("\n")
    fam = {
        "table": len(table_cases()),
        "foreign": len(foreign_cases()),
        "afe": len(afe_cases()),
        "select": len(select_cases()),
        "template": len(template_cases()),
        "frameset": len(frameset_cases()),
        "noscript": len(noscript_cases()),
        "foreign_template": len(foreign_template_cases()),
    }
    print(f"wrote {len(cases)} cases -> {OUT} {fam}")


if __name__ == "__main__":
    main()

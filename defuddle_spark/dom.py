"""Minimal HTML DOM for the extraction kernel.

Pure Python (stdlib ``html.parser``), no third-party parser. Built for
deterministic, byte-stable serialization matching Go's ``x/net/html``
render rules (the reference parses/serializes via goquery on x/net/html;
see /root/reference/defuddle.go:89-108, 565). Key parity points:

- serializer escapes ``& ' < > " \\r`` as ``&amp; &#39; &lt; &gt; &#34; &#13;``
  in both text and attribute values (x/net/html escape set);
- void elements render as ``<br/>``;
- raw-text elements (script/style/iframe/...) render children literally;
- documents are normalized to an ``html > (head, body)`` shell;
- ``<tr>`` directly inside ``<table>`` gets an implied ``<tbody>`` (HTML5
  tree construction, matching x/net/html for the table-layout archetype).

The tree is mutable; nodes detached from the tree keep their subtree and
mutation on detached nodes is a safe no-op where the reference's goquery
behaves the same way.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator, Optional

TEXT = 3
ELEMENT = 1
COMMENT = 8

VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})

# x/net/html render.go: children rendered without escaping
RAW_TEXT_ELEMENTS = frozenset({
    "iframe", "noembed", "noframes", "noscript", "plaintext", "script",
    "style", "xmp",
})

HEAD_ELEMENTS = frozenset({
    "title", "base", "link", "meta", "style", "script", "noscript", "template",
})

# tags that implicitly close an open <p>
_P_CLOSERS = frozenset({
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hgroup", "hr", "main", "menu", "nav", "ol",
    "p", "pre", "section", "table", "ul",
})

# HTML5 foreign-content case adjustments (SVG), as applied by x/net/html
_SVG_ATTR_ADJUST = {
    "attributename": "attributeName", "attributetype": "attributeType",
    "basefrequency": "baseFrequency", "baseprofile": "baseProfile",
    "calcmode": "calcMode", "clippathunits": "clipPathUnits",
    "diffuseconstant": "diffuseConstant", "edgemode": "edgeMode",
    "filterunits": "filterUnits", "glyphref": "glyphRef",
    "gradienttransform": "gradientTransform", "gradientunits": "gradientUnits",
    "kernelmatrix": "kernelMatrix", "kernelunitlength": "kernelUnitLength",
    "keypoints": "keyPoints", "keysplines": "keySplines", "keytimes": "keyTimes",
    "lengthadjust": "lengthAdjust", "limitingconeangle": "limitingConeAngle",
    "markerheight": "markerHeight", "markerunits": "markerUnits",
    "markerwidth": "markerWidth", "maskcontentunits": "maskContentUnits",
    "maskunits": "maskUnits", "numoctaves": "numOctaves",
    "pathlength": "pathLength", "patterncontentunits": "patternContentUnits",
    "patterntransform": "patternTransform", "patternunits": "patternUnits",
    "pointsatx": "pointsAtX", "pointsaty": "pointsAtY", "pointsatz": "pointsAtZ",
    "preservealpha": "preserveAlpha", "preserveaspectratio": "preserveAspectRatio",
    "primitiveunits": "primitiveUnits", "refx": "refX", "refy": "refY",
    "repeatcount": "repeatCount", "repeatdur": "repeatDur",
    "requiredextensions": "requiredExtensions", "requiredfeatures": "requiredFeatures",
    "specularconstant": "specularConstant", "specularexponent": "specularExponent",
    "spreadmethod": "spreadMethod", "startoffset": "startOffset",
    "stddeviation": "stdDeviation", "stitchtiles": "stitchTiles",
    "surfacescale": "surfaceScale", "systemlanguage": "systemLanguage",
    "tablevalues": "tableValues", "targetx": "targetX", "targety": "targetY",
    "textlength": "textLength", "viewbox": "viewBox", "viewtarget": "viewTarget",
    "xchannelselector": "xChannelSelector", "ychannelselector": "yChannelSelector",
    "zoomandpan": "zoomAndPan",
}

_SVG_TAG_ADJUST = {
    "altglyph": "altGlyph", "altglyphdef": "altGlyphDef",
    "altglyphitem": "altGlyphItem", "animatecolor": "animateColor",
    "animatemotion": "animateMotion", "animatetransform": "animateTransform",
    "clippath": "clipPath", "feblend": "feBlend", "fecolormatrix": "feColorMatrix",
    "fecomponenttransfer": "feComponentTransfer", "fecomposite": "feComposite",
    "feconvolvematrix": "feConvolveMatrix", "fediffuselighting": "feDiffuseLighting",
    "fedisplacementmap": "feDisplacementMap", "fedistantlight": "feDistantLight",
    "fedropshadow": "feDropShadow", "feflood": "feFlood", "fefunca": "feFuncA",
    "fefuncb": "feFuncB", "fefuncg": "feFuncG", "fefuncr": "feFuncR",
    "fegaussianblur": "feGaussianBlur", "feimage": "feImage", "femerge": "feMerge",
    "femergenode": "feMergeNode", "femorphology": "feMorphology",
    "feoffset": "feOffset", "fepointlight": "fePointLight",
    "fespecularlighting": "feSpecularLighting", "fespotlight": "feSpotLight",
    "fetile": "feTile", "feturbulence": "feTurbulence",
    "foreignobject": "foreignObject", "glyphref": "glyphRef",
    "lineargradient": "linearGradient", "radialgradient": "radialGradient",
    "textpath": "textPath",
}

_IMPLIED_END = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "option": frozenset({"option", "optgroup"}),
    "thead": frozenset({"thead", "tbody", "tfoot"}),
    "tbody": frozenset({"thead", "tbody", "tfoot"}),
    "tfoot": frozenset({"thead", "tbody", "tfoot"}),
}


class Node:
    __slots__ = ("parent",)
    type: int = 0

    def __init__(self) -> None:
        self.parent: Optional[Element] = None

    def detach(self) -> None:
        p = self.parent
        if p is not None:
            try:
                p.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    remove = detach

    def next_sibling(self) -> Optional["Node"]:
        p = self.parent
        if p is None:
            return None
        sibs = p.children
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        return sibs[i + 1] if i + 1 < len(sibs) else None

    def prev_sibling(self) -> Optional["Node"]:
        p = self.parent
        if p is None:
            return None
        sibs = p.children
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        return sibs[i - 1] if i > 0 else None


class Text(Node):
    __slots__ = ("data",)
    type = TEXT

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def text(self) -> str:
        return self.data

    def __repr__(self) -> str:  # pragma: no cover
        return f"Text({self.data!r})"


class Comment(Node):
    __slots__ = ("data",)
    type = COMMENT

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def text(self) -> str:
        return ""


class Element(Node):
    __slots__ = ("tag", "attrs", "children")
    type = ELEMENT

    def __init__(self, tag: str, attrs: Optional[list] = None) -> None:
        super().__init__()
        self.tag = tag
        # ordered list of [name, value]; first occurrence wins on duplicates
        self.attrs: list = attrs if attrs is not None else []
        self.children: list = []

    # -- attributes ---------------------------------------------------
    def get(self, name: str, default=None):
        for k, v in self.attrs:
            if k == name:
                return v
        return default

    def has_attr(self, name: str) -> bool:
        return any(k == name for k, _ in self.attrs)

    def set_attr(self, name: str, value: str) -> None:
        for pair in self.attrs:
            if pair[0] == name:
                pair[1] = value
                return
        self.attrs.append([name, value])

    def remove_attr(self, name: str) -> None:
        self.attrs = [p for p in self.attrs if p[0] != name]

    # -- tree ops -----------------------------------------------------
    def append(self, node: Node) -> None:
        node.detach()
        node.parent = self
        self.children.append(node)

    def insert_before(self, node: Node, ref: Node) -> None:
        node.detach()
        node.parent = self
        try:
            i = self.children.index(ref)
        except ValueError:
            self.children.append(node)
            return
        self.children.insert(i, node)

    def replace_with_nodes(self, nodes: list) -> None:
        """Replace this element in its parent with ``nodes`` (no-op if detached)."""
        p = self.parent
        if p is None:
            return
        try:
            i = p.children.index(self)
        except ValueError:
            return
        self.parent = None
        for n in nodes:
            n.detach()
        p.children[i:i + 1] = nodes
        for n in nodes:
            n.parent = p

    def replace_with_html(self, fragment: str) -> None:
        self.replace_with_nodes(parse_fragment(fragment))

    def unwrap(self) -> None:
        """Replace this element with its children (goquery ReplaceWithHtml(inner))."""
        self.replace_with_nodes(list(self.children))

    def element_children(self) -> list:
        return [c for c in self.children if c.type == ELEMENT]

    def descendants(self) -> Iterator["Element"]:
        """All descendant elements in document order (excluding self)."""
        stack = [c for c in reversed(self.children) if c.type == ELEMENT]
        while stack:
            node = stack.pop()
            yield node
            kids = [c for c in node.children if c.type == ELEMENT]
            stack.extend(reversed(kids))

    def iter_nodes(self) -> Iterator[Node]:
        """All descendant nodes (any type) in document order, excluding self."""
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if node.type == ELEMENT:
                stack.extend(reversed(node.children))

    def next_element_sibling(self) -> Optional["Element"]:
        p = self.parent
        if p is None:
            return None
        sibs = p.children
        try:
            i = sibs.index(self)
        except ValueError:
            return None
        for s in sibs[i + 1:]:
            if s.type == ELEMENT:
                return s
        return None

    def next_element_siblings(self) -> list:
        p = self.parent
        if p is None:
            return []
        sibs = p.children
        try:
            i = sibs.index(self)
        except ValueError:
            return []
        return [s for s in sibs[i + 1:] if s.type == ELEMENT]

    def ancestor_count(self) -> int:
        n = 0
        p = self.parent
        while p is not None:
            n += 1
            p = p.parent
        return n

    def closest(self, tag: str) -> Optional["Element"]:
        el: Optional[Element] = self
        while el is not None:
            if el.tag == tag:
                return el
            el = el.parent
        return None

    # -- text / serialization ------------------------------------------
    def text(self) -> str:
        parts: list = []
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            t = node.type
            if t == TEXT:
                parts.append(node.data)
            elif t == ELEMENT:
                stack.extend(reversed(node.children))
        return "".join(parts)

    def inner_html(self) -> str:
        out: list = []
        raw = self.tag in RAW_TEXT_ELEMENTS
        for c in self.children:
            _render(c, out, raw)
        return "".join(out)

    def outer_html(self) -> str:
        out: list = []
        _render(self, out, False)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} attrs={self.attrs} kids={len(self.children)}>"


# ---------------------------------------------------------------------------
# Serialization (x/net/html render parity)
# ---------------------------------------------------------------------------

def escape_html(s: str) -> str:
    if not ("&" in s or "<" in s or ">" in s or '"' in s or "'" in s or "\r" in s):
        return s
    return (
        s.replace("&", "&amp;")
        .replace("'", "&#39;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&#34;")
        .replace("\r", "&#13;")
    )


def _render(node: Node, out: list, parent_raw: bool) -> None:
    t = node.type
    if t == TEXT:
        out.append(node.data if parent_raw else escape_html(node.data))
        return
    if t == COMMENT:
        out.append("<!--")
        out.append(node.data)
        out.append("-->")
        return
    tag = node.tag
    out.append("<")
    out.append(tag)
    for k, v in node.attrs:
        out.append(" ")
        out.append(k)
        out.append('="')
        out.append(escape_html(v))
        out.append('"')
    if tag in VOID_ELEMENTS:
        out.append("/>")
        return
    out.append(">")
    raw = tag in RAW_TEXT_ELEMENTS
    for c in node.children:
        _render(c, out, raw)
    out.append("</")
    out.append(tag)
    out.append(">")


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

class _TreeBuilder(HTMLParser):
    """HTML5-ish tree builder (pragmatic subset of the spec)."""

    def __init__(self, fragment: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.fragment = fragment
        self.root = Element("#fragment") if fragment else Element("#document")
        if fragment:
            self.html = self.head = self.body = None
            self.stack = [self.root]
            self.body_started = True
        else:
            self.html = Element("html")
            self.head = Element("head")
            self.body = Element("body")
            self.root.append(self.html)
            self.html.append(self.head)
            self.html.append(self.body)
            self.stack = [self.head]
            self.body_started = False
        # parallel to self.stack: is the element inside an <svg> subtree?
        # (kept as a list so deep documents stay O(n), not O(n^2))
        self.svg_flags = [False]

    # -- helpers --
    def _cur(self) -> Element:
        return self.stack[-1]

    def _push(self, el: Element) -> None:
        self.svg_flags.append(self.svg_flags[-1] or el.tag == "svg")
        self.stack.append(el)

    def _truncate(self, i: int) -> None:
        del self.stack[i:]
        del self.svg_flags[i:]
        if not self.stack:
            self.stack = [self.body if not self.fragment else self.root]
            self.svg_flags = [False]

    def _start_body(self) -> None:
        if not self.body_started:
            self.body_started = True
            self.stack = [self.body]
            self.svg_flags = [False]

    def _implied_close(self, tag: str) -> None:
        # close <p> when a p-closing block opens
        if tag in _P_CLOSERS:
            for i in range(len(self.stack) - 1, -1, -1):
                t = self.stack[i].tag
                if t == "p":
                    self._truncate(i)
                    return
                if t in ("div", "td", "th", "li", "body", "#fragment", "table",
                         "section", "article", "main", "blockquote"):
                    break
        closers = _IMPLIED_END.get(tag)
        if closers:
            for i in range(len(self.stack) - 1, -1, -1):
                t = self.stack[i].tag
                if t in closers:
                    self._truncate(i)
                    return
                if t in ("table", "ul", "ol", "dl", "select", "body", "#fragment",
                         "tbody", "thead", "tfoot", "tr") and t not in closers:
                    break

    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if not self.fragment:
            if tag == "html":
                for k, v in attrs:
                    if not self.html.has_attr(k):
                        self.html.set_attr(k, v or "")
                return
            if tag == "head":
                for k, v in attrs:
                    if not self.head.has_attr(k):
                        self.head.set_attr(k, v or "")
                return
            if tag == "body":
                self._start_body()
                for k, v in attrs:
                    if not self.body.has_attr(k):
                        self.body.set_attr(k, v or "")
                return
            if not self.body_started and tag not in HEAD_ELEMENTS:
                self._start_body()

        self._implied_close(tag)

        # implied tbody for tr directly inside table (HTML5/x-net-html parity)
        if tag == "tr" and self._cur().tag == "table":
            tbody = Element("tbody")
            self._cur().append(tbody)
            self._push(tbody)
        elif tag in ("td", "th") and self._cur().tag == "table":
            tbody = Element("tbody")
            self._cur().append(tbody)
            self._push(tbody)
            tr = Element("tr")
            tbody.append(tr)
            self._push(tr)
        elif tag in ("td", "th") and self._cur().tag in ("tbody", "thead", "tfoot"):
            tr = Element("tr")
            self._cur().append(tr)
            self._push(tr)

        in_svg = tag == "svg" or self.svg_flags[-1]
        if in_svg and tag in _SVG_TAG_ADJUST:
            tag = _SVG_TAG_ADJUST[tag]

        seen = set()
        attr_pairs = []
        for k, v in attrs:
            k = k.lower()
            if in_svg and k in _SVG_ATTR_ADJUST:
                k = _SVG_ATTR_ADJUST[k]
            if k in seen:
                continue
            seen.add(k)
            attr_pairs.append([k, v if v is not None else ""])
        el = Element(tag, attr_pairs)
        self._cur().append(el)
        if tag not in VOID_ELEMENTS:
            self._push(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            self.handle_starttag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            self.handle_endtag(tag)

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in VOID_ELEMENTS:
            return
        if not self.fragment and tag in ("html", "body", "head"):
            if tag == "head" and not self.body_started:
                self._start_body()
            return
        adjusted = _SVG_TAG_ADJUST.get(tag)
        for i in range(len(self.stack) - 1, -1, -1):
            t = self.stack[i].tag
            if t == tag or (adjusted is not None and t == adjusted):
                self._truncate(i)
                return
        # no matching open tag: ignore

    def handle_data(self, data: str) -> None:
        if not data:
            return
        if not self.fragment and not self.body_started:
            cur = self._cur()
            if cur is self.head:
                if data.strip():
                    self._start_body()
                else:
                    return  # drop inter-head whitespace like x/net/html "before head"
        cur = self._cur()
        kids = cur.children
        if kids and kids[-1].type == TEXT:
            kids[-1].data += data
        else:
            t = Text(data)
            t.parent = cur
            kids.append(t)

    def handle_comment(self, data: str) -> None:
        if not self.fragment and not self.body_started and self._cur() is self.head:
            c = Comment(data)
            c.parent = self.head
            self.head.children.append(c)
            return
        c = Comment(data)
        cur = self._cur()
        c.parent = cur
        cur.children.append(c)

    def handle_decl(self, decl: str) -> None:
        pass  # doctype dropped (we re-serialize inner content only)


class Document:
    """Parsed HTML document with html/head/body shell."""

    __slots__ = ("root", "html", "head", "body")

    def __init__(self, root: Element, html: Element, head: Element, body: Element):
        self.root = root
        self.html = html
        self.head = head
        self.body = body

    def descendants(self) -> Iterator[Element]:
        return self.html_descendants()

    def html_descendants(self) -> Iterator[Element]:
        yield self.html
        yield from self.html.descendants()


def parse(html_str: str) -> Document:
    builder = _TreeBuilder(fragment=False)
    try:
        builder.feed(html_str)
        builder.close()
    except Exception:
        pass  # keep whatever tree was built; per-doc failure isolation
    return Document(builder.root, builder.html, builder.head, builder.body)


def clone_node(node: Node) -> Node:
    """Deep-copy a subtree (iterative; ~5x cheaper than re-parsing)."""
    t = node.type
    if t == TEXT:
        return Text(node.data)
    if t == COMMENT:
        return Comment(node.data)
    root = Element(node.tag, [list(p) for p in node.attrs])
    stack = [(node, root)]
    while stack:
        src, dst = stack.pop()
        for child in src.children:
            ct = child.type
            if ct == TEXT:
                c = Text(child.data)
                c.parent = dst
                dst.children.append(c)
            elif ct == COMMENT:
                c = Comment(child.data)
                c.parent = dst
                dst.children.append(c)
            else:
                c = Element(child.tag, [list(p) for p in child.attrs])
                c.parent = dst
                dst.children.append(c)
                stack.append((child, c))
    return root


def clone_document(doc: Document) -> Document:
    """Deep-copy a Document (used by the kernel's retry: one parse, two
    independent mutation passes)."""
    root = clone_node(doc.root)
    html = next(c for c in root.children if c.type == ELEMENT and c.tag == "html")
    head = next(c for c in html.children if c.type == ELEMENT and c.tag == "head")
    body = next(c for c in html.children if c.type == ELEMENT and c.tag == "body")
    return Document(root, html, head, body)


def parse_fragment(fragment: str) -> list:
    builder = _TreeBuilder(fragment=True)
    try:
        builder.feed(fragment)
        builder.close()
    except Exception:
        pass
    nodes = list(builder.root.children)
    for n in nodes:
        n.parent = None
    builder.root.children = []
    return nodes

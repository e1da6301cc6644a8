"""Optional element processors E1-E6 (SURVEY.md §2.6).

Reimplements /root/reference/internal/elements/ — code.go, images.go,
footnotes.go, math.go, headings.go, roles.go. In the reference these are
implemented+tested but NOT wired into Parse (SPECS/40 "Explicit Gap
Contracts"); we mirror that: the default kernel path never runs them, and
they are exposed as explicit opt-in stages (Options.process_* flags on
the kernel apply them to the working document, documented extension).

All processors operate on our DOM Document/Element trees.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional

from .dom import ELEMENT, TEXT, Document, Element, parse_fragment
from .selectors import compile_selector, find_all, find_first

# ---------------------------------------------------------------------------
# shared helpers (goquery API equivalents)
# ---------------------------------------------------------------------------


def _add_class(el: Element, cls: str) -> None:
    cur = el.get("class") or ""
    if cls not in cur.split():
        el.set_attr("class", (cur + " " + cls).strip())


def _remove_class(el: Element, cls: str) -> None:
    cur = el.get("class")
    if not cur:
        return
    tokens = [t for t in cur.split() if t != cls]
    if tokens:
        el.set_attr("class", " ".join(tokens))
    else:
        el.remove_attr("class")


def _has_class(el: Element, cls: str) -> bool:
    return cls in (el.get("class") or "").split()


def _append_html(el: Element, html: str) -> None:
    for node in parse_fragment(html):
        el.append(node)


def _after_html(el: Element, html: str) -> None:
    parent = el.parent
    if parent is None:
        return
    idx = parent.children.index(el)
    nodes = parse_fragment(html)
    for n in nodes:
        n.detach()
        n.parent = parent
    parent.children[idx + 1:idx + 1] = nodes


def _wrap_html(el: Element, tag: str) -> Element:
    wrapper = Element(tag)
    el.replace_with_nodes([wrapper])
    wrapper.append(el)
    return wrapper


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# ---------------------------------------------------------------------------
# E6 — ARIA roles (roles.go:41-151)
# ---------------------------------------------------------------------------

@dataclass
class RoleProcessingOptions:
    convert_paragraphs: bool = True
    convert_lists: bool = True
    convert_buttons: bool = True
    convert_links: bool = True


def _replace_element_tag(el: Element, new_tag: str) -> None:
    """roles.go:126-151 — rebuild with all non-role attributes kept."""
    new_el = Element(new_tag, [[k, v] for k, v in el.attrs if k != "role"])
    for node in list(el.children):
        new_el.append(node)
    el.replace_with_nodes([new_el])


def process_roles(doc: Document,
                  options: Optional[RoleProcessingOptions] = None) -> None:
    if options is None:
        options = RoleProcessingOptions()
    root = doc.html
    if options.convert_paragraphs:
        for el in find_all(root, '[role="paragraph"]'):
            _replace_element_tag(el, "p")
    if options.convert_lists:
        for lst in find_all(root, '[role="list"]'):
            # ordered iff any item label contains ')' or '.' (roles.go:85-96)
            ordered = False
            for item in find_all(lst, '[role="listitem"]'):
                label = find_first(item, ".label")
                text = label.text().strip() if label is not None else ""
                if ")" in text or "." in text:
                    ordered = True
                    break
            for item in find_all(lst, '[role="listitem"]'):
                for lab in find_all(item, ".label"):
                    lab.remove()
                for para in find_all(item, '[role="paragraph"]'):
                    _replace_element_tag(para, "p")
                _replace_element_tag(item, "li")
            _replace_element_tag(lst, "ol" if ordered else "ul")
    if options.convert_buttons:
        for el in find_all(root, '[role="button"]'):
            _replace_element_tag(el, "button")
    if options.convert_links:
        for el in find_all(root, '[role="link"]'):
            _replace_element_tag(el, "a")


# ---------------------------------------------------------------------------
# E5 — headings (headings.go:197-497)
# ---------------------------------------------------------------------------

@dataclass
class HeadingProcessingOptions:
    remove_navigation: bool = True
    preserve_structure: bool = True
    allowed_attributes: tuple = ("id", "class")


def _heading_nav_info(heading: Element):
    """navigation texts + elements to remove (headings.go:316-434)."""
    nav_texts: List[str] = []
    seen = set()
    to_remove: List[Element] = []
    for child in heading.descendants():
        should_remove = False
        extracted = ""
        if child.tag == "a":
            href = child.get("href")
            if href is not None and "#" in href:
                extracted = child.text().strip()
                should_remove = True
        if _has_class(child, "anchor"):
            extracted = child.text().strip()
            should_remove = True
        if child.tag == "button":
            should_remove = True
        if child.tag in ("span", "div"):
            anchor = find_first(child, 'a[href^="#"]')
            if anchor is not None:
                extracted = anchor.text().strip()
                should_remove = True
        if should_remove:
            to_remove.append(child)
            if extracted and extracted not in seen:
                nav_texts.append(extracted)
                seen.add(extracted)
                parent = child.parent
                if parent is not None and parent.type == ELEMENT:
                    ptext = parent.text().strip()
                    if ptext == child.text().strip() and ptext not in seen:
                        nav_texts.append(ptext)
                        seen.add(ptext)
    return nav_texts, to_remove


def process_headings(doc: Document,
                     options: Optional[HeadingProcessingOptions] = None) -> None:
    if options is None:
        options = HeadingProcessingOptions()
    if not options.remove_navigation:
        return
    headings = [d for d in doc.html.descendants()
                if d.tag in ("h1", "h2", "h3", "h4", "h5", "h6")]
    for heading in headings:
        nav_texts, to_remove = _heading_nav_info(heading)
        for el in to_remove:
            el.remove()
        text_content = heading.text().strip()
        if not text_content and nav_texts:
            text_content = nav_texts[0]
        if options.preserve_structure:
            parts = [f"<{heading.tag}"]
            for name in options.allowed_attributes:
                v = heading.get(name)
                if v is not None:
                    parts.append(f' {name}="{v.replace(chr(34), "&quot;")}"')
            parts.append(">" + _escape_text(text_content) + f"</{heading.tag}>")
            heading.replace_with_html("".join(parts))
        else:
            heading.children = []
            t = _escape_text(text_content)
            heading.replace_with_html(f"<{heading.tag}>{t}</{heading.tag}>")


# ---------------------------------------------------------------------------
# E1 — code blocks (code.go)
# ---------------------------------------------------------------------------

@dataclass
class CodeBlockProcessingOptions:
    detect_language: bool = True
    format_code: bool = True
    add_line_numbers: bool = False
    enable_syntax_highlight: bool = True
    wrap_in_pre: bool = True


# code.go:14-24
_HIGHLIGHTER_PATTERNS = [
    re.compile(r"^language-(\w+)$"),
    re.compile(r"^lang-(\w+)$"),
    re.compile(r"^(\w+)-code$"),
    re.compile(r"^code-(\w+)$"),
    re.compile(r"^syntax-(\w+)$"),
    re.compile(r"^code-snippet__(\w+)$"),
    re.compile(r"^highlight-(\w+)$"),
    re.compile(r"^(\w+)-snippet$"),
    re.compile(r"(?:^|\s)(?:language|lang|brush|syntax)-(\w+)(?:\s|$)"),
]

CODE_BLOCK_SELECTOR = ('pre, div[class*="prismjs"], .syntaxhighlighter, '
                       '.highlight, .highlight-source, '
                       '.wp-block-syntaxhighlighter-code, .wp-block-code, '
                       'div[class*="language-"]')

# code.go:29-52 (~120-language allowlist)
CODE_LANGUAGES = frozenset("""
abap actionscript ada adoc agda antlr4 applescript arduino armasm asciidoc
aspnet atom bash batch c clojure cmake cobol coffeescript cpp c++ crystal
csharp cs dart django dockerfile dotnet elixir elm erlang fortran fsharp
gdscript gitignore glsl golang go gradle graphql groovy haskell hs haxe hlsl
html idris java javascript js jsx jsdoc json jsonp julia kotlin latex lisp
elisp livescript lua makefile markdown md markup masm mathml matlab mongodb
mysql nasm nginx nim nix objc ocaml pascal perl php postgresql powershell
prolog puppet python regex rss ruby rb rust scala scheme shell sh solidity
sparql sql ssml svg swift tcl terraform tex toml typescript ts tsx
unrealscript verilog vhdl webassembly wasm xml yaml yml zig
""".split())

_THREE_NL_RE = re.compile(r"\n{3,}")


def _get_code_language(el: Element) -> str:
    """code.go:getCodeLanguage."""
    for attr in ("data-lang", "data-language"):
        v = el.get(attr)
        if v:
            return v.lower()
    cls = el.get("class")
    if not cls:
        return ""
    class_names = cls.split()
    if "syntaxhighlighter" in class_names:
        for name in class_names:
            if name not in ("syntaxhighlighter", "nogutter"):
                lang = name.lower()
                if lang in CODE_LANGUAGES:
                    return lang
    for name in class_names:
        lower = name.lower()
        for rx in _HIGHLIGHTER_PATTERNS:
            m = rx.search(lower) if rx.pattern.startswith("(?:") else rx.match(lower)
            if m and m.group(1) in CODE_LANGUAGES:
                return m.group(1)
    for name in class_names:
        if name.lower() in CODE_LANGUAGES:
            return name.lower()
    return ""


def _detect_language_hierarchical(el: Element) -> str:
    cur: Optional[Element] = el
    while cur is not None and cur.type == ELEMENT:
        lang = _get_code_language(cur)
        if lang:
            return lang
        code = find_first(cur, "code")
        if code is not None:
            lang = _get_code_language(code)
            if lang:
                return lang
        cur = cur.parent
    return ""


_LINE_SELECTORS = ['div[class*="line"]', 'span[class*="line"]', ".ec-line",
                   "[data-line-number]", "[data-line]"]
_LINE_COMPILED = [compile_selector(s) for s in _LINE_SELECTORS]


def _extract_structured_text(el: Element) -> str:
    """code.go:extractStructuredText — line-based structured extraction."""
    out: List[str] = []
    for node in el.children:
        if node.type == TEXT:
            out.append(node.data)
            continue
        if node.type != ELEMENT:
            continue
        if node.tag == "br":
            out.append("\n")
            continue
        handled = False
        for sel in _LINE_COMPILED:
            if sel.match(node):
                code_container = find_first(
                    node, '.code, .content, [class*="code-"], [class*="content-"]')
                if code_container is not None:
                    out.append(code_container.text())
                    out.append("\n")
                else:
                    line_numbers = find_all(
                        node, '.line-number, .gutter, [class*="line-number"], [class*="gutter"]')
                    if line_numbers:
                        ln_set = set(map(id, line_numbers))
                        for child in node.children:
                            if child.type == ELEMENT and id(child) in ln_set:
                                continue
                            if child.type == TEXT:
                                out.append(child.data)
                            elif child.type == ELEMENT:
                                out.append(_extract_structured_text(child))
                        out.append("\n")
                    else:
                        out.append(node.text())
                        out.append("\n")
                handled = True
                break
        if not handled:
            out.append(_extract_structured_text(node))
    return "".join(out)


def _extract_wordpress_content(el: Element) -> str:
    """code.go:extractWordPressContent."""
    container = find_first(el, ".syntaxhighlighter table .code .container")
    if container is not None:
        lines = []
        for line in container.element_children():
            parts = []
            for code in find_all(line, "code"):
                text = code.text()
                parts.append(" " * len(text) if _has_class(code, "spaces") else text)
            lines.append("".join(parts) or line.text())
        return "\n".join(lines)
    code_lines = find_all(el, ".code .line")
    if code_lines:
        lines = []
        for line in code_lines:
            parts = [code.text() for code in find_all(line, "code")]
            lines.append("".join(parts) or line.text())
        return "\n".join(lines)
    return ""


def _normalize_code(content: str) -> str:
    content = content.strip()
    content = content.replace("\t", "    ")
    content = content.replace(" ", " ")
    return _THREE_NL_RE.sub("\n\n", content)


def process_code_blocks(doc: Document,
                        options: Optional[CodeBlockProcessingOptions] = None) -> None:
    if options is None:
        options = CodeBlockProcessingOptions()
    for el in find_all(doc.html, CODE_BLOCK_SELECTOR):
        if el.parent is None:
            continue
        language = _detect_language_hierarchical(el) if options.detect_language else ""
        if _has_class(el, "syntaxhighlighter") or _has_class(el, "wp-block-syntaxhighlighter-code"):
            content = _extract_wordpress_content(el) or _extract_structured_text(el)
        else:
            content = _extract_structured_text(el)
        content = _normalize_code(content)
        if options.format_code:
            lang_attrs = (f' data-lang="{language}" class="language-{language}"'
                          if language else "")
            el.replace_with_html(
                f"<pre><code{lang_attrs}>{_escape_text(content)}</code></pre>")


# ---------------------------------------------------------------------------
# E4 — math (math.go)
# ---------------------------------------------------------------------------

@dataclass
class MathProcessingOptions:
    extract_mathml: bool = True
    extract_latex: bool = True
    cleanup_scripts: bool = True
    preserve_display: bool = True


MATH_SELECTOR = ('math, .MathJax, .MathJax_Display, .MathJax_Preview, .katex, '
                 '.katex-display, .katex-block, script[type^="math/"], '
                 'script[type="application/x-tex"], script[type="text/latex"], '
                 "[data-math], [data-latex], [data-katex], [data-mathjax]")

_LATEX_PATTERNS = [
    re.compile(r"\$.*\$"), re.compile(r"\\\w+"), re.compile(r"\{.*\}"),
    re.compile(r"\^"), re.compile(r"_"), re.compile(r"\\frac"),
    re.compile(r"\\sum"), re.compile(r"\\int"),
    re.compile(r"\\alpha|\\beta|\\gamma"),
]


def looks_like_latex(text: str) -> bool:
    """math.go:looksLikeLaTeX."""
    if not text:
        return False
    return any(rx.search(text) for rx in _LATEX_PATTERNS)


def _get_mathml_data(el: Element) -> Optional[dict]:
    """math.go:getMathMLFromElement."""
    math_el = el if el.tag == "math" else find_first(el, "math")
    if math_el is not None:
        return {"mathml": math_el.outer_html(), "type": "mathml",
                "display": math_el.get("display") or "inline"}
    if _has_class(el, "katex"):
        ann = find_first(el, 'annotation[encoding="application/x-tex"]')
        if ann is not None:
            return {"latex": ann.text().strip(), "type": "katex"}
    if _has_class(el, "MathJax"):
        script = find_first(el, 'script[type^="math/"]')
        if script is not None:
            return {"latex": script.text().strip(), "type": "mathjax"}
    return None


def _get_latex(el: Element) -> str:
    """math.go:getLaTeXFromElement."""
    for attr in ("data-latex", "data-tex"):
        v = el.get(attr)
        if v:
            return v
    for sel in ('script[type^="math/"]', 'script[type="application/x-tex"]',
                'script[type="text/latex"]'):
        script = el if (el.tag == "script" and compile_selector(sel).match(el)) \
            else find_first(el, sel)
        if script is not None:
            content = script.text().strip()
            if content:
                return content
    ann = find_first(el, 'annotation[encoding="application/x-tex"]')
    if ann is not None and ann.text().strip():
        return ann.text().strip()
    text = el.text().strip()
    return text if looks_like_latex(text) else ""


def _is_block_display(el: Element) -> bool:
    """math.go:isBlockDisplay."""
    math_el = find_first(el, "math")
    if math_el is not None and math_el.has_attr("display"):
        return math_el.get("display") == "block"
    for cls in ("MathJax_Display", "katex-display", "katex-block"):
        if _has_class(el, cls):
            return True
    parent = el.parent
    if parent is not None and parent.type == ELEMENT:
        if parent.tag == "div" and _has_class(parent, "math-display"):
            return True
        style = parent.get("style")
        if style:
            lower = style.lower()
            if "text-align" in lower and "center" in lower:
                return True
    return False


def process_math(doc: Document,
                 options: Optional[MathProcessingOptions] = None) -> None:
    if options is None:
        options = MathProcessingOptions()
    for el in find_all(doc.html, MATH_SELECTOR):
        if _has_class(el, "MathJax_Preview"):
            continue
        if el.tag == "script":
            parent = el.parent
            if parent is not None and parent.type == ELEMENT and any(
                    _has_class(parent, c) for c in
                    ("MathJax", "MathJax_Display", "katex", "katex-display",
                     "katex-block")):
                continue
        if el.parent is None:
            continue
        math_data = _get_mathml_data(el) if options.extract_mathml else None
        latex = _get_latex(el) if options.extract_latex else ""
        is_block = _is_block_display(el) if options.preserve_display else False

        parts = ['<math xmlns="http://www.w3.org/1998/Math/MathML"',
                 ' display="block"' if is_block else ' display="inline"']
        if latex:
            # math.go:258-261 escapes `"` then `&` in that order (quirk kept)
            escaped = latex.replace('"', "&quot;").replace("&", "&amp;")
            parts.append(f' data-latex="{escaped}"')
        parts.append(">")
        if math_data and math_data.get("mathml"):
            mathml = math_data["mathml"]
            if mathml.startswith("<math"):
                start = mathml.find(">")
                end = mathml.rfind("</math>")
                parts.append(mathml[start + 1:end] if 0 <= start < end else mathml)
            else:
                parts.append(mathml)
        elif latex:
            parts.append(_escape_text(latex))
        parts.append("</math>")

        parent = el.parent
        if options.cleanup_scripts and parent is not None and parent.type == ELEMENT:
            for sel in ('script[type^="math/"]', ".MathJax_Preview",
                        'script[type="text/javascript"][src*="mathjax"]',
                        'script[type="text/javascript"][src*="katex"]'):
                for sc in find_all(parent, sel):
                    if sc is not el:
                        sc.remove()
        el.replace_with_html("".join(parts))


# ---------------------------------------------------------------------------
# E2 — images (images.go)
# ---------------------------------------------------------------------------

@dataclass
class ImageProcessingOptions:
    enable_lazy_loading: bool = True
    enable_responsive: bool = True
    generate_alt_text: bool = True
    optimize_images: bool = True
    remove_small_images: bool = True
    min_image_width: int = 50
    min_image_height: int = 50
    max_image_width: int = 1200
    max_image_height: int = 800


_TRACKING_PATTERNS = [re.compile(p) for p in
                      (r"pixel\.gif", r"1x1\.gif", r"tracking\.gif",
                       "analytics", "metrics", "beacon")]
_GENERIC_FILENAME_PATTERNS = [re.compile(p) for p in (
    r"^image\d*\.(jpg|jpeg|png|gif|webp)$", r"^img\d*\.(jpg|jpeg|png|gif|webp)$",
    r"^picture\d*\.(jpg|jpeg|png|gif|webp)$", r"^photo\d*\.(jpg|jpeg|png|gif|webp)$",
    r"^screenshot\d*\.(jpg|jpeg|png|gif|webp)$", r"^\d+\.(jpg|jpeg|png|gif|webp)$",
    r"^untitled\d*\.(jpg|jpeg|png|gif|webp)$")]
_GENERIC_ALT_TERMS = ("image", "picture", "photo", "screenshot", "icon",
                      "logo", "banner", "graphic")
_DECORATIVE_CLASSES = ("icon", "avatar", "emoji", "bullet", "decoration",
                       "logo-small")
_FILE_EXT_RE = re.compile(r"\.[^.]+$")
_SEPARATORS_RE = re.compile(r"[-_]")
_CAMEL_RE = re.compile(r"([a-z])([A-Z])")
_WS_RE = re.compile(r"\s+")


def _int_attr(el: Element, name: str) -> Optional[int]:
    v = el.get(name)
    if v is None:
        return None
    try:
        return int(v)
    except ValueError:
        return None


def _is_tracking_pixel(src: str) -> bool:
    if not src:
        return False
    s = src.lower()
    return any(rx.search(s) for rx in _TRACKING_PATTERNS)


def _is_generic_alt(alt: str) -> bool:
    a = alt.strip().lower()
    if len(a) < 3:
        return True
    return any(a == t or t in a for t in _GENERIC_ALT_TERMS)


class _ImageContext:
    def __init__(self, doc: Document) -> None:
        self.doc = doc

    def _all_imgs(self) -> List[Element]:
        return [d for d in self.doc.html.descendants() if d.tag == "img"]

    def is_above_fold(self, img: Element) -> bool:
        imgs = self._all_imgs()
        try:
            return imgs.index(img) < 3
        except ValueError:
            return False

    def is_important(self, img: Element) -> bool:
        fig = img.closest("figure")
        if fig is not None and _has_class(fig, "featured"):
            return True
        if self.is_above_fold(img):
            return True
        alt = img.get("alt") or ""
        if len(alt) > 20 and not _is_generic_alt(alt):
            return True
        p = img.parent
        while p is not None and p.type == ELEMENT:
            if p.tag in ("article", "main") or _has_class(p, "content") or _has_class(p, "post"):
                return True
            p = p.parent
        return False

    def is_decorative(self, img: Element, src: str) -> bool:
        w, h = _int_attr(img, "width"), _int_attr(img, "height")
        if w is not None and w < 50:
            return True
        if h is not None and h < 50:
            return True
        cls = (img.get("class") or "").lower()
        if any(c in cls for c in _DECORATIVE_CLASSES):
            return True
        return _is_tracking_pixel(src)

    def find_nearby_heading(self, img: Element) -> str:
        parent = img.parent
        if parent is None or parent.type != ELEMENT:
            return ""
        heading_text = ""
        for h in parent.descendants():
            if h.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
                t = h.text().strip()
                if t and len(t) < 100:
                    heading_text = t
        if heading_text:
            return heading_text
        ancestor = parent.parent
        while ancestor is not None and ancestor.type == ELEMENT and ancestor.tag != "body":
            h = next((d for d in ancestor.descendants()
                      if d.tag in ("h1", "h2", "h3", "h4", "h5", "h6")), None)
            if h is not None:
                t = h.text().strip()
                if t and len(t) < 100:
                    return t
            ancestor = ancestor.parent
        return ""

    def contextual_alt(self, img: Element) -> str:
        heading = self.find_nearby_heading(img)
        if heading:
            return heading
        link = img.closest("a")
        if link is not None:
            t = link.text().strip()
            if t and t != (img.get("alt") or ""):
                return t
        aria = img.get("aria-label")
        if aria is not None:
            return aria
        parent = img.parent
        while parent is not None and parent.type == ELEMENT and parent.tag != "body":
            text = parent.text().strip()
            if 10 < len(text) < 100 and len(parent.element_children()) <= 2:
                return text
            parent = parent.parent
        return ""

    def alt_from_filename(self, src: str) -> str:
        path = src.split("?")[0].split("#")[0]
        filename = path.rsplit("/", 1)[-1]
        if not filename or any(rx.match(filename.lower())
                               for rx in _GENERIC_FILENAME_PATTERNS):
            return ""
        readable = _FILE_EXT_RE.sub("", filename)
        readable = _SEPARATORS_RE.sub(" ", readable)
        readable = _CAMEL_RE.sub(r"\1 \2", readable)
        readable = _WS_RE.sub(" ", readable).strip()
        if readable:
            readable = readable[0].upper() + readable[1:]
        return readable

    def generate_alt(self, img: Element) -> str:
        title = img.get("title")
        if title and len(title) > 3:
            return title.strip()
        fig = img.closest("figure")
        if fig is not None:
            cap = find_first(fig, "figcaption")
            if cap is not None and cap.text().strip():
                return cap.text().strip()
        ctx = self.contextual_alt(img)
        if ctx:
            return ctx
        src = img.get("src")
        if src:
            return self.alt_from_filename(src)
        return ""


def process_images(doc: Document,
                   options: Optional[ImageProcessingOptions] = None) -> None:
    if options is None:
        options = ImageProcessingOptions()
    ctx = _ImageContext(doc)

    def process_image(img: Element) -> None:
        src = img.get("src")
        if src is None:
            data_src = img.get("data-src")
            if data_src is None:
                return
            src = data_src
            img.set_attr("src", data_src)
        if options.remove_small_images and ctx.is_decorative(img, src):
            img.remove()
            return
        if options.optimize_images:
            data_srcset = img.get("data-srcset")
            if data_srcset is not None and not img.has_attr("srcset"):
                img.set_attr("srcset", data_srcset)
            for a in ("data-src", "data-srcset", "data-lazy"):
                img.remove_attr(a)
            _remove_class(img, "lazy")
            _remove_class(img, "lazyload")
        if options.generate_alt_text:
            alt = img.get("alt") or ""
            if not alt or _is_generic_alt(alt):
                generated = ctx.generate_alt(img)
                if generated:
                    img.set_attr("alt", generated)
        if options.enable_lazy_loading:
            if not img.has_attr("loading"):
                img.set_attr("loading", "lazy")
            if ctx.is_above_fold(img):
                img.set_attr("loading", "eager")
            else:
                img.set_attr("data-lazy", "true")
        if options.enable_responsive:
            _add_class(img, "responsive-image")
            style = img.get("style") or ""
            if "max-width" not in style:
                style = "max-width: 100%;" if not style else style + " max-width: 100%;"
            if "height" not in style:
                style += " height: auto;"
            img.set_attr("style", style)
            if not img.has_attr("sizes"):
                img.set_attr("sizes", "(max-width: 768px) 100vw, 50vw")
        if not img.has_attr("decoding"):
            img.set_attr("decoding", "async")
        if ctx.is_important(img) and not img.has_attr("fetchpriority"):
            img.set_attr("fetchpriority", "high")

    for img in find_all(doc.html, "img"):
        process_image(img)

    for fig in find_all(doc.html, "figure"):
        img = find_first(fig, "img")
        if img is None:
            continue
        process_image(img)
        if img.parent is None:
            continue
        cap = find_first(fig, "figcaption")
        if cap is not None:
            cap_text = cap.text().strip()
            if not cap_text:
                cap.remove()
            else:
                if len(cap_text) > 200:
                    _add_class(cap, "long-caption")
                img_id = img.get("id")
                if not img_id:
                    n_ids = sum(1 for d in doc.html.descendants()
                                if d.tag == "img" and d.has_attr("id"))
                    img_id = f"img-{n_ids + 1}"
                    img.set_attr("id", img_id)
                cap.set_attr("aria-describedby", img_id)
        elif options.generate_alt_text:
            alt = img.get("alt") or ""
            if len(alt) >= 10 and not _is_generic_alt(alt):
                _append_html(fig, f"<figcaption>{_escape_text(alt)}</figcaption>")
        _add_class(fig, "image-figure")
        w = _int_attr(img, "width")
        if w is not None:
            if w > 800:
                _add_class(fig, "large-image")
            elif w < 300:
                _add_class(fig, "small-image")

    for pic in find_all(doc.html, "picture"):
        for source in find_all(pic, "source"):
            srcset = source.get("srcset")
            if srcset:
                source.set_attr("srcset", srcset.strip())
        img = find_first(pic, "img")
        if img is not None and img.parent is not None:
            process_image(img)

    if options.remove_small_images:
        for img in find_all(doc.html, "img"):
            w, h = _int_attr(img, "width"), _int_attr(img, "height")
            small = ((w is not None and 0 < w < options.min_image_width)
                     or (h is not None and 0 < h < options.min_image_height))
            if small:
                img.remove()
                continue
            if ctx.is_important(img):
                continue
            src = img.get("src") or ""
            if _is_tracking_pixel(src) or ctx.is_decorative(img, src):
                img.remove()


# ---------------------------------------------------------------------------
# E3 — footnotes (footnotes.go)
# ---------------------------------------------------------------------------

@dataclass
class FootnoteProcessingOptions:
    detect_footnotes: bool = True
    link_footnotes: bool = True
    improve_accessibility: bool = True
    generate_section: bool = True
    number_footnotes: bool = True
    footnote_prefix: str = "fn"
    section_title: str = "Footnotes"
    section_location: str = "end"


@dataclass
class Footnote:
    id: str = ""
    number: int = 0
    reference: Optional[Element] = None
    definition: Optional[Element] = None
    content: str = ""
    ref_text: str = ""
    linked: bool = False


_TEXT_FOOTNOTE_PATTERNS = [
    re.compile(r"\[(\d+)\]"), re.compile(r"\((\d+)\)"), re.compile(r"\*(\d+)"),
    re.compile(r"†(\d+)"), re.compile(r"\[([a-zA-Z]+)\]"),
]


class FootnoteProcessor:
    def __init__(self, doc: Document) -> None:
        self.doc = doc

    def _find_by_id(self, el_id: str) -> Optional[Element]:
        for d in self.doc.html.descendants():
            if d.get("id") == el_id:
                return d
        return None

    def detect_existing(self) -> List[Footnote]:
        out = []
        for ref in find_all(self.doc.html,
                            "sup a[href^='#'], a.footnote, .footnote-ref, "
                            "a[href^='#footnote'], a[href^='#fn']"):
            href = ref.get("href")
            if not href:
                continue
            fid = href.lstrip("#")
            if not fid:
                continue
            definition = self._find_by_id(fid)
            fn = Footnote(id=fid, reference=ref, definition=definition,
                          ref_text=ref.text().strip())
            if definition is not None:
                fn.content = definition.text().strip()
            out.append(fn)
        return out

    def find_footnote_definition(self, key: str) -> Optional[Element]:
        """footnotes.go:findFootnoteDefinition — id patterns then prefixes."""
        for sel in (f"#footnote-{key}", f"#fn-{key}", f"#note-{key}",
                    f"#ref-{key}", f"[data-footnote='{key}']",
                    f"[data-note='{key}']"):
            try:
                el = find_first(self.doc.html, sel)
            except ValueError:
                el = None
            if el is not None:
                return el
        el = self._find_by_id(f"fn:{key}")  # '#fn:key' (colon not CSS-safe)
        if el is not None:
            return el
        for section in find_all(self.doc.html,
                                ".footnotes, .notes, .references, .endnotes"):
            for cand in find_all(section, "li, div, p"):
                text = cand.text()
                if (text.startswith(f"{key}.") or text.startswith(f"[{key}]")
                        or text.startswith(f"{key})")):
                    return cand
        return None

    def detect_text_footnotes(self, options: FootnoteProcessingOptions) -> List[Footnote]:
        out = []
        skip = compile_selector("sup, .footnote, .footnote-ref")
        # One tree walk + one subtree-text materialization per element,
        # shared across all patterns (the loop stays pattern-major so the
        # footnote numbering order matches the reference's).
        candidates = [(el, el.text()) for el in self.doc.html.descendants()
                      if not skip.match(el)]
        for rx in _TEXT_FOOTNOTE_PATTERNS:
            for el, el_text in candidates:
                for m in rx.finditer(el_text):
                    key = m.group(1)
                    definition = self.find_footnote_definition(key)
                    fn = Footnote(id=f"{options.footnote_prefix or 'fn'}-{key}",
                                  ref_text=m.group(0), definition=definition)
                    if definition is not None:
                        fn.content = definition.text().strip()
                    out.append(fn)
        return out

    def detect_wikipedia(self) -> List[Footnote]:
        out = []
        for lst in find_all(self.doc.html,
                            "ol.references, ul.references, .footnotes ol, .footnotes ul"):
            for li in find_all(lst, "li"):
                lid = li.get("id")
                if lid is None:
                    continue
                fn = Footnote(id=lid, definition=li, content=li.text().strip())
                backlink = find_first(li, "a[href^='#cite_ref'], a.mw-cite-backlink")
                if backlink is not None:
                    rid = (backlink.get("href") or "").lstrip("#")
                    ref = self._find_by_id(rid)
                    if ref is not None:
                        fn.reference = ref
                out.append(fn)
        return out

    def process(self, options: Optional[FootnoteProcessingOptions] = None) -> List[Footnote]:
        if options is None:
            options = FootnoteProcessingOptions()
        footnotes: List[Footnote] = []
        if options.detect_footnotes:
            footnotes = (self.detect_existing()
                         + self.detect_text_footnotes(options)
                         + self.detect_wikipedia())
        if options.number_footnotes:
            from .dom import Text
            for i, fn in enumerate(footnotes):
                fn.number = i + 1
                if fn.reference is not None:
                    fn.reference.children = []
                    txt = Text(str(fn.number))
                    txt.parent = fn.reference
                    fn.reference.children.append(txt)
        if options.link_footnotes:
            for fn in footnotes:
                if fn.reference is None or fn.definition is None:
                    continue
                parent = fn.reference.parent
                if parent is None or parent.type != ELEMENT or parent.tag != "sup":
                    parent = _wrap_html(fn.reference, "sup")
                ref_id = f"{options.footnote_prefix}ref:{fn.number}"
                def_id = f"{options.footnote_prefix}:{fn.number}"
                parent.set_attr("id", ref_id)
                fn.reference.set_attr("href", f"#{def_id}")
                fn.definition.set_attr("id", def_id)
                _append_html(fn.definition,
                             f'<a href="#{ref_id}" class="footnote-backref">↩</a>')
                fn.linked = True
        if options.improve_accessibility:
            for fn in footnotes:
                if fn.reference is not None:
                    fn.reference.set_attr("role", "doc-noteref")
                    fn.reference.set_attr("aria-describedby", fn.id)
                if fn.definition is not None:
                    fn.definition.set_attr("role", "doc-endnote")
                    fn.definition.set_attr("aria-label", f"Footnote {fn.number}")
        if options.generate_section and footnotes:
            parts = [f'<div class="footnotes">\n<h2>{options.section_title}</h2>\n<ol>']
            for fn in footnotes:
                if not fn.content:
                    continue
                def_id = f"{options.footnote_prefix}:{fn.number}"
                ref_id = f"{options.footnote_prefix}ref:{fn.number}"
                parts.append(
                    f'\n<li id="{def_id}" class="footnote">\n<p>{_escape_text(fn.content)} '
                    f'<a href="#{ref_id}" class="footnote-backref" '
                    f'title="return to article">↩</a></p>\n</li>')
            parts.append("\n</ol>\n</div>")
            html = "".join(parts)
            if options.section_location == "after-content":
                area = find_first(self.doc.html, "main, article, .content")
                if area is not None:
                    _after_html(area, html)
                else:
                    _append_html(self.doc.body, html)
            else:
                _append_html(self.doc.body, html)
        return footnotes

    def cleanup(self, footnotes: List[Footnote]) -> List[Footnote]:
        seen = set()
        out = []
        for fn in footnotes:
            if not fn.id or fn.id in seen:
                continue
            seen.add(fn.id)
            out.append(fn)
        return out


def process_footnotes(doc: Document,
                      options: Optional[FootnoteProcessingOptions] = None) -> List[Footnote]:
    return FootnoteProcessor(doc).process(options)

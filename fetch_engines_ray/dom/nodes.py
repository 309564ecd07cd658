"""Minimal DOM tree for HTML processing.

Plays the role node-html-parser plays in the reference
(/root/reference/src/utils/markdown-converter.ts:2) — parse once, run
selector-driven pruning passes, then serialize.  Built on the Python
stdlib only (no lxml/bs4 in this environment).  Designed for speed:
slotted nodes, lazy class-set computation, iterative traversal.
"""

from __future__ import annotations

from typing import Iterator, Optional

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Block-level tags whose OPENING implicitly closes an open <p>.
P_CLOSING_BLOCKS = frozenset(
    "address article aside blockquote div dl fieldset figure footer form "
    "h1 h2 h3 h4 h5 h6 header hr main nav ol p pre section table ul".split()
)

# Opening tag → set of open-sibling tags it implicitly closes.
_SIBLING_CLOSERS = {
    "li": frozenset(("li",)),
    "tr": frozenset(("td", "th", "tr")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "option": frozenset(("option",)),
    "dd": frozenset(("dd", "dt")),
    "dt": frozenset(("dd", "dt")),
}


class Node:
    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: Optional[Element] = None

    def remove(self) -> None:
        p = self.parent
        if p is not None:
            try:
                p.children.remove(self)
            except ValueError:
                pass
            self.parent = None

    @property
    def text_content(self) -> str:
        return ""


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    @property
    def text_content(self) -> str:
        return self.data

    def __repr__(self) -> str:  # pragma: no cover
        return f"Text({self.data[:30]!r})"


class Element(Node):
    __slots__ = ("tag", "attrs", "children", "_classes")

    def __init__(self, tag: str, attrs: Optional[dict] = None) -> None:
        super().__init__()
        self.tag = tag
        self.attrs: dict = attrs if attrs is not None else {}
        self.children: list[Node] = []
        self._classes: Optional[frozenset[str]] = None

    # -- attribute helpers -------------------------------------------------
    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def set(self, name: str, value: str) -> None:
        self.attrs[name] = value
        if name == "class":
            self._classes = None

    @property
    def id(self) -> str:
        return self.attrs.get("id", "")

    @property
    def classes(self) -> frozenset[str]:
        if self._classes is None:
            cls = self.attrs.get("class")
            self._classes = frozenset(cls.split()) if cls else frozenset()
        return self._classes

    # -- tree ops ----------------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    def prepend(self, node: Node) -> None:
        node.parent = self
        self.children.insert(0, node)

    def set_text(self, text: str) -> None:
        """Replace all children with one text node (reference: `set_content`,
        markdown-converter.ts:426)."""
        for c in self.children:
            c.parent = None
        self.children = [Text(text)]
        self.children[0].parent = self

    def clone(self) -> "Element":
        el = Element(self.tag, dict(self.attrs))
        for c in self.children:
            if isinstance(c, Element):
                el.append(c.clone())
            else:
                el.append(Text(c.data))  # type: ignore[union-attr]
        return el

    def iter_elements(self) -> Iterator["Element"]:
        """Document-order iteration over descendant elements (excl. self)."""
        stack = [c for c in reversed(self.children) if isinstance(c, Element)]
        while stack:
            el = stack.pop()
            yield el
            for c in reversed(el.children):
                if isinstance(c, Element):
                    stack.append(c)

    @property
    def text_content(self) -> str:
        """Concatenated descendant text (entities already decoded at parse)."""
        out: list[str] = []
        stack: list[Node] = list(reversed(self.children))
        while stack:
            n = stack.pop()
            if isinstance(n, Text):
                out.append(n.data)
            else:
                stack.extend(reversed(n.children))  # type: ignore[union-attr]
        return "".join(out)

    # -- serialization -----------------------------------------------------
    def to_html(self) -> str:
        out: list[str] = []
        self._write_html(out)
        return "".join(out)

    def _write_html(self, out: list[str]) -> None:
        attrs = "".join(
            f' {k}="{_escape_attr(v)}"' if v != "" else f" {k}" for k, v in self.attrs.items()
        )
        if self.tag in VOID_ELEMENTS:
            out.append(f"<{self.tag}{attrs} />")
            return
        out.append(f"<{self.tag}{attrs}>")
        for c in self.children:
            if isinstance(c, Element):
                c._write_html(out)
            else:
                out.append(_escape_text(c.data))  # type: ignore[union-attr]
        out.append(f"</{self.tag}>")

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} id={self.id!r} class={sorted(self.classes)}>"


def _escape_attr(v: str) -> str:
    return v.replace("&", "&amp;").replace('"', "&quot;")


def _escape_text(v: str) -> str:
    return v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def collect_elements(root: "Element") -> list:
    """Document-order list of descendant elements (excl. root).

    List-building loop variant of ``iter_elements`` for hot paths: one
    selector pass over a big page resumes the generator hundreds of
    thousands of times; a plain loop into a list is ~2x faster."""
    out: list = []
    append = out.append
    stack = [c for c in reversed(root.children) if isinstance(c, Element)]
    pop = stack.pop
    push = stack.append
    while stack:
        el = pop()
        append(el)
        for c in reversed(el.children):
            if isinstance(c, Element):
                push(c)
    return out

"""HTML → DOM tree parser built on the stdlib ``html.parser``.

Mirrors the parse configuration the reference uses
(/root/reference/src/utils/markdown-converter.ts:166-169):
comments dropped, ``script``/``style`` content treated as opaque text
blocks (``html.parser`` already does CDATA-mode for those two), entity
references decoded into text.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .nodes import _SIBLING_CLOSERS, P_CLOSING_BLOCKS, VOID_ELEMENTS, Element, Text


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack: list[Element] = [self.root]
        self._open_tags: list[str] = ["#root"]

    # -- handlers ----------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        # Implicit closes: a sibling-closing open tag (li/tr/td/…) pops open
        # same-group siblings; a block-level open tag closes an open <p>.
        group = _SIBLING_CLOSERS.get(tag)
        if group is not None:
            while len(self.stack) > 1 and self.stack[-1].tag in group:
                self._pop()
        if tag in P_CLOSING_BLOCKS and self.stack[-1].tag == "p":
            self._pop()
        d: dict = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        el = Element(tag, d)
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)
            self._open_tags.append(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        d: dict = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        self.stack[-1].append(Element(tag, d))

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        if tag in self._open_tags:
            while len(self.stack) > 1:
                popped = self.stack[-1].tag
                self._pop()
                if popped == tag:
                    break
        # else: stray end tag — ignore

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].append(Text(data))

    def handle_comment(self, data: str) -> None:  # dropped (comment: false)
        pass

    def handle_decl(self, decl: str) -> None:  # <!doctype html>
        pass

    # -- internals ---------------------------------------------------------
    def _pop(self) -> None:
        self.stack.pop()
        self._open_tags.pop()

    def updatepos(self, i: int, j: int) -> int:
        # line/column tracking is only for getpos()/error messages,
        # which this builder never uses — skip the newline counting
        # (hundreds of thousands of calls per large page)
        return j


def parse_html(html: str) -> Element:
    """Parse an HTML string into a DOM tree rooted at a synthetic ``#root``."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # stdlib parser is tolerant; on a hard failure return what we have
        pass
    return builder.root


def parse_fragment(html: str) -> Element:
    """Parse and return the first element child (for small snippets)."""
    root = parse_html(html)
    for c in root.children:
        if isinstance(c, Element):
            return c
    return root

"""The fast single-pass tokenizer must be byte-identical to the stdlib
html.parser path it transcribes (dom/parser.py): same tree, same
recovery on broken markup.  Any future edit to the fast path has to
keep this suite green."""

import random

import pytest

from fetch_engines_ray.dom.parser import parse_html

EDGES = [
    "", "<", ">", "</>", "</ >", "<a", "<a ", "<a href", "<a href=",
    "<a href='x", '<a href="x', "<a/>", "<a / >", "<a/ >", "<br/>",
    "<a href=x>t</a>", "<a href=x y>", "<a 'x'>",
    "<!-- c -->", "<!-- unterminated", "<!--", "<!---->", "<!-- -- >x",
    "<!doctype html>", "<!DOCTYPE html><p>x</p>", "<!doctype",
    "<![CDATA[ x ]]>", "<![CDATA[ unterminated", "<![if foo]>x<![endif]>",
    "<![weird]]>", "<![", "<?php echo ?>", "<?pi", "<?>",
    "<script>var a = '<p>';</script>", "<script>unterminated",
    "<style>a{} </style", "<script>x</SCRIPT >y",
    "<script>a</script b>c</script>d",
    "&amp; &lt; &unknown; &#65; &#x41; &#65 &amp", "a < b > c",
    "<1tag>", "<ümlaut>", "</tag attr='>'>after", "</123>", "</ tag>",
    "<a b=c d='e' f=\"g\" h>i</a>", "<p>a<p>b</p>", "<li>a<li>b",
    "<td>x<tr>y", "text&#; more", "&#xZZ;", "&;", "<a href='&amp;x'>t</a>",
    "<img src=x.png alt='y z'>", "<a\nhref='x'\n>t</a>",
    "<div class='a b  c'>x</div>", "\x00<p>\x01</p>",
    "<p>" + "&" * 40 + "</p>", "<!bogus>x", "<!>x", "</\x00>",
    "<a =b>", "<a ==>", "<a b=>x</a>",
]


@pytest.mark.parametrize("html", EDGES, ids=range(len(EDGES)))
def test_fast_parser_matches_stdlib_on_edges(html):
    assert (
        parse_html(html, _impl="fast").to_html()
        == parse_html(html, _impl="stdlib").to_html()
    )


def test_fast_parser_matches_stdlib_on_fuzz():
    rng = random.Random(20260817)
    chunks = [
        "<div>", "</div>", "<p ", "a='b'", '"', "'", ">", "<", "&amp;",
        "&", "&#65;", "text ", "<!--", "-->", "<script>", "</script>",
        "<![CDATA[", "]]>", "<!doctype html>", "<?pi?>", "=", "/", "/>",
        "\n", " ", "\x00", "é", "<img src=x>", "</a attr='>'>",
        "<![if x]>", "<![endif]>",
    ]
    for _ in range(1500):
        s = "".join(rng.choice(chunks) for _ in range(rng.randint(1, 25)))
        assert (
            parse_html(s, _impl="fast").to_html()
            == parse_html(s, _impl="stdlib").to_html()
        ), repr(s)

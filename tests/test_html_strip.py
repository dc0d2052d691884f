"""Golden + behavioral tests for the HTMLStripCharFilter port.

Golden case ported from the reference's conformance fixture
``modules/analysis-common/src/yamlRestTest/resources/rest-api-spec/test/
analysis-common/50_char_filters.yml:3-14``.
"""

import pyarrow as pa
import pytest

from elasticsearch_ray.analysis.html_strip import HtmlStripBatch, strip_html


def test_golden_escaped_tags():
    got = strip_html("<html>test<yyy>foo</yyy></html>", escaped_tags=["xxx", "yyy"])
    assert got == "\ntest<yyy>foo</yyy>\n"


@pytest.mark.parametrize(
    "inp,want",
    [
        ("<p>hello <b>world</b></p>", "\nhello world\n"),
        ("a &amp; b &lt;c&gt;", "a & b <c>"),
        ('<script type="text/javascript">var x=1;</script>after', "\nafter"),
        ("<style>.a{color:red}</style>x", "\nx"),
        ("<!-- comment -->x", "x"),
        ("<![CDATA[raw <b> text]]>", "raw <b> text"),
        ("no tags here", "no tags here"),
        ("a < b and c > d", "a < b and c > d"),
        ("line<br>break", "line\nbreak"),
        ('<div class="x">y</div>', "\ny\n"),
        ("&#65;&#x42;", "AB"),
        ('<IMG src="x.png"/>z', "z"),
        ("<span>inline</span> kept", "inline kept"),
        ("<h1>Title</h1><p>Body</p>", "\nTitle\n\nBody\n"),
        ("", ""),
    ],
)
def test_cases(inp, want):
    assert strip_html(inp) == want


def test_processor_short_circuit():
    # HtmlStripProcessor.java:29-31: no '<' or no '>' → unchanged, even entities.
    assert strip_html("a &amp; b", processor_mode=True) == "a &amp; b"
    assert strip_html("a &amp; b", processor_mode=False) == "a & b"


def test_batch_stage_binary_input():
    tbl = pa.table(
        {
            "url": ["u1", "u2"],
            "html": [b"<p>one</p>", b"plain"],
        }
    )
    out = HtmlStripBatch(src="html", dst="text")(tbl)
    assert out["text"].to_pylist() == ["\none\n", "plain"]
    assert out.column_names == ["url", "html", "text"]


# ---- split-walk fast path ≡ scanner (the fast path is an optimization of
# the single-pass scanner; any construct junction divergence is a bug) ----

_FUZZ_ATOMS = [
    "<b>", "</b>", "<div>", "</div>", "<p class='x'>", "<br/>", "< b>", "<<b>",
    "<div <b> x>", "&amp;", "&am", "p;", "&#65;", "&#x41;", "&bogus;", "&#9999999;",
    "<!-- c -->", "<!--unterm", "<!DOCTYPE html>", "<![CDATA[<b>&amp;]]>",
    "<![CDATA[unterm", "<script>var a='<b>';</script>", "<script src=x>unterm",
    "<style>p{}</style>", "text ", "ä ü É ", "<yyy>", "</yyy>", "<a href='x&amp;y'>",
    "<", ">", "<>", "</>", "<//x>", "<b", "x>", "\n", "<em/>", "<div#bad>", "&lt;b&gt;",
    "<SCRIPT>up</SCRIPT>", "<sCrIpT>", "a<!--x--><b>c", "&am<!--j-->p;", "&am<b>p;",
    "<scripty>", "<!bad", "<!x<y>", "<script>a<!--b</script>c--></script>", "<stylex>",
    "<div ", "&a", "mp;", "<b\n", "c>", "-->", "<!-", "]]>",
]


def _scanner_ref(text, esc=(), pm=False):
    from elasticsearch_ray.analysis.html_strip import _strip_html_scanner

    if "<" not in text or ">" not in text:
        if pm or "&" not in text:
            return text
    return _strip_html_scanner(text, esc)


def test_fast_path_equals_scanner_fuzz():
    import random

    rng = random.Random(0xE5)
    for _ in range(3000):
        s = "".join(rng.choice(_FUZZ_ATOMS) for _ in range(rng.randint(1, 14)))
        for esc in [(), ("yyy",), ("b", "yyy")]:
            assert strip_html(s, esc) == _scanner_ref(s, esc), (esc, s)
        assert strip_html(s, (), processor_mode=True) == _scanner_ref(s, (), True), s

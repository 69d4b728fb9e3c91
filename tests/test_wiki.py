"""MediaWiki ingestion (§2.11 document family): strict XML subset
parser + wikitext stripper.  Structure/entity/CDATA coverage, XML
strictness, every markup-stripping rule, a seeded randomized matrix,
disclosed boundaries, and the r10 fuzz contract."""

from __future__ import annotations

import numpy as np
import pytest

from asid_v2_data_pipeline_spark.functions.wiki import (
    XmlElement,
    mediawiki_pages,
    parse_xml,
    wikitext_to_lines,
)


def test_xml_structure_attrs_and_text():
    root = parse_xml(
        '<?xml version="1.0"?><a x="1" y=\'two &amp; three\'>'
        "pre<b>inner</b>post<c/> tail</a>"
    )
    assert root.tag == "a"
    assert root.attrs == {"x": "1", "y": "two & three"}
    assert root.text() == "preinnerpost tail"
    assert [c.tag for c in root.children if isinstance(c, XmlElement)] == [
        "b",
        "c",
    ]
    assert root.find("b").text() == "inner"


def test_xml_entities_cdata_comments_pis():
    root = parse_xml(
        "<r><!-- a comment --><?pi ignored?>"
        "&lt;&gt;&amp;&quot;&apos;&#65;&#x42;"
        "<![CDATA[raw <tag> & stuff]]></r>"
    )
    assert root.text() == "<>&\"'AB" + "raw <tag> & stuff"


def test_xml_strictness_is_loud():
    for bad in (
        "<a><b></a></b>",  # mismatched nesting
        "<a>",  # unclosed
        "<a></a><b></b>",  # two roots
        "<a>&undefined;</a>",  # undefined entity
        "<a>bare & ampersand</a>",  # bare &
        "<a><![CDATA[unterminated</a>",
        "<a><!-- unterminated</a>",
        "text outside <a></a>",
        "<a junk></a>",  # malformed attribute
        "<a>&#xZZ;</a>",  # bad numeric entity
    ):
        with pytest.raises(ValueError):
            parse_xml(bad)
    with pytest.raises(NotImplementedError, match="DTD"):
        parse_xml("<!DOCTYPE html><a></a>")
    # depth cap, not RecursionError
    deep = "<x>" * 500 + "</x>" * 500
    with pytest.raises(ValueError, match="deep"):
        parse_xml(deep)


def test_wikitext_stripping_rules():
    cases = [
        ("'''bold''' and ''it'' and '''''both'''''", "bold and it and both"),
        ("[[target]]", "target"),
        ("[[target|label text]]", "label text"),
        ("[[File:pic.png|thumb|caption [[x]]]]gone", "gone"),
        ("[[Category:Hidden]]tail", "tail"),
        ("{{cite|a={{deep|b}}}}after", "after"),
        ("{| class=x |cell|}after", "after"),
        ("[http://x.org label here] t", "label here t"),
        ("[http://bare.org] t", " t"),
        ("pre<ref>cite</ref>post", "prepost"),
        ('pre<ref name="a"/>post', "prepost"),
        ("<!-- gone -->kept", "kept"),
        ("<nowiki>{{literal}}</nowiki>", "{{literal}}"),
        ("<span class=x>inner</span>", "inner"),
        ("&amp; &lt; &#65; &bogus;", "& < A &bogus;"),
    ]
    for src, want in cases:
        assert wikitext_to_lines(src) == [want], src
    assert wikitext_to_lines("== Head ==\n* item\n----\nbody") == [
        "Head",
        "item",
        "body",
    ]
    # empty lines are kept (line-numbering contract)
    assert wikitext_to_lines("a\n\nb") == ["a", "", "b"]
    # template nesting depth is capped
    with pytest.raises(ValueError, match="deep"):
        wikitext_to_lines("{{" * 50 + "}}" * 50)


def test_mediawiki_pages_walk():
    xml = (
        "<mediawiki><siteinfo><sitename>s</sitename></siteinfo>"
        "<page><title>A</title><ns>0</ns><id>1</id>"
        "<revision><id>9</id><text>alpha</text></revision></page>"
        "<page><title>B</title><ns>4</ns><id>2</id>"
        "<revision><id>9</id><text>beta</text></revision></page>"
        "</mediawiki>"
    )
    pages = mediawiki_pages(xml)
    assert [(p["title"], p["ns"], p["page_id"], p["wikitext"]) for p in pages] == [
        ("A", 0, 1, "alpha"),
        ("B", 4, 2, "beta"),
    ]
    with pytest.raises(ValueError, match="mediawiki"):
        mediawiki_pages("<other/>")


def test_xml_randomized_roundtrip_matrix():
    """Serialize random trees, parse, compare structure + text."""
    rng = np.random.default_rng(95)

    def build(depth):
        tag = f"t{int(rng.integers(0, 8))}"
        attrs = {
            f"a{j}": f"v{int(rng.integers(0, 99))} &amp; x"
            for j in range(int(rng.integers(0, 3)))
        }
        kids = []
        if depth < 4:
            for _ in range(int(rng.integers(0, 4))):
                if rng.integers(0, 2):
                    kids.append(f"text{int(rng.integers(0, 50))} ")
                else:
                    kids.append(build(depth + 1))
        return (tag, attrs, kids)

    def ser(node):
        tag, attrs, kids = node
        a = "".join(f' {k}="{v}"' for k, v in attrs.items())
        if not kids:
            return f"<{tag}{a}/>"
        inner = "".join(k if isinstance(k, str) else ser(k) for k in kids)
        return f"<{tag}{a}>{inner}</{tag}>"

    def check(el, node):
        tag, attrs, kids = node
        assert el.tag == tag
        assert el.attrs == {
            k: v.replace("&amp;", "&") for k, v in attrs.items()
        }
        sub = [c for c in el.children if isinstance(c, XmlElement)]
        want_sub = [k for k in kids if not isinstance(k, str)]
        assert len(sub) == len(want_sub)
        for e2, n2 in zip(sub, want_sub):
            check(e2, n2)

    for trial in range(25):
        tree = build(0)
        root = parse_xml(ser(tree))
        check(root, tree)


def test_xml_fuzz_fail_loudly():
    rng = np.random.default_rng(96)
    doc = (
        '<mediawiki><page><title>T &amp; t</title><ns>0</ns><id>3</id>'
        '<revision><id>1</id><text xml:space="preserve">'
        "<![CDATA[== h ==\nsome '''text''' here]]></text></revision>"
        "</page></mediawiki>"
    ).encode()
    for cut in range(0, len(doc), max(1, len(doc) // 60)):
        try:
            mediawiki_pages(doc[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(600):
        b = bytearray(doc)
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        try:
            mediawiki_pages(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    # wikitext stripper never raises on weird-but-stringy input except
    # the disclosed depth cap
    for s in ("[[unclosed", "[http://x", "{{unclosed", "''", "<", "]]"):
        wikitext_to_lines(s)

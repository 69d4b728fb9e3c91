"""Markdown stripper: per-rule pins (headings, setext, breaks,
quotes, lists, fences, inline set), nesting fixed point, the
never-raises contract on arbitrary text, and a seeded fuzz sweep."""

from __future__ import annotations

import numpy as np

from asid_v2_data_pipeline_spark.functions.markdown import md_to_text


def test_block_rules():
    assert md_to_text("# Title") == "Title"
    assert md_to_text("### Deep ###") == "Deep"
    assert md_to_text("Head\n====\nBody") == "Head\nBody"
    assert md_to_text("a\n\n---\n\nb") == "a\nb"
    assert md_to_text("> quoted\n> > nested") == "quoted\nnested"
    assert md_to_text("- item\n* item2\n+ item3\n7. numbered\n12) also") == (
        "item\nitem2\nitem3\nnumbered\nalso"
    )


def test_fences_verbatim():
    src = "```python\nx = '*not emph*'   \n\n# not a heading\n```\nafter"
    assert md_to_text(src) == "x = '*not emph*'\n# not a heading\nafter"
    # unterminated fence swallows to EOF without raising
    assert md_to_text("```\ncode") == "code"
    assert md_to_text("~~~info\nbody\n~~~") == "body"


def test_inline_rules():
    assert md_to_text("**b** and *i* and `c`") == "b and i and c"
    assert md_to_text("__b__ and _i_ but snake_case_name") == (
        "b and i but snake_case_name"
    )
    assert md_to_text("[label](http://x) ![alt](y.png) [r][ref]") == (
        "label alt r"
    )
    assert md_to_text("<https://auto.link> end") == "https://auto.link end"
    assert md_to_text("~~gone~~ kept") == "gone kept"
    # nesting unwraps to the fixed point
    assert md_to_text("**bold *inner* done**") == "bold inner done"
    assert md_to_text("[**bold label**](u)") == "bold label"


def test_trailing_space_and_blank_lines():
    assert md_to_text("line one  \n\n\nline two   ") == "line one\nline two"
    assert md_to_text("") == ""
    assert md_to_text("\n\n\n") == ""


def test_never_raises_fuzz():
    rng = np.random.default_rng(71)
    specials = "*_`#>-+[]()!~=\n "
    for _ in range(300):
        n = int(rng.integers(0, 200))
        s = "".join(
            specials[int(k)]
            if rng.integers(0, 3) == 0
            else chr(int(rng.integers(0x20, 0x7F)))
            for k in rng.integers(0, len(specials), n)
        )
        out = md_to_text(s)  # must not raise or hang
        assert isinstance(out, str)
        assert "\n\n" not in out

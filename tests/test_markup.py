"""Markup-stripping converter (PmcDocumentConverterAE analogue): golden
strings, offset-map properties, and end-to-end detect-on-clean /
map-back-to-raw."""

from __future__ import annotations

from conftest import MINI_OBO
from kgpipe.markup import map_mention_offsets, strip_markup, strip_markup_turns

T_SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp")


def test_strip_markup_golden():
    clean, segs = strip_markup('<p id="x">a &amp; b</p><br/>tail')
    assert clean == "a & btail"
    # non-entity clean chars must equal the raw char at their mapped offset;
    # the entity char maps to the entity's raw start
    raw = '<p id="x">a &amp; b</p><br/>tail'

    def raw_of(off):
        seg = [s for s in segs if s[0] <= off][-1]
        return seg[1] + (off - seg[0])

    assert raw[raw_of(0)] == "a"
    assert raw_of(2) == raw.index("&amp;")
    assert raw[raw_of(4)] == "b"
    assert raw[raw_of(5):raw_of(8) + 1] == "tail"


def test_strip_markup_edge_cases():
    assert strip_markup("no markup at all") == (
        "no markup at all", [(0, 0, 1)]
    )
    assert strip_markup("<a><b></b></a>")[0] == ""
    assert strip_markup("&lt;tag&gt; &quot;q&quot; &apos;a&apos;")[0] == \
        '<tag> "q" \'a\''
    # double-encoded entity decodes ONE level (single-pass semantics)
    assert strip_markup("&amp;lt;")[0] == "&lt;"
    # unterminated tag is left verbatim (no closing '>')
    assert strip_markup("before <unclosed")[0] == "before <unclosed"
    # bare comparisons in prose/code are NOT tags (tag branch is tag-shaped)
    assert strip_markup("if a < b and c > d") == (
        "if a < b and c > d", [(0, 0, 1)]
    )
    assert strip_markup("x < 3, y<4, <em>z</em>")[0] == "x < 3, y<4, z"
    # comments / processing instructions are still stripped
    assert strip_markup("a<!-- note -->b<?pi ?>c")[0] == "abc"


def test_strip_markup_all_positions_map():
    raw = "x<i>y</i> &amp; <b>neuron&lt;s&gt;</b> end"
    clean, segs = strip_markup(raw)

    def raw_of(off):
        seg = [s for s in segs if s[0] <= off][-1]
        return seg[1] + (off - seg[0])

    entity_positions = {clean.index("&"), clean.index("<"), clean.index(">")}
    for i, ch in enumerate(clean):
        if i not in entity_positions:
            assert raw[raw_of(i)] == ch, (i, ch)


def test_entity_ending_span_covers_whole_entity(spark):
    """A mention whose LAST clean char decodes from a multi-char entity
    must map its raw_end past the whole &...; source (review finding)."""
    from pyspark.sql import functions as F

    tdf = spark.createDataFrame(
        [("c1", 0, "user", "risk &lt;5 stuff", None, None)], T_SCHEMA)
    stripped = strip_markup_turns(tdf)
    clean = stripped.first()
    assert clean.text == "risk <5 stuff"
    # synthetic mention covering clean [0, 6) == "risk <"
    mentions = spark.createDataFrame(
        [("c1", 0, "X:1", 0, 6, "risk <")],
        "conv_id string, turn_idx int, concept_id string, begin int,"
        " end int, covered_text string")
    m = map_mention_offsets(mentions, stripped).first()
    raw = clean.raw_text
    assert raw[m.raw_begin:m.raw_end] == "risk &lt;"


def test_detect_on_stripped_maps_back_to_raw(spark):
    rows = [
        ("c1", 0, "user", 'see the <b class="hl">neuron</b> &amp; more',
         None, None),
        ("c1", 1, "assistant", "a <i>fibroblast</i> appears", None, None),
        ("c2", 0, "user", "plain neuron text", None, None),
    ]
    tdf = spark.createDataFrame(rows, T_SCHEMA)
    stripped = strip_markup_turns(tdf)

    from kgpipe.detect import build_dictionary_df, detect_mentions

    ddf = build_dictionary_df(spark, {"CL": MINI_OBO})
    mentions = detect_mentions(stripped, ddf)
    mapped = map_mention_offsets(mentions, stripped).collect()
    assert mapped, "expected mentions on the stripped text"
    raw_by_turn = {(r["conv_id"], r["turn_idx"]): r["raw_text"]
                   for r in stripped.collect()}
    for m in mapped:
        raw = raw_by_turn[(m.conv_id, m.turn_idx)]
        assert raw[m.raw_begin:m.raw_end] == m.covered_text, m


def test_strip_markup_property_random_inputs():
    """Property: on arbitrary markup-ish input the scanner never crashes,
    offsets stay in bounds, every non-entity clean char maps to an
    identical raw char, and entity chars map to a '&...;' source."""
    from hypothesis import given, strategies as st

    @given(st.text(alphabet="ab <>&;lt/gquo\"'x1", max_size=80))
    def check(raw):
        clean, segs = strip_markup(raw)
        assert len(clean) <= len(raw)
        if not any(c in raw for c in "<&"):
            assert clean == raw
            assert segs == ([(0, 0, 1)] if raw else [])

        def seg_of(off):
            return [s for s in segs if s[0] <= off][-1]

        for i, ch in enumerate(clean):
            c, r, w = seg_of(i)
            rb = r + (i - c)
            assert 0 <= rb < len(raw)
            if w == 1:
                assert raw[rb] == ch, (raw, clean, i)
            else:  # decoded entity: raw span is the whole &...; source
                assert raw[rb] == "&" and raw[rb + w - 1] == ";"

    check()

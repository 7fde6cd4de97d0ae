from kgpipe.normalize import (
    MatchConfig,
    chunk_spans,
    config_for,
    porter_stem,
    tokenize_with_offsets,
)


def test_tokenize_offsets():
    text = "Rb-Mediated Neuronal Differentiation"
    toks = tokenize_with_offsets(text)
    assert toks[0] == ("Rb", 0, 2)
    assert toks[1] == ("Mediated", 3, 11)
    assert text[toks[2][1]:toks[2][2]] == "Neuronal"


def test_porter_stem_basics():
    assert porter_stem("cells") == "cell"
    assert porter_stem("neurons") == "neuron"
    assert porter_stem("neuronal") == "neuron"
    assert porter_stem("interneurons") == "interneuron"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("hopping") == "hop"
    assert porter_stem("is") == "is"  # <=2 chars after step handling


def test_case_insensitive_preserves_acronyms():
    cfg = MatchConfig(case_match="CASE_INSENSITIVE", stemmer="NONE")
    assert cfg.normalize_token("Cell") == "cell"
    assert cfg.normalize_token("RB") == "RB"  # all-caps stays
    assert cfg.normalize_token("Rb") == "rb"


def test_chunk_spans_linebreaks_and_sentences():
    text = "First sentence. Second one.\nThird line"
    spans = chunk_spans(text)
    assert [text[b:e] for b, e in spans] == [
        "First sentence.",
        "Second one.",
        "Third line",
    ]


def test_config_for_default():
    assert config_for("UNKNOWN_ONT") is config_for("DEFAULT")


def test_ptb_tokenize_golden():
    """Literal-cascade parity with the reference's PTB tokenizer
    (PennTreebankTokenizer.java:28-60, the public McIntyre tokenizer.sed
    MorphAdorner variant): contractions, special words, punctuation."""
    from kgpipe.normalize import ptb_tokenize

    assert ptb_tokenize("Hello, world.") == ["Hello", ",", "world", "."]
    assert ptb_tokenize("I can't do it.") == ["I", "ca", "n't", "do", "it", "."]
    assert ptb_tokenize("He cannot (really) swim -- ever.") == [
        "He", "can", "not", "(", "really", ")", "swim", "--", "ever", "."]
    assert ptb_tokenize("The cell's receptor isn't active; T-cells are.") == [
        "The", "cell", "'s", "receptor", "is", "n't", "active", ";",
        "T-cells", "are", "."]
    # hyphenated biomedical terms stay whole (unlike the alnum-run default)
    assert "T-cells" in ptb_tokenize("T-cells respond")
    assert ptb_tokenize("gonna wanna gotta") == [
        "gon", "na", "wan", "na", "got", "ta"]


def test_ptb_tokenize_offsets_exact():
    from kgpipe.normalize import ptb_tokenize_with_offsets

    texts = [
        "Hello, world.",
        "I can't do it.",
        'She said "gonna win" at 20.5 percent!',
        "The cell's receptor isn't active; T-cells are.",
        "Whaddya want? 'Tis done...",
        "",
        "   spaced   out   ",
    ]
    texts.append("vitamin A . next")     # space-deleting rule: 'A .' -> 'A.'
    for text in texts:
        for tok, b, e in ptb_tokenize_with_offsets(text):
            span = text[b:e]
            if any(c.isspace() for c in span):
                # merged across a deleted space (initial + period): span
                # covers the interior whitespace
                assert "".join(span.split()) == tok, (text, tok, b, e)
            else:
                assert span == tok, (text, tok, b, e)


def test_ptb_tokenize_offsets_property():
    """Tokens appear in order, never overlap, and cover every
    non-whitespace, non-removed character of the input."""
    from hypothesis import given, strategies as st

    from kgpipe.normalize import ptb_tokenize_with_offsets

    @given(st.text(
        alphabet="abcDEF'.,!?()-- 0123456789\"",
        max_size=60,
    ))
    def check(text):
        spans = ptb_tokenize_with_offsets(text)
        last = 0
        for tok, b, e in spans:
            assert b >= last and e - b >= len(tok)
            span = text[b:e]
            if any(c.isspace() for c in span):
                assert "".join(span.split()) == tok
            else:
                assert span == tok
            last = e

    check()

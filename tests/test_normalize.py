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

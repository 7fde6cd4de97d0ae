from __future__ import annotations

from kgpipe.disambig import embedding_disambiguate

M_SCHEMA = ("conv_id string, turn_idx int, ontology string, concept_id string,"
            " begin int, end int, covered_text string, error string")


def test_embedding_disambiguate_picks_closest(spark):
    mentions = spark.createDataFrame(
        [
            ("c1", 0, "X", "X:A", 0, 5, "gizmo", None),
            ("c1", 0, "X", "X:B", 0, 5, "gizmo", None),
            ("c1", 1, "X", "X:C", 2, 6, "solo", None),  # unambiguous
        ],
        M_SCHEMA,
    )
    turn_emb = spark.createDataFrame(
        [("c1", 0, [1.0, 0.0, 0.0]), ("c1", 1, [0.0, 1.0, 0.0])],
        "conv_id string, turn_idx int, ctx_emb array<double>",
    )
    concept_emb = spark.createDataFrame(
        [
            ("X:A", [0.0, 1.0, 0.0]),   # orthogonal to turn 0 context
            ("X:B", [0.9, 0.1, 0.0]),   # aligned with turn 0 context
        ],
        "concept_id string, con_emb array<double>",
    )
    out = {(r.turn_idx, r.begin): r.concept_id for r in
           embedding_disambiguate(mentions, turn_emb, concept_emb).collect()}
    assert out[(0, 0)] == "X:B"
    assert out[(1, 2)] == "X:C"  # missing concept embedding still survives

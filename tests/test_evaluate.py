from __future__ import annotations

from kgpipe.evaluate import (
    OVERLAP,
    SHARED_END,
    SHARED_START,
    STRICT,
    compare,
    format_summary_line,
    per_document_summary,
    summary,
)

SCHEMA = "conv_id string, turn_idx int, concept_id string, begin int, end int"


def _gold(spark):
    return spark.createDataFrame(
        [
            ("d1", 0, "CL:1", 0, 4),
            ("d1", 0, "CL:2", 10, 14),
            ("d2", 0, "CL:1", 5, 9),
        ],
        SCHEMA,
    )


def test_strict_comparison(spark):
    ev = spark.createDataFrame(
        [
            ("d1", 0, "CL:1", 0, 4),    # TP
            ("d1", 0, "CL:2", 11, 14),  # span off by one → FP (+FN for gold)
            ("d2", 0, "CL:9", 5, 9),    # wrong concept → FP
        ],
        SCHEMA,
    )
    out = compare(_gold(spark), ev, STRICT)
    counts = {r.outcome: 0 for r in out.collect()}
    for r in out.collect():
        counts[r.outcome] += 1
    assert counts == {"TP": 1, "FP": 2, "FN": 2}
    s = summary(out).first()
    assert s.tp == 1 and s.fp == 2 and s.fn == 2
    assert abs(s.precision - 1 / 3) < 1e-9
    assert abs(s.recall - 1 / 3) < 1e-9


def test_overlap_comparison(spark):
    ev = spark.createDataFrame([("d1", 0, "CL:2", 11, 14)], SCHEMA)
    out = compare(_gold(spark), ev, OVERLAP)
    rows = {(r.outcome, r.concept_id, r.begin) for r in out.collect()}
    assert ("TP", "CL:2", 10) in rows  # overlapping span counts
    assert not any(o == "FP" for o, _, _ in rows)


def test_shared_start_end(spark):
    ev = spark.createDataFrame([("d1", 0, "CL:1", 0, 99)], SCHEMA)
    assert (
        compare(_gold(spark), ev, SHARED_START)
        .filter("outcome = 'TP'")
        .count()
        == 1
    )
    assert (
        compare(_gold(spark), ev, SHARED_END).filter("outcome = 'TP'").count()
        == 0
    )


def test_per_document_and_format(spark):
    ev = _gold(spark)  # perfect run
    out = compare(_gold(spark), ev, STRICT)
    per_doc = {r.conv_id: (r.tp, r.fp, r.fn) for r in
               per_document_summary(out).collect()}
    assert per_doc["d1"] == (2, 0, 0)
    assert per_doc["d2"] == (1, 0, 0)
    line = format_summary_line(4362, 2528, 1411)
    assert line.startswith("Evaluation Set\t4362\t2528\t1411\tP=0.633")


def test_evaluate_cli_summary_line(spark, tmp_path, capsys):
    """python -m kgpipe.evaluate: the CraftRunGenericComparison.main
    analogue writes outcomes parquet + the reference-format summary line."""
    from kgpipe import evaluate as evmod

    gold = [("c1", 0, "CL:0000540", 4, 10), ("c1", 1, "CL:0000540", 0, 7),
            ("c1", 1, "CL:0000099", 18, 29)]
    ev = [("c1", 0, "CL:0000540", 4, 10), ("c1", 1, "CL:0000003", 0, 7)]
    schema = "conv_id string, turn_idx int, concept_id string, begin int, end int"
    spark.createDataFrame(gold, schema).write.parquet(str(tmp_path / "gold"))
    spark.createDataFrame(ev, schema).write.parquet(str(tmp_path / "eval"))
    evmod.main([
        "--gold", str(tmp_path / "gold"), "--eval", str(tmp_path / "eval"),
        "--span", "STRICT", "--out", str(tmp_path / "out"),
    ])
    line = (tmp_path / "out" / "summary.txt").read_text().strip()
    assert line.startswith("Evaluation Set\t1\t1\t2\tP=0.5")
    n = spark.read.parquet(str(tmp_path / "out" / "outcomes")).count()
    assert n == 4  # 1 TP + 2 FN + 1 FP

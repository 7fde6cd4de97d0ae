"""Direct tests for surface previously exercised only indirectly:
salted repartition, run-key removal, set overrider, write layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import MINI_OBO

T_SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp")

TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _tdf(spark, n=12):
    from kgpipe.synth import generate_transcripts

    rows, _ = generate_transcripts(n_convs=n, seed=11)
    return spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
         for r in rows], T_SCHEMA)


def test_salt_partitions_output_invariant(spark, tmp_path):
    """Salted repartition (skew guard) must not change pipeline output."""
    from kgpipe.pipeline import PipelineConfig, run_pipeline

    tdf = _tdf(spark)
    base = PipelineConfig(obo_paths={"CL": MINI_OBO}, disambiguate=False,
                          n_buckets=4)
    salted = PipelineConfig(obo_paths={"CL": MINI_OBO}, disambiguate=False,
                            n_buckets=4, salt_partitions=8)
    run_pipeline(spark, tdf, base, str(tmp_path / "a"))
    run_pipeline(spark, tdf, salted, str(tmp_path / "b"))
    a = spark.read.parquet(str(tmp_path / "a")).select(*TRIPLE_COLS)
    b = spark.read.parquet(str(tmp_path / "b")).select(*TRIPLE_COLS)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_remove_run_key(spark, tmp_path):
    """Neo4jRunCatalog.removeRunKeyFromDocumentCollection analogue."""
    import datetime as dt

    from kgpipe import schemas
    from kgpipe.lineage import read_lineage, remove_run_key

    lin = str(tmp_path / "lineage")
    rows = [("RK_A", p, "COMPLETE", 1, 1, 1, dt.datetime(2025, 1, 1),
             None, None) for p in range(4)]
    rows += [("RK_B", 0, "COMPLETE", 1, 1, 1, dt.datetime(2025, 1, 1),
              None, None)]
    spark.createDataFrame(rows, schema=schemas.LINEAGE).write.parquet(lin)
    remove_run_key(spark, lin, "RK_A")
    left = read_lineage(spark, lin)
    assert {r.run_key for r in left.collect()} == {"RK_B"}
    assert left.count() == 1


def test_override_set(spark):
    """AnnotatorOverrider/SetOverrider analogue: relabel annotation sets
    (gold annotator id 99099099, EvaluationPipeline.java:171-208)."""
    from kgpipe.filters import override_set

    m = spark.createDataFrame(
        [("c1", 0, "CL:1", 0, 3, "foo")],
        "conv_id string, turn_idx int, concept_id string, begin int,"
        " end int, covered_text string")
    gold = override_set(m, "gold")
    assert gold.first()["set"] == "gold"
    ev = override_set(gold, "eval")
    assert ev.first()["set"] == "eval"


def test_write_triples_layouts_same_rows(spark, tmp_path):
    """partitioned (hive bucket dirs) and clustered (sorted single dir)
    layouts must contain identical triple rows."""
    from kgpipe.detect import build_dictionary_df, detect_mentions
    from kgpipe.triples import all_triples, write_triples

    tdf = _tdf(spark, n=6)
    ddf = build_dictionary_df(spark, {"CL": MINI_OBO})
    triples = all_triples(tdf, detect_mentions(tdf, ddf))
    write_triples(triples, str(tmp_path / "p"), n_buckets=4,
                  mode="overwrite", layout="partitioned")
    write_triples(triples, str(tmp_path / "c"), n_buckets=4,
                  mode="overwrite", layout="clustered")
    p = spark.read.parquet(str(tmp_path / "p")).select(*TRIPLE_COLS)
    c = spark.read.parquet(str(tmp_path / "c")).select(*TRIPLE_COLS)
    assert p.exceptAll(c).count() == 0 and c.exceptAll(p).count() == 0
    import os
    assert any(d.startswith("bucket=") for d in os.listdir(tmp_path / "p"))


def test_assume_unique_turns_duplicate_input_rows(spark):
    """Replayed (duplicated) input rows: the default turn-local dedup
    cannot see them (documented input invariant), while
    assume_unique_turns=False restores the corpus-wide
    DuplicateAnnotationRemovalFilter pass."""
    from kgpipe.detect import build_dictionary_df
    from kgpipe.pipeline import PipelineConfig, build_mentions

    row = ("c1", 0, "user", "a neuron appears", None, None)
    tdf = spark.createDataFrame([row, row], T_SCHEMA)  # replayed turn
    ddf = build_dictionary_df(spark, {"CL": MINI_OBO})

    strict = build_mentions(
        tdf, ddf, PipelineConfig(disambiguate=False, canonical=False))
    assert strict.count() == 2  # duplicate survives under the invariant

    lenient = build_mentions(
        tdf, ddf,
        PipelineConfig(disambiguate=False, canonical=False,
                       assume_unique_turns=False))
    assert lenient.count() == 1


def test_negated_mentions(spark):
    from kgpipe.filters import negated_mentions

    t = spark.createDataFrame(
        [("c", 0, "there is no spark here"),
         ("c", 1, "not at all. the spark works"),
         ("c", 2, "the spark works without issue")],
        ["conv_id", "turn_idx", "text"])
    # spans of the literal word 'spark' in each turn
    m = spark.createDataFrame(
        [("c", 0, "T:0001", 12, 17, "spark"),
         ("c", 1, "T:0001", 16, 21, "spark"),
         ("c", 2, "T:0001", 4, 9, "spark")],
        ["conv_id", "turn_idx", "concept_id", "begin", "end",
         "covered_text"])
    got = {r["turn_idx"]: r["negated"]
           for r in negated_mentions(m, t).collect()}
    assert got[0] is True       # 'no' in pre-window, no boundary
    assert got[1] is False      # 'not' present but '.' intervenes
    assert got[2] is False      # trigger is AFTER the span

"""Resume/checkpoint semantics (FIXTURES.md F6 scenario): pre-populate some
partitions COMPLETE, run, assert only OUTSTANDING recompute and the final
output equals a clean full run."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kgpipe.lineage import (
    COMPLETE,
    ERROR,
    OUTSTANDING,
    outstanding,
    read_lineage,
    run_with_lineage,
    runs_map,
    status_counts,
    with_bucket,
)

T_SCHEMA = ("conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp")
RUN_KEY = "CONCEPTMAPPER_CL_TEST"


def _transcripts(spark, n=40):
    rows = [
        (f"conv{i:04d}", t, "user", f"turn {t} of conv {i} neuron cell", None, None)
        for i in range(n)
        for t in range(3)
    ]
    return spark.createDataFrame(rows, T_SCHEMA)


def _fake_pipeline(tdf):
    mentions = tdf.select(
        "conv_id",
        "turn_idx",
        F.lit("CL").alias("ontology"),
        F.lit("CL:0000540").alias("concept_id"),
        F.lit(10).alias("begin"),
        F.lit(16).alias("end"),
        F.lit("neuron").alias("covered_text"),
        F.lit(None).cast("string").alias("error"),
    )
    triples = mentions.select(
        F.concat(F.lit("t:"), "conv_id").alias("subj"),
        F.lit("p:denotes").alias("pred"),
        F.lit("o:CL_0000540").alias("obj"),
        "conv_id",
        "turn_idx",
        F.lit(None).cast("struct<begin:int,end:int,text:string>").alias("evidence"),
    )
    return mentions, triples


def test_outstanding_anti_join(spark, tmp_path):
    tdf = with_bucket(_transcripts(spark), n_buckets=8)
    lineage = spark.createDataFrame(
        [
            (RUN_KEY, 0, COMPLETE, 10, 10, 10,
             dt.datetime(2025, 1, 1), None, None),
            (RUN_KEY, 1, ERROR, 0, 0, 0,
             dt.datetime(2025, 1, 1), "boom", "detect"),
        ],
        "run_key string, partition_id int, status string, n_turns long,"
        " n_mentions long, n_triples long, run_date timestamp, error string,"
        " component_at_fault string",
    )
    todo = outstanding(tdf, lineage, RUN_KEY)
    got_buckets = {r.partition_id for r in todo.select("partition_id").distinct().collect()}
    assert 0 not in got_buckets          # COMPLETE excluded
    assert 1 in got_buckets              # ERROR is retried
    rm = runs_map(
        tdf.select("partition_id").distinct(), lineage, RUN_KEY
    )
    statuses = {r.partition_id: r.status for r in rm.collect()}
    assert statuses[0] == COMPLETE and statuses[1] == ERROR
    assert statuses[2] == OUTSTANDING


def test_resume_produces_identical_output(spark, tmp_path):
    tdf = _transcripts(spark)
    out_a = str(tmp_path / "triples_clean")
    lin_a = str(tmp_path / "lineage_clean")
    run_with_lineage(spark, tdf, _fake_pipeline, RUN_KEY, lin_a, out_a, n_buckets=8)
    clean = spark.read.parquet(out_a)

    # interrupted run: first process only half the conversations, then
    # resume with the full input — only outstanding buckets recompute
    out_b = str(tmp_path / "triples_resumed")
    lin_b = str(tmp_path / "lineage_resumed")
    half = tdf.filter(F.pmod(F.xxhash64("conv_id"), F.lit(8)) < 4)
    run_with_lineage(spark, half, _fake_pipeline, RUN_KEY, lin_b, out_b, n_buckets=8)
    n_after_half = spark.read.parquet(out_b).count()
    assert 0 < n_after_half < clean.count()

    lineage_rows = run_with_lineage(
        spark, tdf, _fake_pipeline, RUN_KEY, lin_b, out_b, n_buckets=8
    )
    resumed = spark.read.parquet(out_b)
    assert resumed.count() == clean.count()
    assert (
        resumed.exceptAll(clean).count() == 0
        and clean.exceptAll(resumed).count() == 0
    )
    # lineage metrics recorded per bucket
    row = lineage_rows.first()
    assert row.n_turns > 0 and row.n_triples > 0

    counts = status_counts(read_lineage(spark, lin_b)).first()
    assert counts[COMPLETE] == 8


def test_error_quarantine_records_error_bucket(spark, tmp_path):
    tdf = _transcripts(spark, n=8)

    def _err_pipeline(sub):
        mentions, triples = _fake_pipeline(sub)
        # poison one conversation's mentions with the quarantine sentinel
        mentions = mentions.withColumn(
            "concept_id",
            F.when(F.col("conv_id") == "conv0000", F.lit("__ERROR__"))
            .otherwise(F.col("concept_id")),
        ).withColumn(
            "error",
            F.when(F.col("conv_id") == "conv0000", F.lit("ValueError: bad turn")),
        )
        return mentions, triples

    lin = str(tmp_path / "lineage_err")
    out = str(tmp_path / "triples_err")
    rows = run_with_lineage(spark, tdf, _err_pipeline, RUN_KEY, lin, out, n_buckets=4)
    by_status = {r.partition_id: r.status for r in rows.collect()}
    assert ERROR in by_status.values() and COMPLETE in by_status.values()
    err_row = [r for r in rows.collect() if r.status == ERROR][0]
    assert "ValueError" in err_row.error and err_row.component_at_fault == "detect"


# ---------------------------------------------------------------------------
# fused plan + lineage (resumable production path)
# ---------------------------------------------------------------------------

def _gen_tdf(spark, n_convs=30, seed=13):
    from kgpipe.synth import generate_transcripts

    rows, _ = generate_transcripts(n_convs=n_convs, seed=seed)
    return spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
         for r in rows],
        T_SCHEMA,
    )


TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx", "evidence"]


def test_fused_lineage_resume_identical_output(spark, tmp_path):
    """BENCH.md resume semantics reproduced with fused=True: a half-input
    run + full resume must equal a clean non-lineage fused run exactly."""
    from conftest import MINI_OBO
    from kgpipe.pipeline import PipelineConfig, run_pipeline

    tdf = _gen_tdf(spark)
    cfg = PipelineConfig(obo_paths={"CL": MINI_OBO}, fused=True,
                         disambiguate=False, n_buckets=8)

    out_a = str(tmp_path / "fused_clean")
    run_pipeline(spark, tdf, cfg, out_a)
    clean = spark.read.parquet(out_a).select(*TRIPLE_COLS)

    out_b = str(tmp_path / "fused_resumed")
    lin_b = str(tmp_path / "fused_lineage")
    half = tdf.filter(F.pmod(F.xxhash64("conv_id"), F.lit(8)) < 4)
    run_pipeline(spark, half, cfg, out_b, lineage_path=lin_b)
    n_half = spark.read.parquet(out_b).count()
    assert 0 < n_half < clean.count()

    rows = run_pipeline(spark, tdf, cfg, out_b, lineage_path=lin_b)
    resumed = spark.read.parquet(out_b).select(*TRIPLE_COLS)
    assert resumed.exceptAll(clean).count() == 0
    assert clean.exceptAll(resumed).count() == 0
    by_status = {r.partition_id: r.status for r in rows.collect()}
    assert set(by_status.values()) == {COMPLETE}
    # per-bucket metrics present on the fused path
    r0 = rows.filter(F.col("n_turns") > 0).first()
    assert r0.n_mentions > 0 and r0.n_triples > 0


def test_fused_lineage_split_mode_matches(spark, tmp_path):
    """fused + lineage + mega-conversation block splitting together."""
    from conftest import MINI_OBO
    from kgpipe.pipeline import PipelineConfig, run_pipeline

    tdf = _gen_tdf(spark, n_convs=20, seed=5)
    base = PipelineConfig(obo_paths={"CL": MINI_OBO}, fused=True,
                          disambiguate=False, n_buckets=8)
    out_a = str(tmp_path / "unsplit")
    run_pipeline(spark, tdf, base, out_a)
    clean = spark.read.parquet(out_a).select(*TRIPLE_COLS)

    split_cfg = PipelineConfig(obo_paths={"CL": MINI_OBO}, fused=True,
                               disambiguate=False, n_buckets=8,
                               max_turns_per_group=5)
    out_b = str(tmp_path / "split")
    lin_b = str(tmp_path / "split_lineage")
    run_pipeline(spark, tdf, split_cfg, out_b, lineage_path=lin_b)
    got = spark.read.parquet(out_b).select(*TRIPLE_COLS)
    assert got.exceptAll(clean).count() == 0
    assert clean.exceptAll(got).count() == 0


def test_fused_lineage_error_quarantine_and_retry(spark, tmp_path):
    """A failing detect config quarantines per-conversation errors into
    ERROR lineage buckets; a later run with a fixed config retries exactly
    those buckets and converges to the clean output."""
    from conftest import MINI_OBO
    from kgpipe.normalize import MatchConfig
    from kgpipe.pipeline import PipelineConfig, run_pipeline

    tdf = _gen_tdf(spark, n_convs=12, seed=3)
    bogus = MatchConfig(
        search_strategy="BOGUS", case_match="CASE_INSENSITIVE",
        stemmer="NONE", stopwords="NONE", order_independent=False,
        find_all_matches=False, synonym_type="ALL",
    )
    out = str(tmp_path / "q_triples")
    lin = str(tmp_path / "q_lineage")
    cfg_err = PipelineConfig(obo_paths={"CL": MINI_OBO}, fused=True,
                             disambiguate=False, n_buckets=4,
                             detect_configs={"CL": bogus})
    rows = run_pipeline(spark, tdf, cfg_err, out, lineage_path=lin)
    statuses = {r.status for r in rows.collect()}
    assert statuses == {ERROR}
    assert all("ValueError" in r.error for r in rows.collect())

    cfg_ok = PipelineConfig(obo_paths={"CL": MINI_OBO}, fused=True,
                            disambiguate=False, n_buckets=4)
    rows2 = run_pipeline(spark, tdf, cfg_ok, out, lineage_path=lin)
    latest = (rows2.groupBy("partition_id")
              .agg(F.max_by("status", "run_date").alias("status")))
    assert {r.status for r in latest.collect()} == {COMPLETE}

    out_clean = str(tmp_path / "q_clean")
    run_pipeline(spark, tdf, cfg_ok, out_clean)
    clean = spark.read.parquet(out_clean).select(*TRIPLE_COLS)
    got = spark.read.parquet(out).select(*TRIPLE_COLS)
    assert got.exceptAll(clean).count() == 0
    assert clean.exceptAll(got).count() == 0


def test_snapshot_lineage_partial_then_resume_atomic(spark, tmp_path):
    """The unified commit protocol (VERDICT r4 #1): per-bucket resume AND
    atomic reader visibility together.  A run where one bucket fails mid-
    job leaves lineage COMPLETE for the finished buckets and data staged —
    readers still see the OLD snapshot throughout; the resumed run
    recomputes ONLY the outstanding bucket and flips to a new snapshot
    bit-identical to a clean single-shot run."""
    import os

    from kgpipe.triples import (
        committed_snapshot,
        read_triples_snapshot,
        snapshot_staging_path,
        write_triples_snapshot,
    )

    tdf = _transcripts(spark)
    out = str(tmp_path / "tbl")
    lin = str(tmp_path / "lin")

    # pre-existing committed snapshot (the "old table" readers must keep
    # seeing until the new run fully commits)
    _, old_triples = _fake_pipeline(_transcripts(spark, n=5))
    write_triples_snapshot(old_triples, out, n_buckets=8)
    assert committed_snapshot(out) == "snap-1"
    old_rows = sorted(map(tuple, read_triples_snapshot(spark, out)
                          .select("subj", "pred", "obj").collect()))

    # reference: clean single-shot snapshot+lineage run on a separate table
    out_clean = str(tmp_path / "tbl_clean")
    run_with_lineage(spark, tdf, _fake_pipeline, RUN_KEY,
                     str(tmp_path / "lin_clean"), out_clean, n_buckets=8,
                     snapshot=True)
    assert committed_snapshot(out_clean) == "snap-1"
    want = sorted(map(tuple, read_triples_snapshot(spark, out_clean)
                      .select("subj", "pred", "obj", "conv_id").collect()))

    # partial run: conv0000's bucket quarantines (the mid-job failure) —
    # its COMPLETE siblings are staged and committed to lineage, but the
    # snapshot must NOT flip
    def _err_pipeline(sub):
        mentions, triples = _fake_pipeline(sub)
        mentions = mentions.withColumn(
            "concept_id",
            F.when(F.col("conv_id") == "conv0000", F.lit("__ERROR__"))
            .otherwise(F.col("concept_id")),
        ).withColumn(
            "error",
            F.when(F.col("conv_id") == "conv0000", F.lit("ValueError: bad")),
        )
        return mentions, triples

    rows = run_with_lineage(spark, tdf, _err_pipeline, RUN_KEY, lin, out,
                            n_buckets=8, snapshot=True)
    assert ERROR in {r.status for r in rows.collect()}
    staging = snapshot_staging_path(out, RUN_KEY)
    assert os.path.isdir(staging)                  # data staged
    assert committed_snapshot(out) == "snap-1"     # pointer untouched
    assert sorted(map(tuple, read_triples_snapshot(spark, out)
                      .select("subj", "pred", "obj").collect())) == old_rows

    # resume: ONLY the ERROR bucket's conversations recompute
    seen_convs: list[int] = []

    def counting_pipeline(sub):
        seen_convs.append(sub.select("conv_id").distinct().count())
        return _fake_pipeline(sub)

    run_with_lineage(spark, tdf, counting_pipeline, RUN_KEY, lin, out,
                     n_buckets=8, snapshot=True)
    n_all = tdf.select("conv_id").distinct().count()
    assert len(seen_convs) == 1 and 0 < seen_convs[0] < n_all

    # the flip happened and the committed table is bit-identical to clean
    assert committed_snapshot(out) == "snap-2"
    assert not os.path.isdir(staging)
    got = sorted(map(tuple, read_triples_snapshot(spark, out)
                     .select("subj", "pred", "obj", "conv_id").collect()))
    assert got == want

    # fully-resumed no-op re-run: nothing recomputes, pointer stays
    run_with_lineage(spark, tdf, _fake_pipeline, RUN_KEY, lin, out,
                     n_buckets=8, snapshot=True)
    assert committed_snapshot(out) == "snap-2"


def test_snapshot_lineage_crash_between_lineage_and_flip(spark, tmp_path,
                                                         monkeypatch):
    """Crash AFTER the lineage append but BEFORE the pointer flip: the next
    (no-op) invocation finds everything COMPLETE with the staging dir still
    present and finishes the commit."""
    from kgpipe import triples as triples_mod
    from kgpipe.triples import committed_snapshot, read_triples_snapshot

    tdf = _transcripts(spark, n=8)
    out = str(tmp_path / "tbl")
    lin = str(tmp_path / "lin")

    real_finalize = triples_mod.finalize_snapshot

    def crash_finalize(*a, **kw):
        raise RuntimeError("simulated crash before pointer flip")

    monkeypatch.setattr(triples_mod, "finalize_snapshot", crash_finalize)
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        run_with_lineage(spark, tdf, _fake_pipeline, RUN_KEY, lin, out,
                         n_buckets=4, snapshot=True)
    assert committed_snapshot(out) is None         # no flip happened

    monkeypatch.setattr(triples_mod, "finalize_snapshot", real_finalize)
    # rerun: nothing OUTSTANDING, but the pending staging dir commits
    rows = run_with_lineage(spark, tdf, _fake_pipeline, RUN_KEY, lin, out,
                            n_buckets=4, snapshot=True)
    assert {r.status for r in rows.collect()} == {COMPLETE}
    assert committed_snapshot(out) == "snap-1"
    assert read_triples_snapshot(spark, out).count() > 0


def test_fused_rejects_staged_only_options(spark, tmp_path):
    from conftest import MINI_OBO
    from kgpipe.pipeline import PipelineConfig, run_pipeline
    import pytest

    tdf = _gen_tdf(spark, n_convs=2, seed=1)
    # mayla is fused-capable since round 3 (document-local, runs in the
    # per-conversation scan); the remaining staged-only options still raise
    for kw in ({"salt_partitions": 8}, {"assume_unique_turns": False}):
        cfg = PipelineConfig(obo_paths={"CL": MINI_OBO}, fused=True, **kw)
        with pytest.raises(ValueError):
            run_pipeline(spark, tdf, cfg, str(tmp_path / "x"))

"""Annotation-set evaluation: span-comparator joins, TP/FP/FN, P/R/F.

Re-expresses the reference's evaluation pipeline
(``EvaluationPipeline.java:194-227``: SimpleAnnotationComparator_AE with a
configurable SpanComparator and IDENTICAL mention comparison
``CraftConceptMapperEvaluator.java:180-181``) as joins:

- STRICT: inner equi-join on (doc, begin, end, concept) → TP;
  left-anti each way → FN / FP;
- OVERLAP / SHARED_START / SHARED_END / SHARED_START_OR_END / SUB_SPAN /
  IGNORE_SPAN (``CraftRunGenericComparison.java:213-216``): non-equi band
  conditions on top of a (doc, concept) equi-key, so the join stays a
  partitioned hash/band join rather than a cartesian product.

Summary line format parity: ``Evaluation Set\tTP\tFP\tFN\tP=…\tR=…\tF=…``
(``ConceptMapperEvalOutputCompiler.java:562``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STRICT = "STRICT"
OVERLAP = "OVERLAP"
SHARED_START = "SHARED_START"
SHARED_END = "SHARED_END"
SHARED_START_OR_END = "SHARED_START_OR_END"
SUB_SPAN = "SUB_SPAN"
IGNORE_SPAN = "IGNORE_SPAN"

_KEY = ["conv_id", "turn_idx", "concept_id"]


def _span_condition(comparator: str, g, e) -> Column:
    if comparator == STRICT:
        return (g["begin"] == e["begin"]) & (g["end"] == e["end"])
    if comparator == OVERLAP:
        return (g["begin"] < e["end"]) & (e["begin"] < g["end"])
    if comparator == SHARED_START:
        return g["begin"] == e["begin"]
    if comparator == SHARED_END:
        return g["end"] == e["end"]
    if comparator == SHARED_START_OR_END:
        return (g["begin"] == e["begin"]) | (g["end"] == e["end"])
    if comparator == SUB_SPAN:
        # eval span contained within gold span
        return (e["begin"] >= g["begin"]) & (e["end"] <= g["end"])
    if comparator == IGNORE_SPAN:
        return F.lit(True)
    raise ValueError(comparator)


def compare(gold: DataFrame, ev: DataFrame, span: str = STRICT) -> DataFrame:
    """Return rows ``(conv_id, turn_idx, outcome, concept_id, begin, end)``
    with outcome ∈ {TP, FP, FN} (D9 in SURVEY.md §1.1).

    Mention comparison is IDENTICAL (equality on concept_id), matching
    ``CraftConceptMapperEvaluator.java:180-181``.
    """
    g = gold.select(*_KEY, "begin", "end").alias("g")
    e = ev.select(*_KEY, "begin", "end").alias("e")
    cond = [g[k] == e[k] for k in _KEY]
    span_cond = _span_condition(span, g, e)

    matched_gold = g.join(e, cond + [span_cond], "left_semi")
    tp = matched_gold.withColumn("outcome", F.lit("TP"))
    fn = g.join(e, cond + [span_cond], "left_anti").withColumn(
        "outcome", F.lit("FN")
    )
    fp = e.join(g, cond + [span_cond], "left_anti").withColumn(
        "outcome", F.lit("FP")
    )
    out_cols = ["conv_id", "turn_idx", "outcome", "concept_id", "begin", "end"]
    return (
        tp.select(*out_cols)
        .unionByName(fn.select(*out_cols))
        .unionByName(fp.select(*out_cols))
    )


def summary(outcomes: DataFrame) -> DataFrame:
    """Corpus summary with P/R/F as column expressions
    (P = TP/(TP+FP), R = TP/(TP+FN), F = 2PR/(P+R))."""
    agg = outcomes.agg(
        F.sum(F.when(F.col("outcome") == "TP", 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("outcome") == "FP", 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("outcome") == "FN", 1).otherwise(0)).alias("fn"),
    )
    p = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    r = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    return agg.select(
        "tp", "fp", "fn",
        p.alias("precision"),
        r.alias("recall"),
        (2 * p * r / F.nullif(p + r, F.lit(0.0))).alias("f1"),
    )


def per_document_summary(outcomes: DataFrame) -> DataFrame:
    """Per-document TP/FP/FN counts (the reference writes per-doc listings,
    header fixture ``CLAnnotationsWithScore.txt:2``)."""
    return (
        outcomes.groupBy("conv_id")
        .pivot("outcome", ["TP", "FP", "FN"])
        .count()
        .na.fill(0)
        .withColumnsRenamed({"TP": "tp", "FP": "fp", "FN": "fn"})
    )


def format_summary_line(tp: int, fp: int, fn: int) -> str:
    """Exact reference summary-line shape
    (``ConceptMapperEvalOutputCompiler.java:562``)."""
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return f"Evaluation Set\t{tp}\t{fp}\t{fn}\tP={p}\tR={r}\tF={f}"


def main(argv=None) -> None:
    """Evaluation entry point — the ``CraftRunGenericComparison.main`` /
    ``CraftConceptMapperEvaluatorMain`` analogue (SURVEY.md §3.3): compare
    a gold annotation set against an evaluation set under a configurable
    span comparator, write per-document TP/FP/FN rows (parquet) and the
    reference-format corpus summary line.

    Inputs are parquet mention tables with columns
    ``(conv_id, turn_idx, concept_id, begin, end)`` or generic-annotation
    TSVs (``concept_id\\tcovered_text\\tbegin\\tend[\\tscore]``,
    ``GenericAnnotationLoader`` format) with an optional score cutoff.
    """
    import argparse

    from .serde import load_generic_annotations
    from .session import get_spark

    ap = argparse.ArgumentParser(description="kgpipe annotation evaluation")
    ap.add_argument("--gold", required=True, help="parquet path or .tsv")
    ap.add_argument("--eval", dest="eval_path", required=True,
                    help="parquet path or .tsv")
    ap.add_argument("--span", default=STRICT,
                    choices=[STRICT, OVERLAP, SHARED_START, SHARED_END,
                             SHARED_START_OR_END, SUB_SPAN, IGNORE_SPAN])
    ap.add_argument("--score-cutoff", type=int, default=None,
                    help="TSV inputs only: keep score >= cutoff")
    ap.add_argument("--out", required=True,
                    help="output dir (outcomes parquet + summary.txt)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark("kgpipe-eval", master=args.master)

    def load(path):
        if path.endswith(".tsv"):
            df = load_generic_annotations(spark, path, args.score_cutoff)
            return df.select(
                F.lit("doc").alias("conv_id"), F.lit(0).alias("turn_idx"),
                "concept_id", "begin", "end",
            )
        return spark.read.parquet(path)

    outcomes = compare(load(args.gold), load(args.eval_path), span=args.span)
    outcomes.write.mode("overwrite").parquet(f"{args.out}/outcomes")
    s = summary(outcomes).first()
    line = format_summary_line(s["tp"] or 0, s["fp"] or 0, s["fn"] or 0)
    with open(f"{args.out}/summary.txt", "w", encoding="utf-8") as f:
        f.write(line + "\n")
    print(line)
    if existing is None:  # only stop a session this entry point created
        spark.stop()


if __name__ == "__main__":
    main()

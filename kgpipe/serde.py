"""Serialization sinks/sources: JSON-lines ``.annot`` codec, BioNLP ``.a1``
standoff writer, generic annotation TSV loader.

Format parity targets:

- ``.annot`` JSON lines — exact field order/shape of the reference codec
  (``AnnotationSerializerImpl.java:74-162``; golden strings
  ``AnnotationSerializerTest.java:28`` and ``AnnotationSerializerAeTest.java:79``):
  ``{"documentId":…,"annotatorName":…,"type":…,"spans":[[b,e]],
  "coveredText":…,"slots":{k:[v…]}}`` — slots omitted when absent; covered
  text newlines become spaces (``AnnotationSerializerImpl.java:91``).
- ``.a1`` standoff — ``T<i>\\tontology_term <b> <e>\\t<text>`` +
  ``N<i>\\tReference T<i> <CONCEPT>\\t`` (``README.md:98-113``, fixture
  ``17608565_CL.a1``), ids in document order.
- generic annotation TSV — ``concept_id\\tcovered_text\\tstart\\tend[\\tscore]``
  (``GenericAnnotationLoader.java:84-102``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

ANNOT_SCHEMA = T.StructType(
    [
        T.StructField("documentId", T.StringType()),
        T.StructField("annotatorName", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("spans", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("coveredText", T.StringType()),
        T.StructField(
            "slots", T.MapType(T.StringType(), T.ArrayType(T.StringType()))
        ),
    ]
)


def mentions_to_annot_json(
    mentions: DataFrame,
    annotator_name: str = "kgpipe",
    include_covered_text: bool = True,
) -> DataFrame:
    """Encode mention rows as reference-format JSON lines (one column
    ``value``).  ``to_json`` preserves struct field order, and
    ``ignoreNullFields`` drops the absent ``slots`` key — matching the
    reference's Gson output byte-for-byte for slot-less annotations."""
    doc_id = F.concat_ws(
        ":", F.col("conv_id"), F.col("turn_idx").cast("string")
    )
    covered = F.regexp_replace(F.col("covered_text"), "\n", " ")
    struct = F.struct(
        doc_id.alias("documentId"),
        F.lit(annotator_name).alias("annotatorName"),
        F.col("concept_id").alias("type"),
        F.array(F.array(F.col("begin"), F.col("end"))).alias("spans"),
        (covered if include_covered_text else F.lit(None).cast("string")).alias(
            "coveredText"
        ),
        (
            F.col("slots")
            if "slots" in mentions.columns
            else F.lit(None).cast("map<string,array<string>>")
        ).alias("slots"),
    )
    return mentions.select(
        F.to_json(struct, {"ignoreNullFields": "true"}).alias("value")
    )


def annot_json_to_mentions(spark_or_df, paths=None) -> DataFrame:
    """Decode ``.annot`` JSON lines back to mention rows
    (AnnotationDeserializerAE analogue, ``AnnotationDeserializerAE.java:41-120``)."""
    if isinstance(spark_or_df, SparkSession):
        raw = spark_or_df.read.text(paths)
    else:
        raw = spark_or_df
    parsed = raw.select(F.from_json("value", ANNOT_SCHEMA).alias("a")).select("a.*")
    return parsed.select(
        F.split_part(F.col("documentId"), F.lit(":"), F.lit(1)).alias("conv_id"),
        F.split_part(F.col("documentId"), F.lit(":"), F.lit(2))
        .cast("int")
        .alias("turn_idx"),
        F.col("type").alias("concept_id"),
        F.col("spans")[0][0].alias("begin"),
        F.col("spans")[0][1].alias("end"),
        F.col("coveredText").alias("covered_text"),
        F.col("annotatorName").alias("annotator"),
        F.col("slots"),
    )


def mentions_to_a1_lines(mentions: DataFrame, doc_col: str = "conv_id") -> DataFrame:
    """Render `.a1` standoff lines per document, T/N ids numbered in document
    order (``row_number`` over begin/end — SURVEY.md §2.6)."""
    w = Window.partitionBy(doc_col).orderBy("begin", "end", "concept_id")
    numbered = mentions.withColumn("i", F.row_number().over(w))
    t_line = F.concat(
        F.lit("T"), F.col("i"), F.lit("\tontology_term "),
        F.col("begin"), F.lit(" "), F.col("end"), F.lit("\t"),
        F.col("covered_text"),
    )
    n_line = F.concat(
        F.lit("N"), F.col("i"), F.lit("\tReference T"), F.col("i"),
        F.lit(" "), F.col("concept_id"), F.lit("\t"),
    )
    return numbered.select(
        F.col(doc_col).alias("doc_id"),
        F.col("i"),
        t_line.alias("t_line"),
        n_line.alias("n_line"),
    )


def a1_lines_to_text(a1: DataFrame) -> DataFrame:
    """One row per document with the full `.a1` file body (T line then N line
    per annotation, document order)."""
    return (
        a1.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "t_line", "n_line"))
            ).alias("rows")
        )
        .select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.flatten(
                    F.transform("rows", lambda r: F.array(r["t_line"], r["n_line"]))
                ),
            ).alias("body"),
        )
    )


def parse_a1_text(spark: SparkSession, path: str) -> DataFrame:
    """Load a `.a1` file into mention rows: join T rows with N rows on the
    annotation index (the reference's ``convertA1forEvaluation.pl:30-48``
    T↔N merge as a self-join)."""
    raw = spark.read.text(path)
    parts = raw.select(F.split("value", "\t").alias("p")).filter(F.size("p") >= 2)
    t_rows = (
        parts.filter(F.col("p")[0].startswith("T"))
        .select(
            F.substring(F.col("p")[0], 2, 10).cast("int").alias("i"),
            F.split(F.col("p")[1], " ").alias("s"),
            F.col("p")[2].alias("covered_text"),
        )
        .select(
            "i",
            F.col("s")[1].cast("int").alias("begin"),
            F.col("s")[2].cast("int").alias("end"),
            "covered_text",
        )
    )
    n_rows = parts.filter(F.col("p")[0].startswith("N")).select(
        F.substring(F.col("p")[0], 2, 10).cast("int").alias("i"),
        F.split(F.col("p")[1], " ")[2].alias("concept_id"),
    )
    return t_rows.join(n_rows, "i").select(
        "concept_id", "begin", "end", "covered_text"
    )


def load_generic_annotations(
    spark: SparkSession, path: str, score_cutoff: int | None = None
) -> DataFrame:
    """Generic annotation TSV source with optional score filter
    (``GenericAnnotationLoader.java:76-118``; ``README.md:175``)."""
    schema = (
        "concept_id string, covered_text string, begin int, end int, score int"
    )
    df = spark.read.csv(path, sep="\t", schema=schema)
    if score_cutoff is not None:
        df = df.filter(F.col("score") >= F.lit(score_cutoff))
    return df


def write_annot_files(
    mentions: DataFrame,
    path: str,
    annotator_name: str = "kgpipe",
    compress: bool = False,
    infix: str | None = None,
) -> str:
    """AnnotationSerializerAE sink: JSON-lines ``.annot(.gz)`` output.
    ``compress`` maps to the gzip codec option
    (``AnnotationSerializerAE.java:121-124``); ``infix`` renders the
    reference's ``<docId>-<infix>.annot`` filename templating
    (``AnnotationSerializerAE.java:272-278``) as a destination-directory
    suffix, the table-sink equivalent of per-file naming.  Returns the
    resolved destination path."""
    out = mentions_to_annot_json(mentions, annotator_name)
    dest = path if infix is None else f"{path.rstrip('/')}-{infix}"
    writer = out.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(dest)
    return dest


def write_document_text(
    transcripts: DataFrame, path: str, compress: bool = False
) -> None:
    """DocumentTextSerializerAE analogue
    (``PmcNxml2TxtPipeline.java:122-126``): per-turn text sink with
    optional gzip parquet codec."""
    out = transcripts.select(
        F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))
        .alias("doc_id"),
        "text",
    )
    writer = out.write.mode("overwrite")
    if compress:
        writer = writer.option("compression", "gzip")
    writer.parquet(path)


def write_document_metadata(metadata: DataFrame, path: str) -> None:
    """DocumentMetaDataSerializerAE analogue
    (``PmcNxml2TxtPipeline.java:164-167``): side metadata table sink."""
    metadata.write.mode("overwrite").parquet(path)

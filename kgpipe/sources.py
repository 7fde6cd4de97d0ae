"""Scans / sources (SURVEY.md §2.1): text directories, transcript tables,
catalog bulk-load with metadata attach.

Spark-first renderings of the reference collection readers:

- ``read_text_dir`` ≡ FileSystemCollectionReader (one CAS per ``.txt`` file,
  ``EntityFinder.java:93-95``): ``spark.read.text(wholetext)`` +
  ``input_file_name()`` — one row per file, doc id from the filename.
- ``read_transcripts`` — the primary input table (parquet or catalog table),
  schema-checked against the normative transcripts schema.
- ``load_catalog`` ≡ CatalogLoader_PMC_OA (``CatalogLoader_PMC_OA.java:52-98``):
  scan a bulk directory listing, join file names to a metadata TSV
  (broadcast hash join on filename — the reference does a per-file map
  lookup), derive the 2-level directory layout as partition columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schemas


def read_text_dir(
    spark: SparkSession,
    path: str,
    suffix: str = ".txt",
    num: int | None = None,
    skip: int = 0,
) -> DataFrame:
    """Directory of text files → one row per document
    ``(doc_id, text, src_file)``; skip/limit semantics per
    ``PipelineParams.java:21-22`` (deterministic by file name order)."""
    df = (
        spark.read.text(f"{path}/*{suffix}", wholetext=True)
        .select(
            F.input_file_name().alias("src_file"),
            F.col("value").alias("text"),
        )
        .withColumn(
            "doc_id",
            # input_file_name() is a percent-encoded URI; decode so spacey
            # filenames yield their real name as doc_id.  A literal '+' is
            # NOT form-encoded in a file URI, so shield it from
            # url_decode's '+'→space rule before decoding.
            F.url_decode(F.replace(
                F.regexp_replace(
                    F.element_at(F.split(F.col("src_file"), "/"), -1),
                    f"{suffix}$", "",
                ),
                F.lit("+"), F.lit("%2B"),
            )),
        )
    )
    if skip or num is not None:
        # skip/limit is deterministic by FILE NAME order, so derive the
        # boundary names from the file listing (metadata-sized, driver-side
        # Hadoop globStatus — works for local, HDFS, and object-store
        # schemes alike, including schemeless paths on a remote
        # fs.defaultFS) and push a narrow range filter into the scan — a
        # global row_number window here would sort every document's text
        # through one task (the round-1 plan audit's single-task sort).
        names = _list_files(spark, f"{path}/*{suffix}")
        if names is None:
            # listing unavailable (exotic FS): windowed fallback — correct
            # but single-task-sorted; acceptable only off the hot path
            from pyspark.sql import Window

            w = Window.orderBy("src_file")
            df = df.withColumn("__rn", F.row_number().over(w)).filter(
                F.col("__rn") > skip
            )
            if num is not None:
                df = df.filter(F.col("__rn") <= skip + num)
            return df.drop("__rn").select("doc_id", "text", "src_file")
        window_names = names[skip:skip + num if num is not None else None]
        if not window_names:
            return df.filter(F.lit(False)).select("doc_id", "text", "src_file")
        # membership, not a lexicographic range: only files actually in the
        # listed window pass (a range also admits same-range names the
        # listing never saw).  input_file_name() yields a percent-encoded
        # URI while the Hadoop listing may not encode, so match each window
        # basename in raw, quoted, and unquoted forms (InSet, still pushed
        # ahead of the text read).
        from urllib.parse import quote, unquote

        basenames: set[str] = set()
        for n in window_names:
            b = n.rsplit("/", 1)[-1]
            basenames.update({b, quote(b), unquote(b)})
        base = F.element_at(F.split(F.col("src_file"), "/"), -1)
        df = df.filter(base.isin(sorted(basenames)))
    return df.select("doc_id", "text", "src_file")


def _list_files(spark: SparkSession, pattern: str) -> list[str] | None:
    """Driver-side file listing through the Hadoop FileSystem API (the same
    resolver ``spark.read`` uses, so local/HDFS/object-store paths and a
    remote fs.defaultFS all behave); None when the FS refuses to list."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(pattern)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        statuses = fs.globStatus(jpath)
        if statuses is None:
            return []
        return sorted(str(s.getPath()) for s in statuses)
    except Exception:
        return None


def text_dir_to_transcripts(docs: DataFrame) -> DataFrame:
    """One document per conversation, one line per turn — the shape used by
    the reference-parity tests (line breaks ≡ sentence boundaries,
    ``CraftConceptMapperEvaluator.java:201-206``)."""
    lines = docs.select(
        F.col("doc_id").alias("conv_id"),
        F.posexplode(F.split("text", "\n")).alias("turn_idx", "text"),
    ).filter(F.trim("text") != "")
    return lines.select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def read_transcripts(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Load the primary transcripts table and verify the normative schema
    (conv_id, turn_idx, role, text, tool, ts — BASELINE.json input_hint)."""
    df = (
        spark.read.parquet(path_or_table)
        if "/" in path_or_table
        else spark.read.table(path_or_table)
    )
    want = {f.name for f in schemas.TRANSCRIPTS.fields}
    have = set(df.columns)
    missing = want - have
    if missing:
        raise ValueError(f"transcripts table missing columns: {sorted(missing)}")
    return df.select(*[f.name for f in schemas.TRANSCRIPTS.fields])


def load_catalog(
    files: DataFrame,
    metadata_tsv: DataFrame,
    filename_col: str = "filename",
) -> DataFrame:
    """Attach per-file metadata (broadcast join on filename) and derive the
    reference's 2-level directory layout as partition columns
    (``CatalogLoader_PMC_OA.java:75-98``: files moved into
    ``<hash0>/<hash1>/`` — here: stable hash prefix columns, which ARE the
    partition layout when written with partitionBy)."""
    joined = files.join(F.broadcast(metadata_tsv), filename_col, "left")
    h = F.md5(F.col(filename_col))
    return joined.withColumn("dir1", F.substring(h, 1, 2)).withColumn(
        "dir2", F.substring(h, 3, 2)
    )


def import_metadata(transcripts: DataFrame) -> DataFrame:
    """PmcMetadataImportAE analogue (``PmcNxml2TxtPipeline.java:106-107``):
    derive per-conversation metadata from the source table itself
    (select/withColumn — SURVEY.md §2.1): turn count and range, roles and
    tools present, time span.  One partial-aggregated groupBy on conv_id."""
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.array_sort(F.collect_set("role")).alias("roles"),
        F.array_sort(F.collect_set("tool")).alias("tools"),
        F.min("ts").alias("started_at"),
        F.max("ts").alias("ended_at"),
    )


def get_conversation(transcripts: DataFrame, conv_id: str) -> DataFrame:
    """Point lookup by conversation id
    (``Neo4jRunCatalog.getDocumentById``, ``Neo4jRunCatalog.java:533-560``;
    the Neo4j index at ``:124-135``): a plain filter — on a
    bucket(conv_id)-partitioned table the predicate prunes to one
    partition, the Spark-native equivalent of the reference's index."""
    return transcripts.filter(F.col("conv_id") == conv_id).orderBy("turn_idx")

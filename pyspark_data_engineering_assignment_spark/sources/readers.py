"""Batch and streaming sources, always with explicit schemas.

Parity targets:
  * S2 static CSV scan with explicit schema (reference ``Mechanism Y.py:68``)
  * S3 streaming CSV file source with ``maxFilesPerTrigger``
    (reference ``Mechanism Y.py:100-105``)
  * S5 empty-DataFrame literal (reference ``Mechanism Y.py:216-218``) -
    here ``spark.createDataFrame([], schema)``, no RDD detour.

At scale the file-stream source is swapped for Kafka / auto-loader style
sources; the API here keeps that a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pyspark_data_engineering_assignment_spark.schemas import IMPORTANCE_SCHEMA, TRANSACTION_SCHEMA


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    multi_line: bool = False,
) -> DataFrame:
    """Static CSV scan, header on, schema explicit (never inferred).

    ``escape='"'`` (round-11 unicode/quoting sweep): Spark's CSV default
    escape is BACKSLASH, but everything that feeds this engine - pandas
    ``to_csv`` (the reference's Mechanism X), DuckDB, Excel, RFC 4180 -
    doubles quotes instead. Under the default, a value containing a
    quote came back with its quoting characters embedded in the data
    (measured round 11). Costless and scale-neutral.

    ``multi_line``: quoted fields containing newlines require
    ``multiLine=true``, which parses each FILE as one split - fine for
    bounded chunk files, a parallelism cliff for one huge CSV (a single
    100 GB file becomes a single task). Static bulk scans therefore
    default to false; callers whose data embeds newlines must opt in
    (or chunk the file, as the feeder does).
    """
    return (
        spark.read.option("escape", '"')
        .option("multiLine", str(multi_line).lower())
        .csv(path, header=True, schema=schema)
    )


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; optional column pruning expressed early so it reaches
    the reader (``ReadSchema`` in the physical plan)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = 1,
    clean_source: str | None = None,
    source_archive_dir: str | None = None,
    multi_line: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Streaming file source tailing a directory (local stand-in for the
    reference's S3 prefix, ``Mechanism Y.py:100-105``).

    ``corrupt_col`` (round 11): the streaming face of
    ``read_csv_audited`` - when set, rows that fail the schema under a
    CORRECT header (untypable field, wrong arity) land WHOLE in this
    declared column instead of silently nulling fields; the pipeline's
    quarantine channel filters on it. Header damage still fails the
    batch loudly (enforceSchema=false below) - row damage is
    quarantinable, header damage is a producer contract breach.

    ``clean_source`` (T6) is the reference's abandoned
    ``cleanSource=archive`` option (``Mechanism Y.py:106-107``), working
    here: "archive" moves each consumed file to ``source_archive_dir``
    once the batch that read it commits; "delete" removes it. The
    archive dir must live OUTSIDE the source glob (Spark refuses
    self-overlapping archives); cleaning is best-effort and lags one
    batch behind consumption by design.

    ``enforceSchema=false``: with the default (true), Spark IGNORES each
    file's header and maps columns POSITIONALLY - a schema-drifted chunk
    (producer reordered/renamed columns) is silently read with amounts
    in the customer column, the worst failure mode a 100 TB ingest has
    (measured round 11: a reordered two-column file reads wrong with
    zero warnings). With false, every file's header is validated and a
    drifted file fails the batch LOUDLY, naming the file; the batch has
    not committed, so fixing or removing the file and restarting from
    the checkpoint resumes exactly where it stopped (pinned in
    tests/test_streaming_corrupt_inputs.py). Malformed ROWS under a
    correct header still just null out (PERMISSIVE) - row damage is
    quarantinable, header damage is a producer contract breach.
    """
    reader = (
        spark.readStream.format("csv")
        .option("header", "true")
        .option("enforceSchema", "false")
        # RFC-4180 doubled-quote escape (round-11 sweep; see read_csv).
        .option("escape", '"')
        # multiLine lets a quoted field contain a newline but switches
        # univocity to the whole-file parse path - measured 5.8x slower
        # on the sf1 flagship drain (1M rows: 196k -> 34k rows/s), so
        # the FAST line-split path stays the default and newline-free
        # chunks are a producer contract the feeder enforces loudly
        # (tools/feeder.py allow_multiline). Producers that need
        # embedded newlines opt in here (EngineConfig.csv_multi_line).
        .option("multiLine", str(multi_line).lower())
    )
    if corrupt_col:
        from pyspark.sql.types import StringType, StructField

        schema = StructType(
            [*schema.fields, StructField(corrupt_col, StringType(), True)]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
        if clean_source == "archive":
            if not source_archive_dir:
                raise ValueError("cleanSource=archive requires source_archive_dir")
            reader = reader.option("sourceArchiveDir", source_archive_dir)
    return reader.load(path)


def read_transactions(spark: SparkSession, path: str) -> DataFrame:
    """BankSim-style transactions CSV (reference fact schema)."""
    return read_csv(spark, path, TRANSACTION_SCHEMA)


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan with an explicit malformed-row policy: PERMISSIVE mode
    plus a declared corrupt-record column, so rows that fail the schema
    (wrong arity, untypable values) land WHOLE in ``corrupt_col``
    instead of silently nulling fields (the default) or killing the job
    (FAILFAST). A 100 TB ingest always contains malformed rows; the
    policy decision - quarantine, count, alert - belongs to the caller,
    which is only possible when the reader captures them. Filter
    ``corrupt_col IS NOT NULL`` for the quarantine stream and
    ``IS NULL`` for the clean one.

    SHARP EDGE (round-13 leap-second axis, pinned in
    ``tests/test_leap_second_ingest.py``): corruption is detected only
    for columns the CSV parser actually PARSES, and Catalyst prunes
    unreferenced columns all the way into the parser. A lazy
    ``.filter(corrupt_col IS NULL).agg(...)`` whose aggregate never
    references the malformed column therefore RESURRECTS the corrupt
    rows - the parse that would have failed never runs. The sanctioned
    recipe is the DetectionPipeline's: ``persist()`` the full parse
    FIRST, then split on the corrupt column (SPARK-21610's cached-parse
    route; caching materializes every column, freezing each row's
    corruption status).
    """
    from pyspark.sql.types import StringType, StructField

    audited = StructType(
        [*schema.fields, StructField(corrupt_col, StringType(), True)]
    )
    return (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("escape", '"')  # RFC-4180 doubled quotes (see read_csv)
        .schema(audited)
        .csv(path)
    )


def read_importance(spark: SparkSession, path: str) -> DataFrame:
    """CustomerImportance dimension; ``fraud`` renamed to ``ci_fraud`` to
    avoid the fact-column clash (reference ``Mechanism Y.py:69``), cached
    because it is reused by every micro-batch."""
    return (
        read_csv(spark, path, IMPORTANCE_SCHEMA)
        .withColumnRenamed("fraud", "ci_fraud")
        .cache()
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with an explicit schema. Schema inference over
    JSON is a full extra pass at 100 TB AND type-unstable (a column that
    is int in the sample and float later breaks the job) - so, like every
    reader here, the schema is declared, never inferred. Corrupt lines
    surface in ``_corrupt_record`` when the schema declares it."""
    return spark.read.schema(schema).json(path)


def empty_df(spark: SparkSession, schema: StructType) -> DataFrame:
    """Empty relation with a fixed schema (no ``sc.emptyRDD()`` detour)."""
    return spark.createDataFrame([], schema)


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC scan - the other columnar format with built-in Spark support
    (predicate pushdown, column pruning and vectorized reading work the
    same as parquet; ORC additionally carries bloom filters when the
    writer declares them). Interop surface for warehouses that standardize
    on ORC/Hive."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df

"""Schema-first file sources (CSV / JSON / text / binary / partitioned).

Mirrors the reference's file-shaped inputs (`convml_data/sources/les.py:33-117`
glob scans, `utils/luigi.py:91-117` JSON/YAML DB targets, per-object fetches
in `sources/goes16/pipeline.py:73-89`) as Spark datasources.

Every structured reader REQUIRES an explicit schema: ``inferSchema`` /
sampled JSON inference cost one full scan of the input before the first real
job and can silently widen types between runs — both disqualifying at
100 TB. Malformed rows are routed to a ``_corrupt_record`` column
(PERMISSIVE) rather than failing the job, so one bad object in a billion
doesn't kill a stage; callers that want strictness filter or assert on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    """Schema + string ``_corrupt_record`` field (PERMISSIVE capture slot)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """CSV scan with a mandatory schema.

    ``keep_corrupt=True`` keeps the ``_corrupt_record`` column (raw line of
    any row that failed to parse); by default corrupt rows are dropped so the
    result schema is exactly ``schema``.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    reader = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    keep_corrupt: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with a mandatory schema (no sampling inference)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    reader = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.json(path)
    if keep_corrupt:
        return df
    return df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False, glob: str | None = None
) -> DataFrame:
    """Line-per-row (default) or file-per-row text scan → ``value`` column."""
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    # .text(wholetext=...) — the keyword, not an option: DataFrameReader.text
    # re-sets the option from its parameter default
    return reader.text(path, wholetext=whole_file)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = False
) -> DataFrame:
    """Fetched-object scan (S2/S4/S6 analog): each file becomes one row of
    ``(path, modificationTime, length, content binary)``.

    This is the ingestion boundary for multimodal payloads — downstream
    decode runs as Arrow-batched pandas UDFs over ``content``
    (``operators/multimodal.py``), never driver-side loops. Push a
    ``pathGlobFilter`` so directory listing prunes before any byte is read.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def read_partitioned(
    spark: SparkSession,
    base_path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Partition-discovering scan rooted at ``base_path``.

    Reads ``base_path`` with ``basePath`` pinned so Hive-style partition
    directories (``_part=2024-01-01/…`` from
    ``pipeline.split_by_time_partition``) surface as real columns AND
    predicates on them become directory-pruning PartitionFilters — the scan
    never lists, let alone reads, non-matching partitions. Parquet keeps its
    own schema; CSV/JSON require one here too.
    """
    reader = spark.read.format(fmt).option("basePath", base_path)
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"explicit schema required for fmt={fmt!r}")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(base_path)

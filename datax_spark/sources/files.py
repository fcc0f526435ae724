"""File sources/sinks with DataX unstructured-storage option parity.

Maps the reference's CSV/text option surface
(``plugin-unstructured-storage-util/.../reader/
UnstructuredStorageReaderUtil.java:114-429``: fieldDelimiter, encoding,
skipHeader, nullFormat, compression, per-column {index|value|type|format}
projection) onto ``spark.read.csv`` options plus a typed projection:

- column index selection → positional ``_c{i}`` select + cast
- constant columns ({"value": ...}) → ``F.lit`` (the streamreader-style
  const injection)
- type+format → explicit cast / to_timestamp with pattern

Compression codecs (gzip/bzip2/snappy/…) are inferred by Spark from file
extension — the reference's codec switch collapses away. Writers map to
``df.write`` with mode semantics: DataX hdfswriter writeMode append /
nonConflict / truncate (``hdfswriter/.../HdfsWriter.java:83-92``) →
append / errorifexists / overwrite.

Codec boundary (the exact line, so nobody guesses): Spark's Hadoop codec
factory covers gzip, bzip2, deflate, lz4, zstd, and snappy-in-parquet/orc
out of the box. The reference additionally dialects lzo, lzo_deflate,
hadoop-snappy and framing-snappy for RAW text streams
(``UnstructuredStorageReaderUtil.java:114-234``) — the LZO family is
GPL-licensed and needs the hadoop-lzo jar + native libs installed
cluster-side (then ``io.compression.codecs`` picks it up with NO change
here), and the two snappy *framings* for raw text are nonstandard; both
are declared out of scope for this engine. Parquet/ORC-embedded snappy —
the case that matters at lake scale — works natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

WRITE_MODES = {"append": "append", "nonConflict": "errorifexists", "truncate": "overwrite"}

# hdfsreader's supported formats (``hdfsreader/.../HdfsReader.java:82-88``:
# TEXT, CSV, ORC, SEQ, RC, PARQUET). SEQ/RC are Hadoop-era container
# formats with no modern DataSource — out of scope (Hive SerDe tables
# cover them on a real cluster).
READ_FORMATS = {"text", "csv", "orc", "parquet", "json"}


def read_files(spark: SparkSession, path: str | list[str], fmt: str = "parquet", **options):
    """Format-dispatching file read — the hdfsreader format gate, minus
    the per-format row-assembly code Spark's readers replace. Paths may
    be globs; object stores mount as filesystem schemes (s3a://, oss via
    hadoop-aliyun) exactly as the reference's OSS/HDFS readers do."""
    fmt = fmt.lower()
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported read format {fmt!r} (SEQ/RC need Hive SerDe tables)")
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    paths = path if isinstance(path, list) else [path]
    return getattr(reader, fmt)(*paths)


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    field_delimiter: str = ",",
    encoding: str = "UTF-8",
    skip_header: bool = False,
    null_format: str = r"\N",
    columns: list[dict] | None = None,
    cast_defaults=None,
):
    """DataX txtfile/hdfs/oss reader semantics on Spark's CSV source.

    ``cast_defaults`` (a :class:`datax_spark.functions.column_cast.
    CastDefaults`) enables the reference's ColumnCast matrix for date
    columns: datetimeFormat → dateFormat → timeFormat → extraFormats
    cascade in the configured timeZone (``ColumnCast.java:92-122``), a
    per-column ``format`` overriding the cascade (the two-arg
    ``string2Date`` overload). Without it, date columns keep the legacy
    single-format/plain-cast behavior."""
    df = (
        spark.read.option("sep", field_delimiter)
        .option("encoding", encoding)
        .option("header", str(skip_header).lower())
        .option("nullValue", null_format)
        .csv(path)
    )
    if not columns:
        return df
    out = []
    for j, spec in enumerate(columns):
        name = spec.get("name", f"col{j}")
        if "value" in spec:  # constant column
            col = F.lit(spec["value"])
        else:
            idx = spec["index"]
            src = df.columns[idx] if skip_header else f"_c{idx}"
            col = F.col(src)
        ctype = spec.get("type", "string").lower()
        fmt = spec.get("format")
        if ctype == "date":
            if cast_defaults is not None:
                from datax_spark.functions.column_cast import string_to_timestamp

                col = string_to_timestamp(col, cast_defaults, fmt)
            else:
                col = F.to_timestamp(col, fmt) if fmt else col.cast("timestamp")
        elif ctype in {"long", "bigint"}:
            col = col.cast("bigint")
        elif ctype == "double":
            col = col.cast("double")
        elif ctype in {"bool", "boolean"}:
            col = col.cast("boolean")
        elif ctype == "bytes":
            enc = cast_defaults.encoding if cast_defaults is not None else "UTF-8"
            col = F.encode(col.cast("string"), enc)
        else:
            col = col.cast("string")
        out.append(col.alias(name))
    return df.select(*out)


def write_files(df: DataFrame, path: str, fmt: str = "parquet", write_mode: str = "append", **options):
    """Unified writer with DataX writeMode mapping; Spark's task-commit
    protocol replaces the reference's temp-dir + move dance
    (``HdfsWriter.java:159-185``)."""
    mode = WRITE_MODES.get(write_mode, write_mode)
    w = df.write.mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    getattr(w, fmt)(path)


def _no_executor(sql: str) -> None:
    raise RuntimeError(
        "this JDBC write needs sink-side SQL execution (preSql/postSql/"
        f"upsert) — pass sql_executor=<callable(sql)>; statement: {sql!r}"
    )


def write_jdbc_batched(
    df,
    url: str,
    table: str,
    write_mode: str = "insert",
    batch_size: int = 2048,
    num_partitions: int | None = None,
    pre_sql: list[str] | None = None,
    post_sql: list[str] | None = None,
    key_cols: list[str] | None = None,
    dialect: str = "mysql",
    sql_executor=None,
    user: str | None = None,
    password: str | None = None,
    staging_token: str | None = None,
    salvage_loader=None,
    max_salvage_rows: int = 100_000,
    **options,
):
    """JDBC sink with CommonRdbmsWriter semantics
    (``plugin-rdbms-util/.../writer/CommonRdbmsWriter.java:266-313`` batch
    loop; write modes ``WriterUtil.java:111-168``; preSql/postSql hooks
    ``CommonRdbmsWriter.java:89-129`` with @table rendering).

    - ``insert`` → plain INSERT batches (Spark JDBC ``append``).
    - ``replace`` / ``update`` → Spark's JDBC writer only generates
      INSERT, so upserts run the staging plan from
      :mod:`datax_spark.sources.jdbc_sql`: preSql creates a staging
      table, batches INSERT into it, postSql applies one set-based
      upsert (ON DUPLICATE KEY / MERGE) and drops staging — same final
      state as the reference's per-batch REPLACE loop.
    - ``sql_executor(sql)`` performs sink-side statements (a JDBC
      connection wrapper on a real deployment; a recording fake in unit
      tests — no live database exists in this sandbox).
    - ``batchSize`` maps to the JDBC option of the same name (reference
      default ``Constant.DEFAULT_BATCH_SIZE``; benchmarks show ≥512
      required for throughput, ``mysqlwriter/doc/mysqlwriter.md:332-335``).
    - ``user``/``password`` authenticate BOTH the sink-side statements
      (via the caller's executor) and Spark's bulk INSERT (injected as
      JDBC options here).
    - the staging table name carries a per-run unique token
      (``staging_token``; generated when absent) so concurrent upsert
      jobs against the same target cannot DROP/CREATE each other's
      staging table mid-load.
    - ``salvage_loader`` (from :func:`~datax_spark.sources.jdbc_sql.
      jdbc_row_loader`) enables the reference's batch→per-row degrade
      (``CommonRdbmsWriter.java:379-409``): when the bulk load throws,
      the staging table is wiped and reloaded row-by-row, routing rows
      the database rejects into the returned dirty list instead of
      failing the job. With it set, even ``insert`` mode loads via a
      staging table so the degrade is exactly-once w.r.t. the target.
      Bounded by ``max_salvage_rows`` (the degrade is driver-side; a
      bulk failure bigger than the bound re-raises).

    Returns ``(n_salvaged_ok, dirty)`` — ``(None, [])`` when the bulk
    path succeeded.
    """
    import uuid as _uuid

    from datax_spark.sources.jdbc_sql import (
        execute_sqls,
        render_pre_post_sqls,
        staging_insert_plan,
        staging_upsert_plan,
    )

    if write_mode not in ("insert", "replace", "update"):
        raise ValueError(f"unknown writeMode {write_mode!r}")
    if user is not None:
        options.setdefault("user", user)
    if password is not None:
        options.setdefault("password", password)
    executor = sql_executor or _no_executor
    load_table = table
    plan_post: list[str] = []
    token = staging_token if staging_token is not None else _uuid.uuid4().hex[:8]
    staging_name = f"{table}_datax_stg_{token}" if token else None
    if write_mode != "insert":
        plan = staging_upsert_plan(
            table, df.columns, key_cols or [], dialect=dialect, staging=staging_name,
        )
    elif salvage_loader is not None:
        plan = staging_insert_plan(table, df.columns, dialect=dialect, staging=staging_name)
    else:
        plan = None
    if plan is not None:
        execute_sqls(executor, plan["pre"])
        load_table = plan["load_table"]
        plan_post = plan["post"]
    if pre_sql:
        execute_sqls(executor, render_pre_post_sqls(pre_sql, table))
    out = df.repartition(num_partitions) if num_partitions else df
    w = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", load_table)
        .option("batchsize", batch_size)
        .mode("append")
    )
    for k, v in options.items():
        w = w.option(k, v)
    salvaged, dirty = None, []
    try:
        w.save()
    except Exception:
        if salvage_loader is None:
            raise
        n = out.count()
        if n > max_salvage_rows:
            raise
        # wipe the partially-loaded staging table, replay row-by-row
        executor(f"DELETE FROM {load_table}")
        rows = [tuple(r) for r in out.collect()]
        salvaged, dirty = salvage_loader(load_table, out.columns, rows)
    if plan_post:
        execute_sqls(executor, plan_post)
    if post_sql:
        execute_sqls(executor, render_pre_post_sqls(post_sql, table))
    return salvaged, dirty


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    split_col: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 1,
    predicates: list[str] | None = None,
    **options,
):
    """Partitioned JDBC read — the CommonRdbmsReader split contract
    (``CommonRdbmsReader.java:172-224``) via Spark's built-in partitioned
    JDBC source; explicit predicate lists cover the reference's custom
    WHERE-slice mode. (No live database in this sandbox — exercised via
    split-math unit tests.)"""
    if predicates:
        # explicit WHERE-slice mode uses the DataFrameReader.jdbc API;
        # extra options travel as JDBC connection properties there
        return spark.read.jdbc(
            url, table, predicates=predicates,
            properties={k: str(v) for k, v in options.items()},
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    if split_col is not None:
        if lower is None or upper is None:
            raise ValueError(
                "split_col requires explicit lower/upper bounds (the "
                "reference derives min/max with a bounds query first — "
                "run one and pass the results, or use predicates=[...])"
            )
        reader = (
            reader.option("partitionColumn", split_col)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()

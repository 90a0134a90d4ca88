"""Source/sink abstraction: object stores, table formats, file metadata.

The reference ships three hand-rolled cloud connectors that download one
object and parse it in-memory (S3 `src/datacanary/connectors/s3_connector.py:25-51`,
Azure `azure_connector.py:69-106`, GCS `gcs_connector.py:46-76`, plus
listing/metadata helpers and CSV credential files `__main__.py:20-51`).
On Spark all of that collapses into ONE code path: a URI scheme handled
by the Hadoop filesystem layer, with credentials as configuration. This
module is that mapping, plus the Iceberg/parquet table-format switch the
north rule needs (sandbox has no Iceberg jars → graceful fallback).

| reference op | here |
|---|---|
| S3/Azure/GCS read_parquet | ``read_table(spark, "s3a://…" / "abfss://…" / "gs://…" / local)`` |
| list_parquet_files        | ``list_parquet_files`` (Hadoop FS glob — scheme-agnostic) |
| get_object_metadata       | ``object_metadata`` (FileStatus: size, mtime) |
| credential CSV loading    | ``object_store_conf`` → ``spark.conf`` keys |

Scale: none of these touch the driver with data — ``read_table`` returns
a lazy DataFrame whose scan plans directly against the store (ranged
reads, column pruning, predicate pushdown); listing/metadata go through
the same FileSystem client executors use.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def object_store_conf(provider: str, creds: dict[str, str]) -> dict[str, str]:
    """Spark/Hadoop conf keys for an object store (reference credential
    CSVs → configuration, not code). Apply at session-builder time, or
    on a LIVE session via :func:`apply_store_conf` — a runtime
    ``spark.conf.set("spark.hadoop.*")`` silently never reaches the
    Hadoop configuration the FileSystem connectors read."""
    p = provider.lower()
    if p in ("s3", "aws"):
        return {
            "spark.hadoop.fs.s3a.access.key": creds.get("access_key", ""),
            "spark.hadoop.fs.s3a.secret.key": creds.get("secret_key", ""),
            **({"spark.hadoop.fs.s3a.endpoint": creds["endpoint"]}
               if "endpoint" in creds else {}),
        }
    if p in ("azure", "abfs"):
        account = creds.get("account", "")
        key = creds.get("account_key", "")
        # abfs[s] connectors read the account key against the DFS
        # endpoint; legacy wasb[s] reads it against the BLOB endpoint —
        # emitting only one leaves the other scheme silently unauthed,
        # so the default emits BOTH. An explicit endpoint_suffix
        # (sovereign clouds etc.) narrows to that endpoint only.
        if "endpoint_suffix" in creds:
            suffixes = [creds["endpoint_suffix"]]
        else:
            suffixes = ["dfs.core.windows.net", "blob.core.windows.net"]
        return {
            f"spark.hadoop.fs.azure.account.key.{account}.{s}": key
            for s in suffixes
        }
    if p in ("gcs", "gcp"):
        return {
            "spark.hadoop.google.cloud.auth.service.account.enable": "true",
            "spark.hadoop.google.cloud.auth.service.account.json.keyfile":
                creds.get("keyfile", ""),
        }
    raise ValueError(f"unknown provider: {provider}")


def apply_store_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    """Apply object-store conf to a LIVE session correctly:
    ``spark.hadoop.*`` keys go (prefix-stripped) onto the live
    ``hadoopConfiguration()``; everything else through ``spark.conf``."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        if k.startswith("spark.hadoop."):
            hconf.set(k[len("spark.hadoop."):], v)
        else:
            spark.conf.set(k, v)


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND the runtime jar loads.

    Both halves are checked: the jar alone with no ``spark.sql.catalog.*``
    conf would make ``read_table("iceberg:db.t")`` skip the clear setup
    error here only to die later inside ``reader.table()`` with an opaque
    TABLE_OR_VIEW_NOT_FOUND."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    try:
        # session-start conf + runtime conf (catalog confs may be set
        # either way; RuntimeConfig.getAll covers both)
        it = spark._jsparkSession.conf().getAll().keysIterator()
        while it.hasNext():
            if str(it.next()).startswith("spark.sql.catalog."):
                return True
    except Exception:
        # conf enumeration failed (exotic backend): fall back to the
        # jar-only signal rather than wrongly gating Iceberg off
        return True
    return False


def read_table(spark: SparkSession, source: str,
               snapshot_id: int | None = None,
               as_of_timestamp: int | None = None) -> DataFrame:
    """Read pages from any supported source, lazily.

    * ``iceberg:db.table`` — Iceberg catalog table; requires the runtime
      jar, else raises with a clear message. ``snapshot_id`` /
      ``as_of_timestamp`` (ms epoch) pin the read to a snapshot — the
      north rule's resume-from-snapshot-checkpoint: a restarted job
      re-reads the exact snapshot its manifest recorded, immune to rows
      that landed since (Iceberg read options ``snapshot-id`` /
      ``as-of-timestamp``).
    * anything else — a parquet path/URI (local, ``s3a://``, ``abfss://``,
      ``gs://`` — one code path, scheme resolved by Hadoop); snapshot
      options are Iceberg-only and rejected here.
    """
    if source.startswith(ICEBERG_PREFIX):
        name = source[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "iceberg-spark-runtime to spark.jars.packages or pass a "
                "parquet path instead")
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_timestamp is not None:
            reader = reader.option("as-of-timestamp", str(as_of_timestamp))
        return reader.table(name)
    if snapshot_id is not None or as_of_timestamp is not None:
        raise ValueError("snapshot reads need an iceberg: source "
                         "(parquet paths have no snapshot lineage)")
    lower = source.lower()
    # reference-parity tabular files (its README claims CSV/JSON
    # validation; /root/reference reads everything into pandas —
    # __main__.py:474-480 — so schema inference matches its behavior).
    # These are the ANALYSE/CHECK small-file paths: inference costs an
    # extra pass and multiLine CSV reads one file per task, both fine
    # at data-quality-report scale and wrong for the 10^12-doc corpus
    # paths, which use parquet or the explicit-schema jsonl readers.
    if lower.endswith((".csv", ".csv.gz", ".tsv", ".tsv.gz")):
        sep = "\t" if lower.endswith((".tsv", ".tsv.gz")) else ","
        return (spark.read.option("header", True)
                .option("inferSchema", True)
                .option("multiLine", True).option("escape", '"')
                .csv(source, sep=sep))
    if lower.endswith((".jsonl", ".jsonl.gz")):
        return spark.read.json(source)
    if lower.endswith((".json", ".json.gz")):
        # .json = a pandas-style document (pretty-printed object/array
        # of records) — needs multiLine; name line-delimited files
        # .jsonl for the streaming-friendly line reader above
        return spark.read.option("multiLine", True).json(source)
    return spark.read.parquet(source)


def write_table(df: DataFrame, target: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Write to an Iceberg table (``iceberg:db.table``) or parquet dir.

    ``partition_by`` writes hive-style directory partitions
    (``lang=en/…``): a reader's filter on the partition column becomes
    a PartitionFilters entry on the scan and prunes whole directories
    before any file is opened — the coarse pruning tier above parquet
    row-group min/max skipping (plan-locked in
    tests/test_plans.py::test_partitioned_write_prunes_directories).
    Partition by LOW-cardinality columns only (lang, date, source);
    a url-grained partitioning would create 10^9 directories.
    """
    if target.startswith(ICEBERG_PREFIX):
        name = target[len(ICEBERG_PREFIX):]
        writer = df.writeTo(name)
        if partition_by:
            if mode == "append":
                # DataFrameWriterV2.partitionedBy only applies to
                # create/createOrReplace; append() silently ignores it
                # and the existing table keeps its (possibly
                # unpartitioned) spec — fail loudly instead
                raise ValueError(
                    "partition_by with mode='append' is a no-op on an "
                    "Iceberg table (the existing partition spec wins); "
                    "use mode='overwrite' to (re)create the table "
                    "partitioned, or evolve the spec via Iceberg DDL")
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        # Honor DataFrameWriter mode semantics on the V2 writer: only
        # 'overwrite' may replace an existing table. Mapping every
        # non-append mode to createOrReplace would make mode='error' /
        # 'ignore' silently DROP the table and all its snapshots.
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.createOrReplace()
        elif mode in ("error", "errorifexists"):
            writer.create()  # raises TABLE_OR_VIEW_ALREADY_EXISTS
        elif mode == "ignore":
            try:
                writer.create()
            except Exception as e:  # table exists → no-op, like parquet
                if "ALREADY_EXISTS" not in str(e):
                    raise
        else:
            raise ValueError(f"unknown write mode: {mode!r}")
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def write_bucketed(df: DataFrame, name: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Write a BUCKETED parquet table: rows are hash-distributed into
    ``n_buckets`` files per partition by ``bucket_cols`` and sorted
    within each bucket.

    This is the co-located-join primitive at 100 TB: two tables
    bucketed by the same key with the same bucket count join with NO
    exchange on either side (the scan itself reports the hash
    distribution, so the sort-merge join's shuffle is elided —
    plan-locked in tests/test_plans.py), and aggregations on the bucket
    key skip their exchange the same way. For a url-keyed corpus that
    is repeatedly joined against its metrics/lineage tables, bucketing
    both once turns every subsequent join into a map-side zip.

    Bucketing requires the table catalog (``saveAsTable``) — Spark's
    native datasource bucketing, no Hive needed; ``path`` makes it an
    external table so the files live where the pipeline expects them.
    Read back with ``spark.table(name)`` (``read_bucketed``): reading
    the bare parquet directory would silently DROP the bucket metadata
    and re-shuffle.
    """
    w = df.write.format("parquet").mode(mode) \
        .bucketBy(n_buckets, *bucket_cols) \
        .sortBy(*(sort_cols or bucket_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read of a bucketed table (keeps the bucket distribution;
    a plain ``spark.read.parquet`` of the same files would not)."""
    return spark.table(name)


def write_text(spark: SparkSession, uri: str, content: str) -> None:
    """Write a small text/JSON artifact to ANY filesystem scheme via the
    Hadoop FS client (local path, s3a://, abfss://, gs://, hdfs://) —
    summary/lineage sidecars must not assume a local output dir."""
    fs, path, _ = _fs_and_path(spark, uri)
    out = fs.create(path, True)  # overwrite
    try:
        out.write(content.encode("utf-8"))
    finally:
        out.close()


def read_text(spark: SparkSession, uri: str) -> str:
    """Read a small text/JSON artifact from ANY filesystem scheme via
    the Hadoop FS client — the counterpart of :func:`write_text` (model
    coefficient files, rule configs and summaries may live on s3a://
    next to the data, not on the driver's local disk)."""
    fs, path, jvm = _fs_and_path(spark, uri)
    stream = fs.open(path)
    try:
        # commons-io is on Spark's classpath; py4j COPIES byte arrays
        # across the bridge, so a Python-side read-into-buffer loop
        # would silently read nothing — drain the stream JVM-side.
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(spark: SparkSession, uri: str, content: str) -> None:
    """Commit-safe variant of :func:`write_text`: write to a temp sibling
    then rename over the target. ``write_text``'s ``fs.create(path,
    True)`` truncates in place, so a crash between truncate and close
    leaves an empty/partial file — fatal for commit markers (a store's
    meta.json) whose loss orphans all prior state. Rename is atomic on
    HDFS/local posix; on object stores it is copy+delete but still
    never exposes a partially-written object."""
    tmp = f"{uri}.tmp.{os.getpid()}"
    write_text(spark, tmp, content)
    fs, target, jvm = _fs_and_path(spark, uri)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    sc = spark.sparkContext
    try:
        # Single atomic rename-with-overwrite (FileContext honors
        # Options.Rename.OVERWRITE on HDFS/local). delete-then-rename
        # would reopen the exact crash window this function exists to
        # close: a death between the two calls leaves NO target at all.
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            sc._jsc.hadoopConfiguration())
        rename_cls = jvm.org.apache.hadoop.fs.Options.Rename
        opts = sc._gateway.new_array(rename_cls, 1)
        opts[0] = rename_cls.OVERWRITE
        fc.rename(tmp_path, target, opts)
    except Exception:
        # Stores without FileContext support (some object-store
        # connectors): fall back to delete+rename. Not atomic — but on
        # those stores rename is copy+delete anyway, so single-call
        # atomicity never existed; the temp-file write still prevents
        # partially-written content from ever being visible.
        if fs.exists(target):
            fs.delete(target, False)
        if not fs.rename(tmp_path, target):
            raise IOError(f"atomic rename failed: {tmp} -> {uri}")


def path_exists(spark: SparkSession, uri: str) -> bool:
    """True iff the path exists, any filesystem scheme (Hadoop FS)."""
    fs, path, _ = _fs_and_path(spark, uri)
    return bool(fs.exists(path))


def _fs_and_path(spark: SparkSession, uri: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return path.getFileSystem(hconf), path, jvm


def list_parquet_files(spark: SparkSession, uri: str) -> list[str]:
    """All ``*.parquet`` files under a prefix, any scheme (mirror of the
    reference's paginated list ops — Hadoop FS handles continuation)."""
    fs, path, jvm = _fs_and_path(spark, uri)
    out: list[str] = []
    it = fs.listFiles(path, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if p.endswith(".parquet"):
            out.append(p)
    return sorted(out)


def object_metadata(spark: SparkSession, uri: str) -> dict:
    """Size/mtime of one object (mirror of head_object/get_blob_properties)."""
    fs, path, _ = _fs_and_path(spark, uri)
    st = fs.getFileStatus(path)
    return {
        "path": st.getPath().toString(),
        "size_bytes": st.getLen(),
        "last_modified": datetime.fromtimestamp(
            st.getModificationTime() / 1000.0, tz=timezone.utc).isoformat(),
        "is_dir": st.isDirectory(),
    }


# JSONL pages: the common published-corpus dump format (C4/OSCAR-style
# releases ship one JSON object per line, gzip per file). Wire schema:
# strings only — warc_ts ISO-8601, html base64 (JSON has no binary).
PAGES_JSONL_WIRE_SCHEMA = (
    "url string, warc_ts string, html string, text string, lang string")

# THE jsonl file-name contract, single-sourced: the Python-glob tuple
# (checkpoint chunking) and the Hadoop-glob brace form (streaming /
# directory reads) must match or one ingest path reads files — e.g.
# half-written .tmp uploads — that another deliberately excludes.
JSONL_PATTERNS = ("*.jsonl", "*.jsonl.gz", "*.json", "*.json.gz")
JSONL_GLOB = "*.{" + ",".join(p[2:] for p in JSONL_PATTERNS) + "}"


def read_pages_jsonl(spark: SparkSession, paths) -> DataFrame:
    """Read JSONL pages files into the PAGES_SCHEMA shape, lazily.

    The schema is EXPLICIT — ``inferSchema`` on JSON is a full extra
    pass over 100 TB before any work starts — and parsing is
    PERMISSIVE: a corrupt line yields a null-field row instead of
    failing the split (same tolerance stance as the WARC reader; the
    filter's null-text handling absorbs them, and `url IS NULL AND
    text IS NULL` rows are dropped here as unusable). Compression is
    transparent by extension (.gz/.zst per Hadoop codecs). One task
    per file split; gzip files are unsplittable, which matches the
    published-corpus grain of ~100 MB-1 GB per file.
    """
    if isinstance(paths, str):
        paths = [paths]
    raw = spark.read.schema(PAGES_JSONL_WIRE_SCHEMA).json(list(paths))
    return pages_from_jsonl_raw(raw)


def read_pages_jsonl_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory/URI form of :func:`read_pages_jsonl` — Hadoop-FS aware
    (``s3a://``/``abfss://``/``gs://`` work like local paths, unlike a
    local-glob file listing), filtering to the shared JSONL_GLOB so
    temp/partial uploads are never read."""
    raw = (spark.read.schema(PAGES_JSONL_WIRE_SCHEMA)
           .option("pathGlobFilter", JSONL_GLOB).json(path))
    return pages_from_jsonl_raw(raw)


def pages_from_jsonl_raw(raw: DataFrame) -> DataFrame:
    """Wire-schema JSONL rows → PAGES_SCHEMA shape. Shared by the batch
    reader above and the streaming front-end (readStream.json with the
    same wire schema) so the two ingest paths can never drift."""
    from pyspark.sql import functions as F

    # field-level tolerance matches the line-level PERMISSIVE stance:
    # under Spark 4 ANSI a plain to_timestamp ABORTS the job on one
    # malformed timestamp, and unbase64 silently decodes non-base64
    # into garbage bytes — both map to NULL instead (try_ variants),
    # like every other malformed field in this reader.
    return (raw.where(F.col("url").isNotNull()
                      | F.col("text").isNotNull())
               .select(F.col("url"),
                       F.try_to_timestamp("warc_ts").alias("warc_ts"),
                       F.try_to_binary("html", F.lit("base64"))
                        .alias("html"),
                       F.col("text"), F.col("lang")))

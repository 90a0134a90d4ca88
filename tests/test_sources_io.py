"""sources/io.py: scheme-agnostic listing/metadata/read + conf mapping."""

from __future__ import annotations

import pytest

from datacanary_spark.sources import io as sio


def test_read_table_parquet_and_list(spark):
    df = sio.read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    assert df.count() > 0
    files = sio.list_parquet_files(spark, "/root/testdata/sf0.001")
    assert files and all(f.endswith(".parquet") for f in files)
    assert any("documents" in f for f in files)


def test_object_metadata(spark):
    files = sio.list_parquet_files(spark, "/root/testdata/sf0.001")
    meta = sio.object_metadata(spark, files[0])
    assert meta["size_bytes"] > 0 and not meta["is_dir"]
    assert meta["last_modified"].startswith("20")


def test_iceberg_gated(spark):
    # sandbox has no Iceberg runtime: must fail loudly, not mysteriously
    assert sio.iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        sio.read_table(spark, "iceberg:web.pages")


def test_object_store_conf_mapping():
    s3 = sio.object_store_conf("s3", {"access_key": "A", "secret_key": "B"})
    assert s3["spark.hadoop.fs.s3a.access.key"] == "A"
    az = sio.object_store_conf("azure", {"account": "acct", "account_key": "K"})
    assert any("acct.dfs.core.windows.net" in k for k in az)
    gcs = sio.object_store_conf("gcs", {"keyfile": "/k.json"})
    assert any("keyfile" in k for k in gcs)
    with pytest.raises(ValueError):
        sio.object_store_conf("ftp", {})


def test_snapshot_options_iceberg_only(spark):
    """snapshot_id / as_of_timestamp pin an Iceberg snapshot read; on a
    parquet path they are meaningless and must be rejected loudly."""
    import pytest

    from datacanary_spark.sources import io as sio

    with pytest.raises(ValueError, match="snapshot"):
        sio.read_table(spark, "/root/testdata/sf0.001/documents.parquet",
                       snapshot_id=123)
    # iceberg: source with snapshot options still hits the jar gate first
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        sio.read_table(spark, "iceberg:web.pages", snapshot_id=123)


def test_apply_store_conf_reaches_hadoop_config(spark):
    """Runtime spark.conf.set('spark.hadoop.*') never reaches the Hadoop
    configuration (round-2 review finding) — apply_store_conf must put
    the stripped key on the live hadoopConfiguration()."""
    from datacanary_spark.sources import io as sio

    conf = sio.object_store_conf("azure", {"account": "acct",
                                           "account_key": "SECRET"})
    sio.apply_store_conf(spark, conf)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get(
        "fs.azure.account.key.acct.dfs.core.windows.net") == "SECRET"


def test_bucketed_tables_join_and_agg_without_exchange(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    must sort-merge join with NO exchange on either side, and a
    groupBy on the bucket key must aggregate without an exchange —
    the co-located-join contract write_bucketed exists for. A plain
    parquet read of the same files (bucket metadata dropped) is the
    negative control."""
    from pyspark.sql import functions as F

    from datacanary_spark.sources import io as sio

    pages = spark.range(2000).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).alias("score"))
    metrics = spark.range(2000).select(
        F.concat(F.lit("https://h/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 3).alias("hits"))
    p_path, m_path = str(tmp_path / "pages"), str(tmp_path / "metrics")
    sio.write_bucketed(pages, "bt_pages", ["url"], 8, path=p_path)
    sio.write_bucketed(metrics, "bt_metrics", ["url"], 8, path=m_path)
    try:
        a = sio.read_bucketed(spark, "bt_pages")
        b = sio.read_bucketed(spark, "bt_metrics")
        # disable broadcast so the join strategy question is real
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "url")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # co-located: zero shuffles
            assert joined.count() == 2000

            agg = a.groupBy("url").agg(F.sum("score").alias("s"))
            aplan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in aplan  # bucket distribution reused

            # negative control: the bare parquet files lose bucketing
            raw = spark.read.parquet(p_path).join(
                spark.read.parquet(m_path), "url")
            rplan = raw._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" in rplan
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_pages")
        spark.sql("DROP TABLE IF EXISTS bt_metrics")


def test_write_text_atomic_roundtrip_and_overwrite(spark, tmp_path):
    from datacanary_spark.sources.io import read_text, write_text_atomic

    uri = str(tmp_path / "meta.json")
    write_text_atomic(spark, uri, '{"v": 1}')
    assert read_text(spark, uri) == '{"v": 1}'
    write_text_atomic(spark, uri, '{"v": 2}')
    assert read_text(spark, uri) == '{"v": 2}'
    # no temp sibling left behind
    leftovers = [p.name for p in tmp_path.iterdir()
                 if p.name.startswith("meta.json.tmp")]
    assert leftovers == []


def test_azure_conf_covers_both_endpoints():
    """abfs[s] auths against the DFS endpoint, legacy wasb[s] against
    the BLOB endpoint — one creds dict must unlock both schemes."""
    az = sio.object_store_conf("azure", {"account": "acct",
                                         "account_key": "K"})
    assert az["spark.hadoop.fs.azure.account.key"
              ".acct.dfs.core.windows.net"] == "K"
    assert az["spark.hadoop.fs.azure.account.key"
              ".acct.blob.core.windows.net"] == "K"
    # explicit endpoint_suffix (sovereign cloud) narrows to that endpoint
    sov = sio.object_store_conf("azure", {
        "account": "acct", "account_key": "K",
        "endpoint_suffix": "dfs.core.chinacloudapi.cn"})
    assert list(sov) == ["spark.hadoop.fs.azure.account.key"
                         ".acct.dfs.core.chinacloudapi.cn"]


def test_read_table_csv_and_json_reference_parity(spark, tmp_path):
    """analyse/check accept CSV/TSV/JSON files like the reference
    README claims (pandas-style inference); quoted newlines survive."""
    import gzip
    import json as _json

    from datacanary_spark.sources.io import read_table

    csv = tmp_path / "t.csv"
    csv.write_text('id,score,name\n1,2.5,"line1\nline2"\n2,3.5,plain\n')
    df = read_table(spark, str(csv))
    rows = {r["id"]: (r["score"], r["name"]) for r in df.collect()}
    assert rows[1] == (2.5, "line1\nline2")
    assert dict(df.dtypes)["id"] == "int"

    tsv = tmp_path / "t.tsv"
    tsv.write_text("a\tb\n1\tx\n")
    assert read_table(spark, str(tsv)).collect()[0]["b"] == "x"

    jf = tmp_path / "t.jsonl.gz"
    jf.write_bytes(gzip.compress(
        (_json.dumps({"k": 1, "v": "a"}) + "\n"
         + _json.dumps({"k": 2, "v": "b"}) + "\n").encode()))
    got = {r["k"]: r["v"] for r in read_table(spark, str(jf)).collect()}
    assert got == {1: "a", 2: "b"}

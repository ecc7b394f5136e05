"""Port of the reference's 5-stage end-to-end smoke suite
(reference test_pipeline.py:351-435): ingest -> files exist -> catalog ->
introspection -> queries through the executor harness, plus engine-level
assertions the reference can't make (partition pruning in the plan,
golden-value checks).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pytest

from data_pipeline_python_aws_cdk_spark import catalog
from data_pipeline_python_aws_cdk_spark.plans import QueryExecutor
from data_pipeline_python_aws_cdk_spark.sources import ingest_job
from data_pipeline_python_aws_cdk_spark.sources.rest import distributed_fetch
from tests.fixtures_users import USERS_FIXTURE

NOW = datetime(2026, 8, 13, 1, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    """Run ingestion once; downstream stages share the output."""
    root = tmp_path_factory.mktemp("lake")
    data_root = str(root / "raw-data")
    result = ingest_job(spark, data_root, records=USERS_FIXTURE, now=NOW)
    return {"root": root, "data_root": data_root, "result": result}


# Stage 1: ingestion runs and reports the contract (reference :351-357).
def test_stage1_ingest_response(pipeline):
    res = pipeline["result"]
    assert res["statusCode"] == 200
    assert res["records"] == 10
    assert res["location"] == pipeline["data_root"]


# Stage 2: partitioned files exist (reference :364-367 checks S3 keys).
def test_stage2_partitioned_layout(pipeline):
    part_dir = (
        f"{pipeline['data_root']}/year=2026/month=08/day=13"
    )
    import os

    assert os.path.isdir(part_dir), part_dir
    assert any(f.endswith(".parquet") for f in os.listdir(part_dir))


# Stage 3+4: catalog registration + introspection (reference :369-381).
def test_stage3_4_catalog(spark, pipeline):
    qualified = catalog.crawl(spark, pipeline["data_root"])
    tables = catalog.introspect(spark)
    assert "raw_data" in tables
    cols = tables["raw_data"]
    assert len(cols) == 19  # 16 data columns + 3 partition columns
    for expected in ("id", "email", "address_city", "extraction_timestamp", "year"):
        assert expected in cols
    assert spark.table(qualified).count() == 10


# Stage 5: the three smoke queries through the executor (reference :383-405),
# with result artifacts + metadata sidecars (reference :232-233,239-295).
def test_stage5_queries_via_executor(spark, pipeline):
    catalog.crawl(spark, pipeline["data_root"])
    ex = QueryExecutor(spark, str(pipeline["root"] / "results"))

    qid1 = ex.submit("SELECT COUNT(*) as record_count FROM data_pipeline_db.raw_data")
    s1 = ex.wait(qid1)
    assert s1.state == "SUCCEEDED"
    rows = ex.get_results(qid1)
    assert rows[0]["record_count"] == "10"

    qid2 = ex.submit(
        "SELECT address_city, COUNT(*) as user_count FROM data_pipeline_db.raw_data "
        "WHERE address_city IS NOT NULL GROUP BY address_city "
        "ORDER BY user_count DESC LIMIT 3"
    )
    rows2 = ex.get_results(qid2)
    assert rows2[0]["address_city"] == "Gwenborough"
    assert rows2[0]["user_count"] == "3"

    qid3 = ex.submit(
        "SELECT name, email, address_city FROM data_pipeline_db.raw_data LIMIT 5"
    )
    assert len(ex.get_results(qid3)) == 5

    # result artifacts: <id>.csv + .csv.metadata (reference :232-233)
    meta_path = pipeline["root"] / "results" / qid1 / f"{qid1}.csv.metadata"
    meta = json.loads(meta_path.read_text())
    assert meta["row_count"] == 1
    assert meta["columns"] == ["record_count"]

    # workgroup-metrics parity (reference data_pipeline_stack.py:160-161):
    # the sidecar and the status stats both carry the query's job-group
    # aggregates from the app status store.
    m2 = json.loads(
        (pipeline["root"] / "results" / qid2 / f"{qid2}.csv.metadata").read_text()
    )["metrics"]
    assert m2["jobs"] >= 1 and m2["tasks"] >= 1
    assert m2["input_records"] >= 10  # scanned the 10-row table
    assert m2["executor_run_time_ms"] >= 0
    assert ex.poll(qid2).stats["metrics"] == m2


def test_executor_failure_state(spark, pipeline):
    ex = QueryExecutor(spark, str(pipeline["root"] / "results2"))
    qid = ex.submit("SELECT * FROM nonexistent_table_xyz")
    status = ex.wait(qid)
    assert status.state == "FAILED"
    assert "nonexistent_table_xyz" in (status.error or "")


def test_retention_janitor(spark, pipeline):
    ex = QueryExecutor(spark, str(pipeline["root"] / "results3"))
    catalog.crawl(spark, pipeline["data_root"])
    qid = ex.submit("SELECT 1 AS one")
    assert ex.wait(qid).state == "SUCCEEDED"
    from datetime import timedelta

    future = datetime.now(timezone.utc) + timedelta(days=8)
    assert ex.cleanup_results(now=future) == 1
    with pytest.raises(KeyError):
        ex.poll(qid)


def test_janitor_sweeps_disk_from_fresh_process(spark, pipeline):
    """The cron janitor shape: a FRESH executor (empty in-memory state) must
    still remove expired artifacts written by an earlier process — the TTL
    sweep walks results_root on disk, aged via the metadata sidecar."""
    root = str(pipeline["root"] / "results4")
    ex1 = QueryExecutor(spark, root)
    qid = ex1.submit("SELECT 1 AS one")
    assert ex1.wait(qid).state == "SUCCEEDED"

    janitor = QueryExecutor(spark, root)  # simulates a new process
    from datetime import timedelta

    assert janitor.cleanup_results(now=datetime.now(timezone.utc)) == 0
    future = datetime.now(timezone.utc) + timedelta(days=8)
    assert janitor.cleanup_results(now=future) == 1
    import os

    assert not os.path.exists(os.path.join(root, qid))


def test_async_submit_observes_running(spark, pipeline):
    """The reference polling contract (test_pipeline.py:161-217): QUEUED/
    RUNNING are real, observable states while the query executes."""
    import time as _time

    spark.udf.register("graft_slow_identity", lambda x: _time.sleep(0.02) or x)
    ex = QueryExecutor(spark, str(pipeline["root"] / "results5"))
    qid = ex.submit("SELECT graft_slow_identity(id) AS v FROM range(64)")
    seen = set()
    for _ in range(2000):
        st = ex.poll(qid).state
        seen.add(st)
        if st in ("SUCCEEDED", "FAILED", "CANCELLED"):
            break
        _time.sleep(0.005)
    assert ex.wait(qid).state == "SUCCEEDED"
    assert "RUNNING" in seen or "QUEUED" in seen, seen
    assert ex.poll(qid).row_count == 64


def test_cancel_query(spark, pipeline):
    """stop_query_execution twin: a running query moves to CANCELLED and its
    job group is killed; results never materialize."""
    import time as _time

    spark.udf.register("graft_very_slow", lambda x: _time.sleep(0.25) or x)
    ex = QueryExecutor(spark, str(pipeline["root"] / "results6"))
    qid = ex.submit("SELECT graft_very_slow(id) AS v FROM range(256)")
    for _ in range(400):
        if ex.poll(qid).state == "RUNNING":
            break
        _time.sleep(0.005)
    st = ex.cancel(qid)
    assert st.state == "CANCELLED"
    try:
        ex.wait(qid, timeout=120)
    except Exception:
        pass
    assert ex.poll(qid).state == "CANCELLED"
    with pytest.raises(RuntimeError):
        ex.get_results(qid)


def test_partition_pruning_in_plan(spark, pipeline):
    """The reference's partition-projection query (sql:201-208) must prune
    directories: the scan's PartitionFilters must carry the predicate."""
    catalog.crawl(spark, pipeline["data_root"])
    df = spark.sql(
        "SELECT * FROM data_pipeline_db.raw_data "
        "WHERE year = '2026' AND month = '08' AND day = '13' LIMIT 100"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "year" in plan.split("PartitionFilters")[1][:300]
    assert df.count() == 10


def test_schema_drift_policy(spark):
    from pyspark.sql import types as T

    old = T.StructType([T.StructField("a", T.StringType()), T.StructField("b", T.LongType())])
    new = T.StructType([T.StructField("a", T.StringType()), T.StructField("c", T.DoubleType())])
    drift = catalog.diff_schemas(old, new)
    assert drift == {"added": ["c"], "removed": ["b"], "changed": []}


def test_distributed_fetch_plumbing(spark):
    """mapInPandas fetch path with an injected offline fetcher."""
    from tests.fixtures_users import USERS_FIXTURE

    def fake_fetch(url: str):
        return USERS_FIXTURE if url.endswith("/users") else []

    df = distributed_fetch(
        spark, ["https://x.test/users", "https://y.test/other"], fetch=fake_fetch
    )
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0].address.geo.lat == "10.1"


def test_distributed_fetch_error_routing(spark):
    """Failed endpoints surface as an explicit error column (raw), raise the
    job in default fail mode, and are droppable only by opting into skip."""
    import pytest

    from data_pipeline_python_aws_cdk_spark.sources.rest import distributed_fetch_raw
    from tests.fixtures_users import USERS_FIXTURE

    def flaky_fetch(url: str):
        if url.endswith("/down"):
            raise ConnectionError("boom")
        return USERS_FIXTURE

    urls = ["https://x.test/users", "https://y.test/down"]

    raw = {r.url: r for r in distributed_fetch_raw(spark, urls, fetch=flaky_fetch).collect()}
    assert raw["https://y.test/down"].error == "ConnectionError: boom"
    assert raw["https://y.test/down"].body is None
    assert raw["https://x.test/users"].error is None

    with pytest.raises(Exception, match="fetch failed for https://y.test/down"):
        distributed_fetch(spark, urls, fetch=flaky_fetch).collect()

    skipped = distributed_fetch(spark, urls, fetch=flaky_fetch, on_error="skip")
    assert skipped.count() == 10


def test_object_store_conf_and_uri_wiring(spark, tmp_path):
    """s3a readiness (reference S7): committer confs are well-formed, the
    fs.s3a.* Hadoop confs round-trip onto a live session, and the ingest
    writer accepts scheme-qualified URIs (file:// exercises the same Hadoop
    FileSystem resolution an s3a:// root takes — no S3 in this container)."""
    from data_pipeline_python_aws_cdk_spark.sources.objectstore import (
        S3A_COMMITTER_CONFS,
        configure_s3a,
        is_object_store_path,
    )

    assert S3A_COMMITTER_CONFS["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert "PathOutputCommitProtocol" in S3A_COMMITTER_CONFS["spark.sql.sources.commitProtocolClass"]

    applied = configure_s3a(spark, endpoint="http://minio.test:9000", path_style_access=True)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        assert hconf.get(k) == v
    assert hconf.get("fs.s3a.endpoint") == "http://minio.test:9000"

    assert is_object_store_path("s3a://bucket/raw-data")
    assert not is_object_store_path(str(tmp_path))

    uri_root = f"file://{tmp_path}/uri-lake"
    res = ingest_job(spark, uri_root, records=USERS_FIXTURE, now=NOW)
    assert res["statusCode"] == 200 and res["records"] == 10
    back = spark.read.parquet(uri_root)
    assert back.count() == 10
    assert {"year", "month", "day"} <= set(back.columns)


def test_csv_fidelity_mode(spark, tmp_path):
    """The reference stores headered CSV; fidelity mode round-trips it."""
    root = str(tmp_path / "csv-lake")
    res = ingest_job(spark, root, records=USERS_FIXTURE, fmt="csv", now=NOW)
    assert res["statusCode"] == 200
    back = spark.read.option("header", True).csv(root)
    assert back.count() == 10
    assert "extraction_timestamp" in back.columns


def test_ingest_error_contract(spark, tmp_path):
    """Fetch failures -> 500 'Error fetching data' (reference :91-96)."""
    res = ingest_job(
        spark,
        str(tmp_path / "nope"),
        source_url="http://127.0.0.1:1/unreachable",
    )
    assert res["statusCode"] == 500
    assert "Error fetching data" in res["body"]

def test_http_json_datasource_partitions_and_flatten(spark, tmp_path):
    """Spark 4 Python Data Source: one input partition per endpoint,
    records land as JSON strings, and the typed flatten path (from_json +
    flatten_users) produces the reference's 15-column shape."""
    import json as _json

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.sources.rest import (
        flatten_users,
        read_http_json,
        users_schema,
    )
    from tests.fixtures_users import USERS_FIXTURE

    half = len(USERS_FIXTURE) // 2
    for i, chunk in enumerate([USERS_FIXTURE[:half], USERS_FIXTURE[half:]]):
        (tmp_path / f"u{i}.json").write_text(_json.dumps(chunk))
    urls = [f"file://{tmp_path}/u{i}.json" for i in range(2)]

    raw = read_http_json(spark, urls)
    assert raw.rdd.getNumPartitions() == 2  # endpoint-parallel
    typed = raw.select(
        F.from_json("value", users_schema()).alias("u")
    ).select("u.*")
    flat = flatten_users(typed)
    rows = flat.collect()
    assert len(rows) == len(USERS_FIXTURE)
    assert len(flat.columns) == 15
    by_id = {r.id: r for r in rows}
    src = {u["id"]: u for u in USERS_FIXTURE}
    some = next(iter(src))
    assert by_id[some].address_city == src[some]["address"]["city"]


def test_catalog_survives_session_temp_views(spark, tmp_path):
    """listTables(db) also returns session TEMP views, whose db-qualified
    names do not resolve — introspect must skip them and crawl must not
    mistake one for the persistent table (both crashed before)."""
    from data_pipeline_python_aws_cdk_spark import catalog

    lake = str(tmp_path / "lake")
    spark.range(5).selectExpr("id", "cast(id as string) as v").write.parquet(lake)
    spark.range(1).createOrReplaceTempView("tv_smoke_probe")
    try:
        qualified = catalog.crawl(
            spark, lake, database="tvdb", table="tv_smoke_probe"
        )  # same name as the temp view: must still register the real table
        assert spark.table(qualified).count() == 5
        cols = catalog.introspect(spark, "tvdb")
        assert cols["tv_smoke_probe"] == ["id", "v"]
        # re-crawl with zero drift is a no-op (stats preserved), not a
        # drop/recreate
        assert catalog.crawl(spark, lake, database="tvdb", table="tv_smoke_probe") == qualified
    finally:
        spark.catalog.dropTempView("tv_smoke_probe")
        spark.sql("DROP TABLE IF EXISTS tvdb.tv_smoke_probe")
        spark.sql("DROP DATABASE IF EXISTS tvdb")


def test_result_reuse_by_age(spark, tmp_path):
    """Athena result-reuse parity: re-submitting the SAME SQL within the
    reuse window completes instantly against the prior artifact with a
    NEW query id; outside the window (or without opting in) it re-runs."""
    from data_pipeline_python_aws_cdk_spark.plans.executor import QueryExecutor

    with QueryExecutor(spark, str(tmp_path / "results")) as ex:
        sql = "SELECT 1 AS one"
        q1 = ex.submit(sql)
        st1 = ex.wait(q1)
        assert st1.state == "SUCCEEDED"

        q2 = ex.submit(sql, reuse_max_age_seconds=3600)
        st2 = ex.poll(q2)  # no wait needed: reuse completes at submit time
        assert q2 != q1
        assert st2.state == "SUCCEEDED"
        assert st2.output_location == st1.output_location
        assert st2.stats["reused_from"] == q1
        assert st2.row_count == st1.row_count

        # no opt-in -> fresh execution with its own artifact
        q3 = ex.submit(sql)
        st3 = ex.wait(q3)
        assert st3.state == "SUCCEEDED"
        assert st3.output_location != st1.output_location
        assert "reused_from" not in st3.stats

        # zero-width window -> the prior result is too old by definition
        q4 = ex.submit(sql, reuse_max_age_seconds=0)
        st4 = ex.wait(q4)
        assert st4.state == "SUCCEEDED"
        assert "reused_from" not in st4.stats


def test_orc_and_json_lake_formats_round_trip(spark, tmp_path):
    """ORC (Hive/Trino-leaning downstreams) and JSON-lines (log interop)
    write through the same Hive-partitioned layout and register through the
    same crawler path as parquet/csv — one writer, four at-rest formats."""
    from data_pipeline_python_aws_cdk_spark.catalog import crawl

    for fmt in ("orc", "json"):
        root = str(tmp_path / f"{fmt}-lake")
        res = ingest_job(spark, root, records=USERS_FIXTURE, fmt=fmt, now=NOW)
        assert res["statusCode"] == 200
        back = spark.read.format(fmt).load(root)
        assert back.count() == 10
        assert "extraction_timestamp" in back.columns
        qualified = crawl(
            spark, root, database="fmt_rt_db", table=f"raw_{fmt}", fmt=fmt
        )
        n = spark.sql(f"SELECT COUNT(*) AS n FROM {qualified}").first().n
        assert n == 10
        spark.sql(f"DROP TABLE {qualified}")

"""Scheduler-facing CLI: each subcommand is what external cron invokes."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from data_pipeline_python_aws_cdk_spark import jobs
from tests.fixtures_users import USERS_FIXTURE


def test_cli_ingest_crawl_query_roundtrip(spark, tmp_path, capsys):
    fixture = tmp_path / "users.json"
    fixture.write_text(json.dumps(USERS_FIXTURE))
    lake = str(tmp_path / "raw-data")

    rc = jobs.main(["ingest", "--output", lake, "--fixture", str(fixture)])
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out1["statusCode"] == 200 and out1["records"] == 10

    rc = jobs.main(["crawl", "--path", lake])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out2["rows"] == 10

    rc = jobs.main(
        [
            "query",
            "--sql",
            "SELECT COUNT(*) AS n FROM data_pipeline_db.raw_data",
            "--results",
            str(tmp_path / "results"),
        ]
    )
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out3["state"] == "SUCCEEDED" and out3["rows"] == 1

    rc = jobs.main(["janitor", "--results", str(tmp_path / "results")])
    out4 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out4["removed"] == 0  # nothing old enough yet


def test_cli_query_failure_exit_code(spark, tmp_path, capsys):
    rc = jobs.main(
        ["query", "--sql", "SELECT * FROM missing_tbl", "--results", str(tmp_path / "r")]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and out["state"] == "FAILED"


def test_compaction_job(spark, tmp_path, capsys):
    """Small-file maintenance: many per-run fragments -> one target-size
    file per leaf, in place, idempotent, rows preserved."""
    import glob
    from datetime import datetime, timezone

    from data_pipeline_python_aws_cdk_spark.sources import ingest_job

    lake = str(tmp_path / "lake")
    now = datetime(2026, 8, 13, tzinfo=timezone.utc)
    for _ in range(3):  # three daily-style runs -> multiple small files
        ingest_job(spark, lake, records=USERS_FIXTURE, now=now)
    pattern = f"{lake}/year=*/month=*/day=*/*.parquet"
    assert len(glob.glob(pattern)) >= 3
    before = sorted(
        tuple(r) for r in spark.read.parquet(lake).select("id", "email", "year").collect()
    )

    rc = jobs.main(["compact", "--path", lake])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["partitions_compacted"] == 1
    assert out["files_before"] >= 3 and out["files_after"] == 1
    assert len(glob.glob(pattern)) == 1

    after = sorted(
        tuple(r) for r in spark.read.parquet(lake).select("id", "email", "year").collect()
    )
    assert before == after  # same rows, partition column still readable

    rc = jobs.main(["compact", "--path", lake])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out2["partitions_compacted"] == 0  # idempotent


def test_upsert_last_writer_wins_partition_pruned(spark, tmp_path):
    import os

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.maintenance import upsert

    base = spark.createDataFrame(
        [(1, "a", 1, "d1"), (2, "b", 1, "d1"), (3, "c", 1, "d2")],
        "id long, val string, version int, day string",
    )
    path = str(tmp_path / "ds")
    base.write.partitionBy("day").parquet(path)
    d2_files_before = set(os.listdir(f"{path}/day=d2"))

    updates = spark.createDataFrame(
        [(1, "a2", 2, "d1"), (4, "d", 1, "d1")],
        "id long, val string, version int, day string",
    )
    stats = upsert(spark, path, updates, key_cols=["id"], version_col="version",
                   partition_cols=["day"])
    assert (stats["mode"], stats["partitions_rewritten"]) == ("partitioned", 1)

    got = {(r.id, r.val, r.version) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a2", 2), (2, "b", 1), (3, "c", 1), (4, "d", 1)}
    # untouched partition's files were not rewritten
    assert set(os.listdir(f"{path}/day=d2")) == d2_files_before

    # idempotent: re-applying the same updates changes nothing
    upsert(spark, path, updates, key_cols=["id"], version_col="version",
           partition_cols=["day"])
    again = {(r.id, r.val, r.version) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_upsert_versioned_retention_recover_then_vacuum(spark, tmp_path):
    """Reference bucket parity (data_pipeline_stack.py:30-36: versioning on,
    noncurrent versions expire after 30 days): a partition replaced by an
    upsert is (a) invisible to readers, (b) recoverable from the .versions
    snapshot, and (c) gone for good after the janitor's vacuum passes the
    retention window."""
    import os
    import shutil
    from datetime import datetime, timedelta, timezone

    from data_pipeline_python_aws_cdk_spark.maintenance import (
        VERSIONS_DIR,
        upsert,
        vacuum_versions,
    )

    base = spark.createDataFrame(
        [(1, "orig", 1, "d1"), (2, "keep", 1, "d2")],
        "id long, val string, version int, day string",
    )
    path = str(tmp_path / "ds_ver")
    base.write.partitionBy("day").parquet(path)

    updates = spark.createDataFrame(
        [(1, "bad-merge", 2, "d1")], "id long, val string, version int, day string"
    )
    stats = upsert(spark, path, updates, key_cols=["id"], version_col="version",
                   partition_cols=["day"])
    snap = stats["version_snapshot"]
    assert snap and os.path.isdir(os.path.join(snap, "day=d1"))

    # (a) readers see only current data — the dot-dir hides the snapshot
    got = {(r.id, r.val) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "bad-merge"), (2, "keep")}

    # (b) recovery = move the snapshot back over the bad partition
    shutil.rmtree(os.path.join(path, "day=d1"))
    shutil.move(os.path.join(snap, "day=d1"), os.path.join(path, "day=d1"))
    restored = {(r.id, r.val) for r in spark.read.parquet(path).collect()}
    assert restored == {(1, "orig"), (2, "keep")}

    # (c) a fresh upsert's snapshot survives a young vacuum, dies past TTL
    # (2 snapshot dirs on disk: the emptied first one + the fresh one)
    upsert(spark, path, updates, key_cols=["id"], version_col="version",
           partition_cols=["day"])
    assert vacuum_versions(path) == {"kept": 2, "removed": 0}
    future = datetime.now(timezone.utc) + timedelta(days=31)
    assert vacuum_versions(path, now=future) == {"kept": 0, "removed": 2}
    assert os.listdir(os.path.join(path, VERSIONS_DIR)) == []


def test_upsert_escaped_partition_values(spark, tmp_path):
    """Partition values Spark URL-escapes in directory names (':' → '%3A')
    must still be swapped in — the swap walks the written output rather than
    rebuilding f'{col}={value}' paths from Python values."""
    from data_pipeline_python_aws_cdk_spark.maintenance import upsert

    base = spark.createDataFrame(
        [(1, "a", 1, "2024:01"), (2, "b", 1, "2024 02")],
        "id long, val string, version int, day string",
    )
    path = str(tmp_path / "ds_esc")
    base.write.partitionBy("day").parquet(path)

    updates = spark.createDataFrame(
        [(1, "a2", 2, "2024:01"), (3, "c", 1, "2024 02")],
        "id long, val string, version int, day string",
    )
    stats = upsert(spark, path, updates, key_cols=["id"], version_col="version",
                   partition_cols=["day"])
    assert (stats["mode"], stats["partitions_rewritten"]) == ("partitioned", 2)

    got = {(r.id, r.val, r.version, r.day) for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "a2", 2, "2024:01"),
        (2, "b", 1, "2024 02"),
        (3, "c", 1, "2024 02"),
    }


def test_analyze_feeds_cost_based_optimizer(spark, tmp_path, capsys):
    """ANALYZE must land rowCount/sizeInBytes in the metastore and the
    CBO-enabled optimizer must see the exact cardinality."""
    import json as _json

    from data_pipeline_python_aws_cdk_spark import catalog, jobs

    lake = str(tmp_path / "lake")
    spark.range(0, 1000).selectExpr(
        "id", "id % 7 as grp", "cast(id % 3 as string) as part"
    ).write.partitionBy("part").parquet(lake)
    rc = jobs.main(
        ["analyze", "--path", lake, "--database", "cbo_db", "--table", "t1",
         "--columns", "id,grp"]
    )
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "1000 rows" in out["statistics"]
    old = spark.conf.get("spark.sql.cbo.enabled")
    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        st = spark.table("cbo_db.t1")._jdf.queryExecution().optimizedPlan().stats()
        assert st.rowCount().isDefined() and int(str(st.rowCount().get())) == 1000
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old)
        spark.sql("DROP TABLE IF EXISTS cbo_db.t1")
        spark.sql("DROP DATABASE IF EXISTS cbo_db")


def test_cluster_narrows_rowgroup_stats_for_skipping(spark, tmp_path):
    """Clustering must leave each output file/row-group with a narrow key
    range so a pushed equality filter skips almost everything; on the
    interleaved source, every row group covers every key."""
    import pyarrow.parquet as pq

    from data_pipeline_python_aws_cdk_spark import maintenance

    src, out = str(tmp_path / "src"), str(tmp_path / "clustered")
    spark.range(0, 200_000).selectExpr("id % 40 as k", "id as payload").write.parquet(src)

    maintenance.cluster(spark, src, ["k"], out, files_per_partition=8)

    def covering_rowgroups(root, key=7):
        import os

        cover = total = 0
        for f in os.listdir(root):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            kidx = md.schema.to_arrow_schema().get_field_index("k")
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(kidx).statistics
                total += 1
                if st.min <= key <= st.max:
                    cover += 1
        return cover, total

    c_src, t_src = covering_rowgroups(src)
    c_out, t_out = covering_rowgroups(out)
    assert c_src == t_src  # interleaved: no skipping possible
    assert c_out <= max(1, t_out // 4)  # clustered: key lives in few groups
    # same data, fewer rows decoded: results must agree
    a = spark.read.parquet(src).filter("k = 7").count()
    b = spark.read.parquet(out).filter("k = 7").count()
    assert a == b == 5000


def test_cli_pack_writes_bucketed_assignment_and_manifest(spark, tmp_path, capsys):
    import json as _json

    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "packed")
    rc = jobs.main(["pack", "--sf-dir", SF_SMOKE, "--output", out])
    assert rc == 0
    status = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert status["statusCode"] == 200
    assert status["train_tokens"] > 0
    # assignment is Hive-partitioned by bucket — one directory per shard
    buckets = [p.name for p in (tmp_path / "packed" / "assignment").iterdir()
               if p.name.startswith("bucket=")]
    assert buckets
    manifest = _json.loads(open(status["manifest"]).read())
    assert len(manifest) == status["buckets"]
    # assignment must round-trip through the partitioned layout AND agree
    # exactly with the manifest: same packing, bucket by bucket (a raw-
    # corpus assignment paired with a cleaned-survivor manifest would leak
    # val docs into training shards with counts that match nothing).
    back = spark.read.parquet(str(tmp_path / "packed" / "assignment"))
    assert set(["doc_id", "seq_id", "tok_start", "doc_tokens", "straddles", "bucket"]) <= set(back.columns)
    # partition columns read back as strings (type inference deliberately
    # off in the engine session) — cast for the comparison
    per_bucket = {
        r.bucket: (r.docs, r.tokens)
        for r in back.groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(F.count("*").alias("docs"), F.sum("doc_tokens").alias("tokens"))
        .collect()
    }
    assert per_bucket == {m["bucket"]: (m["docs"], m["tokens"]) for m in manifest}


def test_upsert_null_partition_preserves_base_rows(spark, tmp_path):
    """Updates touching the NULL partition must MERGE with the base rows in
    day=__HIVE_DEFAULT_PARTITION__, not replace them: a null-unsafe prune
    predicate excludes the base side and the directory swap then deletes
    every pre-existing key in that partition."""
    from data_pipeline_python_aws_cdk_spark.maintenance import upsert

    path = str(tmp_path / "tbl")
    schema = "k long, version long, v string, day string"
    spark.createDataFrame(
        [(1, 1, "keep-me", None), (2, 1, "old", None), (3, 1, "other-day", "d1")],
        schema,
    ).write.partitionBy("day").parquet(path)

    updates = spark.createDataFrame([(2, 2, "new", None)], schema)
    upsert(
        spark,
        path,
        updates,
        key_cols=["k"],
        version_col="version",
        partition_cols=["day"],
    )

    rows = {r.k: r for r in spark.read.parquet(path).collect()}
    assert set(rows) == {1, 2, 3}, "base row in the null partition was lost"
    assert rows[2].version == 2 and rows[2].v == "new"
    assert rows[1].v == "keep-me" and rows[3].v == "other-day"


def test_cli_index_build_and_probe(spark, tmp_path, capsys):
    import json

    from tests.conftest import SF_SMOKE

    for kind in ("ivf", "ivfpq", "ivfpq-residual", "lsh", "bm25", "winnow"):
        out = str(tmp_path / f"{kind}_index")
        rc = jobs.main(
            ["index", "--kind", kind, "--sf-dir", SF_SMOKE, "--output", out, "--probe"]
        )
        assert rc == 0
        st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert st["statusCode"] == 200 and st["kind"] == kind
        assert st["probe_rows"] > 0


def test_restore_version_round_trip_and_undo(spark, tmp_path, capsys):
    """restore_version is the API form of the recovery the versioned-upsert
    test performs by hand: bad merge -> restore (old rows back) -> the
    displaced bad state is itself retired, so restore is undoable too."""
    import json
    import os

    from data_pipeline_python_aws_cdk_spark.maintenance import (
        list_versions,
        restore_version,
        upsert,
    )

    base = spark.createDataFrame(
        [(1, "orig", 1, "d1"), (2, "keep", 1, "d2")],
        "id long, val string, version int, day string",
    )
    path = str(tmp_path / "ds_restore")
    base.write.partitionBy("day").parquet(path)
    updates = spark.createDataFrame(
        [(1, "bad-merge", 2, "d1")], "id long, val string, version int, day string"
    )
    upsert(spark, path, updates, key_cols=["id"], version_col="version",
           partition_cols=["day"])

    versions = list_versions(path)
    assert len(versions) == 1 and versions[0]["items"] == ["day=d1"]

    st = restore_version(path, versions[0]["snapshot"])
    assert st["restored"] == 1 and st["mode"] == "partitioned"
    got = {(r.id, r.val) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "orig"), (2, "keep")}
    # the displaced bad merge went into the undo snapshot
    assert os.path.isdir(os.path.join(st["undo_snapshot"], "day=d1"))

    # undoing the restore through the CLI (latest snapshot = undo snapshot)
    rc = jobs.main(["restore", "--path", path])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["statusCode"] == 200
    got = {(r.id, r.val) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "bad-merge"), (2, "keep")}


def test_cli_bpe_writes_merge_rules(spark, tmp_path, capsys):
    docs = tmp_path / "corpus"
    spark.createDataFrame(
        [(1, "low low lower", "en", "s", 1), (2, "lowest low new", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{docs}/documents.parquet")

    out = str(tmp_path / "bpe")
    rc = jobs.main(
        ["bpe", "--sf-dir", str(docs), "--output", out, "--merges", "3"]
    )
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200 and st["merges"] == 3

    persisted = json.loads(open(f"{out}/merges.json").read())
    # 'l o' leads: low x3 + lower + lowest
    assert [tuple(m) for m in persisted["merges"]][0] == ("l o", 5)
    assert persisted["vocab_size"] == st["vocab_size"]


def test_zorder_clusters_skip_on_both_dimensions(spark, tmp_path):
    """Lexicographic clustering serves only its leading key: a filter on
    the SECOND key still intersects every file's stat range. The Z-order
    rewrite must make narrow filters selective on both dimensions."""
    import os

    import pyarrow.parquet as pq

    from data_pipeline_python_aws_cdk_spark import maintenance

    src = str(tmp_path / "src")
    lex = str(tmp_path / "lex")
    zo = str(tmp_path / "zorder")
    # x cycles fast, y is a decorrelated permutation — in arrival order no
    # row group can skip on either column
    spark.range(0, 200_000).selectExpr(
        "id % 1000 AS x", "(id * 7919) % 1000 AS y", "id AS payload"
    ).write.parquet(src)

    maintenance.cluster(spark, src, ["x", "y"], lex, files_per_partition=16)
    maintenance.zorder_cluster(spark, src, ["x", "y"], zo, files=16)

    def covering(root, col, lo, hi):
        cover = total = 0
        for f in os.listdir(root):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            cidx = md.schema.to_arrow_schema().get_field_index(col)
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(cidx).statistics
                total += 1
                if st.min <= hi and lo <= st.max:
                    cover += 1
        return cover, total

    # leading-dim filter: both layouts skip
    cx_lex, t_lex = covering(lex, "x", 100, 120)
    cx_zo, t_zo = covering(zo, "x", 100, 120)
    assert cx_lex <= max(1, t_lex // 2)
    assert cx_zo <= max(1, t_zo // 2)
    # second-dim filter: lexicographic covers ~everything, z-order skips
    cy_lex, _ = covering(lex, "y", 100, 120)
    cy_zo, _ = covering(zo, "y", 100, 120)
    assert cy_lex >= t_lex * 3 // 4  # sorted-within-x: y spans everything
    assert cy_zo <= t_zo // 2
    assert cy_zo < cy_lex
    # layout change only: the data itself is intact on both filter axes
    for pred in ("x BETWEEN 100 AND 120", "y BETWEEN 100 AND 120"):
        a = spark.read.parquet(src).filter(pred).count()
        b = spark.read.parquet(zo).filter(pred).count()
        assert a == b > 0, pred


def test_cli_export_jsonl_shards_match_packing(spark, tmp_path, capsys):
    """The JSONL export must contain exactly the packed survivor set, one
    record per surviving doc, shard-partitioned by bucket, readable back
    as JSON with intact bodies."""
    import glob

    from data_pipeline_python_aws_cdk_spark.operators.text import (
        clean_survivor_packing,
    )

    out = str(tmp_path / "shards")
    rc = jobs.main(
        ["export", "--sf-dir", "/root/testdata/sf0.001", "--output", out]
    )
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200

    assign = clean_survivor_packing(spark, "/root/testdata/sf0.001")
    expected = {r.doc_id: r for r in assign.collect()}
    assert st["docs"] == len(expected) > 0
    assert st["tokens"] == sum(r.doc_tokens for r in expected.values())

    back = spark.read.json(f"{out}")
    got = {r.doc_id: r for r in back.collect()}
    assert set(got) == set(expected)
    some = next(iter(got))
    assert got[some].text and got[some].lang
    # bucket directories exist and every doc landed in its assigned bucket
    assert glob.glob(f"{out}/bucket=*/*.json")
    for doc_id, r in got.items():
        assert int(r.bucket) == expected[doc_id].bucket


def test_incremental_rollup_processes_only_new_partitions(spark, tmp_path):
    """Delta refresh: the second refresh must touch only the newly arrived
    partition (partition-pruned scan), the rollup must equal a full
    re-aggregation, and an unchanged re-run must be a no-op."""
    from data_pipeline_python_aws_cdk_spark.maintenance import incremental_rollup

    data = str(tmp_path / "events_lake")
    roll = str(tmp_path / "rollup")
    spark.createDataFrame(
        [("d1", "click", 1.0), ("d1", "click", 2.0), ("d1", "view", 3.0),
         ("d2", "click", 4.0)],
        "day string, event_type string, value double",
    ).write.partitionBy("day").parquet(data)

    st1 = incremental_rollup(spark, data, roll, "day", ["event_type"], "value")
    assert st1 == {"partitions_processed": 2, "partitions": ["d1", "d2"]}

    # nothing new -> no-op
    st2 = incremental_rollup(spark, data, roll, "day", ["event_type"], "value")
    assert st2["partitions_processed"] == 0

    # a third day arrives; only it is processed
    spark.createDataFrame(
        [("d3", "view", 5.0)], "day string, event_type string, value double"
    ).write.mode("append").partitionBy("day").parquet(data)
    st3 = incremental_rollup(spark, data, roll, "day", ["event_type"], "value")
    assert st3 == {"partitions_processed": 1, "partitions": ["d3"]}

    # the pruned delta scan really prunes: d3-only partition filters
    plan = (
        spark.read.parquet(data)
        .filter(F.col("day").isin(["d3"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "d3" in plan

    # rollup == full re-aggregation of everything
    got = {
        (r.day, r.event_type): (r.rows, r.sum_value)
        for r in spark.read.parquet(roll).collect()
    }
    assert got == {
        ("d1", "click"): (2, 3.0),
        ("d1", "view"): (1, 3.0),
        ("d2", "click"): (1, 4.0),
        ("d3", "view"): (1, 5.0),
    }


def test_cli_stream_incremental_upsert_drain(spark, tmp_path, capsys):
    """Scheduler-facing streaming ingest: each `jobs stream` invocation is a
    bounded availableNow drain that resumes from its checkpoint — new
    files merge by key, replays are no-ops."""
    src = tmp_path / "stream_src"
    src.mkdir()
    table = str(tmp_path / "stream_table")
    ckpt = str(tmp_path / "stream_ckpt")
    schema = "user_id long, version long, score double"
    spark.createDataFrame([(1, 1, 0.5), (2, 1, 0.7)], schema).coalesce(1)\
        .write.parquet(str(src / "b1"))

    args = ["stream", "--source", f"{src}/*", "--table", table,
            "--checkpoint", ckpt, "--keys", "user_id", "--version-col", "version"]
    rc = jobs.main(args)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["rows"] == 2

    # a revision + a new key arrive; the next cron tick merges them
    spark.createDataFrame([(1, 2, 9.9), (3, 1, 0.3)], schema).coalesce(1)\
        .write.parquet(str(src / "b2"))
    rc = jobs.main(args)
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st2["rows"] == 3
    rows = {r.user_id: r for r in spark.read.parquet(table).collect()}
    assert rows[1].version == 2 and rows[1].score == 9.9
    assert rows[3].version == 1

    # replay with nothing new: checkpoint makes it a no-op
    rc = jobs.main(args)
    st3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st3["rows"] == 3


def test_cli_inspect_reports_storage_health_and_compaction_effect(spark, tmp_path, capsys):
    """inspect must count files/rows/row-groups from footers only, and its
    small-file fraction must drop after compaction fixes fragmentation."""
    from datetime import datetime, timezone

    from data_pipeline_python_aws_cdk_spark.sources import ingest_job

    lake = str(tmp_path / "ins_lake")
    now = datetime(2026, 8, 13, tzinfo=timezone.utc)
    for _ in range(3):
        ingest_job(spark, lake, records=USERS_FIXTURE, now=now)

    rc = jobs.main(["inspect", "--path", lake])
    before = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and before["files"] >= 3 and before["rows"] == 30
    assert before["small_file_fraction"] == 1.0  # tiny daily drops

    jobs.main(["compact", "--path", lake])
    capsys.readouterr()
    rc = jobs.main(["inspect", "--path", lake])
    after = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and after["files"] == 1 and after["rows"] == 30
    assert after["row_groups"] >= 1 and after["total_bytes"] > 0


def test_cli_screen_flags_batch_against_persisted_index(spark, tmp_path, capsys):
    """The daily dedup screen: build the LSH index once, then screen the
    ingest batch; verdicts persist and the flagged count matches the
    inline dedup_incremental candidates."""
    idx = str(tmp_path / "lsh_idx")
    out = str(tmp_path / "verdicts")

    rc = jobs.main(
        ["index", "--kind", "lsh", "--sf-dir", "/root/testdata/sf0.001",
         "--output", idx]
    )
    assert rc == 0
    capsys.readouterr()

    rc = jobs.main(
        ["screen", "--index", idx, "--sf-dir", "/root/testdata/sf0.001",
         "--output", out]
    )
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["batch_docs"] > 0
    assert 0 <= st["flagged"] <= st["batch_docs"]

    persisted = spark.read.parquet(out)
    assert persisted.count() == st["batch_docs"]
    assert "near_candidates" in persisted.columns


def test_cli_retrieve_all_modes(spark, tmp_path, capsys):
    """`jobs retrieve` persists each retrieval mode's top-k table and the
    hybrid output carries the fusion audit flags."""
    import json

    from tests.conftest import SF_SMOKE

    for mode in ("bm25", "semantic", "hybrid"):
        out = str(tmp_path / f"ret_{mode}")
        rc = jobs.main(["retrieve", "--sf-dir", SF_SMOKE, "--output", out, "--mode", mode])
        assert rc == 0
        st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert st["statusCode"] == 200 and st["mode"] == mode and st["rows"] > 0
    hybrid = spark.read.parquet(str(tmp_path / "ret_hybrid"))
    assert {"in_lexical", "in_semantic", "rrf", "rank"} <= set(hybrid.columns)


def test_cli_mine_and_funnel(spark, tmp_path, capsys):
    """`jobs mine` persists the margin-mined pair table; `jobs funnel`
    prints the ordered rule ledger (and optionally persists it)."""
    import json

    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "mined")
    rc = jobs.main(["mine", "--sf-dir", SF_SMOKE, "--output", out])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mined_pairs"] > 0
    mined = spark.read.parquet(out)
    assert {"src_id", "tgt_id", "cosine", "margin"} <= set(mined.columns)
    # mutual-best: each src and each tgt appears at most once
    assert mined.count() == mined.select("src_id").distinct().count()
    assert mined.count() == mined.select("tgt_id").distinct().count()

    fout = str(tmp_path / "funnel")
    rc = jobs.main(["funnel", "--sf-dir", SF_SMOKE, "--output", fout])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    steps = st["steps"]
    assert [s["step"] for s in steps] == [1, 2, 3, 4, 5]
    # the funnel is monotone: docs_remaining never increases, and each
    # step's docs_in equals the previous step's docs_remaining
    for a, b in zip(steps, steps[1:]):
        assert b["docs_in"] == a["docs_remaining"]
        assert b["docs_remaining"] <= a["docs_remaining"]
    assert spark.read.parquet(fout).count() == 5


def test_cli_split_and_impact(spark, tmp_path, capsys):
    """`jobs split` prints the per-source split audit; `jobs impact`
    prints the per-source dedup cost ledger. Both optionally persist."""
    import json

    from tests.conftest import SF_SMOKE

    sout = str(tmp_path / "split_audit")
    rc = jobs.main(["split", "--sf-dir", SF_SMOKE, "--output", sout])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200
    splits = st["splits"]
    assert {s["split"] for s in splits} <= {"train", "valid", "test"}
    assert sum(s["n_docs"] for s in splits) > 0
    assert spark.read.parquet(sout).count() == len(splits)

    rc = jobs.main(["impact", "--sf-dir", SF_SMOKE])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200
    assert all(s["docs_dropped"] <= s["docs_total"] for s in st["sources"])


def test_cli_qscreen(spark, tmp_path, capsys):
    """`jobs qscreen` drains the document stream into a routed verdict
    table and prints the per-route tally."""
    import json

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "qsrc")
    load_table(spark, SF_SMOKE, "documents").filter(
        F.col("source") == "src0"
    ).write.parquet(src)
    out = str(tmp_path / "qout")
    ckpt = str(tmp_path / "qckpt_cli")
    rc = jobs.main(["qscreen", "--source", src, "--output", out, "--checkpoint", ckpt])
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["docs"] > 0
    assert set(st["routes"]) <= {"keep", "review", "drop"}
    assert spark.read.parquet(out).count() == st["docs"]


def test_cli_scd2_attribution_survivors(spark, tmp_path, capsys):
    sf = "/root/testdata/sf0.001"

    rc = jobs.main(["scd2", "--sf-dir", sf, "--output", str(tmp_path / "scd2")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["statusCode"] == 200
    assert out["rows"] > out["users"] > 0
    assert out["open_runs"] == out["users"]  # every user has exactly one open run

    rc = jobs.main(["attribution", "--sf-dir", sf])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["campaigns"] > 0
    # linear credit is 1000000-per-conversion minus integer-floor remainders
    assert 0 < out["linear_credit_micro"] <= out["touches"] * 1000000

    for policy in ("id", "quality"):
        rc = jobs.main(
            ["survivors", "--sf-dir", sf, "--policy", policy,
             "--output", str(tmp_path / f"surv_{policy}")]
        )
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["docs"] == out["kept"] + out["dropped"]
        assert out["kept"] > 0 and out["dropped"] > 0
    # both policies keep exactly one doc per cluster: same keep COUNT
    a = spark.read.parquet(str(tmp_path / "surv_id"))
    b = spark.read.parquet(str(tmp_path / "surv_quality"))
    assert a.filter("is_survivor").count() == b.filter("is_survivor").count()


def test_cli_bpe_encode_writes_id_sequences(spark, tmp_path, capsys):
    docs = tmp_path / "corpus_enc"
    spark.createDataFrame(
        [(1, "low low lower", "en", "s", 1), (2, "lowest low new", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{docs}/documents.parquet")

    out = str(tmp_path / "bpe_ids")
    rc = jobs.main(
        ["bpe-encode", "--sf-dir", str(docs), "--output", out, "--merges", "2"]
    )
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200 and st["docs"] == 2

    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2}
    # id sequences are non-empty, all positive, and length matches the count
    for r in rows.values():
        assert len(r.token_ids) == r.n_bpe_tokens > 0
        assert all(t >= 1 for t in r.token_ids)
    assert st["tokens"] == sum(r.n_bpe_tokens for r in rows.values())


def test_cli_substring_dedup_pipeline(spark, tmp_path, capsys):
    shared = " ".join(f"sh{i}" for i in range(20))
    docs = tmp_path / "sdd_corpus"
    spark.createDataFrame(
        [(1, " ".join(f"u{i}" for i in range(10)) + " " + shared, "en", "s", 1),
         (2, shared + " " + " ".join(f"x{i}" for i in range(12)), "en", "s", 1),
         (3, " ".join(f"nv{i}" for i in range(30)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{docs}/documents.parquet")

    out = str(tmp_path / "sdd_out")
    rc = jobs.main(["substring-dedup", "--sf-dir", str(docs), "--output", out])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200
    assert st["spans"] == 2 and st["docs_touched"] == 2
    # only the non-canonical copy's paragraph is removable
    assert st["removable_tokens"] == 20

    # all three artifacts readable; removal plan consistent with the summary
    assert spark.read.parquet(f"{out}/fingerprints").count() > 0
    assert spark.read.parquet(f"{out}/spans").count() == 2
    plan = {r.doc_id: r for r in spark.read.parquet(f"{out}/removal_plan").collect()}
    assert plan[1].removable_tokens == 0 and plan[2].removable_tokens == 20


def test_cli_substring_screen_routes_micro_batches(spark, tmp_path, capsys):
    standing_text = " ".join(f"st{i}" for i in range(30))
    standing = tmp_path / "sscr_standing"
    spark.createDataFrame(
        [(1, standing_text, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{standing}/documents.parquet")
    idx = str(tmp_path / "sscr_idx")
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        substring_index_build,
    )

    substring_index_build(spark, str(standing), idx)

    source = str(tmp_path / "sscr_incoming")
    spark.createDataFrame(
        [(100, standing_text, "en", "s", 1),
         (101, " ".join(f"nv{i}" for i in range(20)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(source)

    out = str(tmp_path / "sscr_out")
    rc = jobs.main([
        "substring-screen", "--source", source, "--index", idx,
        "--output", out, "--checkpoint", str(tmp_path / "sscr_ckpt"),
    ])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200
    assert st["docs"] == 2 and st["routes"] == {"dup": 1, "new": 1}


def test_cli_winnow_screen_routes_micro_batches(spark, tmp_path, capsys):
    standing_text = " ".join(f"st{i}" for i in range(30))
    standing = tmp_path / "wscr_standing"
    spark.createDataFrame(
        [(1, standing_text, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{standing}/documents.parquet")
    idx = str(tmp_path / "wscr_idx")
    from data_pipeline_python_aws_cdk_spark.operators.dedup import (
        winnow_index_build,
    )

    winnow_index_build(spark, str(standing), idx)

    source = str(tmp_path / "wscr_incoming")
    spark.createDataFrame(
        [(100, standing_text, "en", "s", 1),
         (101, " ".join(f"nv{i}" for i in range(20)), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(source)

    out = str(tmp_path / "wscr_out")
    rc = jobs.main([
        "winnow-screen", "--source", source, "--index", idx,
        "--output", out, "--checkpoint", str(tmp_path / "wscr_ckpt"),
    ])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200
    assert st["docs"] == 2 and st["routes"] == {"near_dup_candidate": 1, "new": 1}


def test_cli_index_append_maintains_ivfpq_and_pq(spark, tmp_path, capsys):
    """jobs index --append: the CLI incremental-maintenance surface — a
    base build plus an appended batch parquet equals the full build, for
    both a partitioned kind (ivfpq: touched-lists rewrite) and the
    unpartitioned kind (pq: staged full-table swap)."""
    import json

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    e = similarity.load_table(spark, SF_SMOKE, "embeddings")
    batch_path = str(tmp_path / "batch")
    e.filter(F.col("vec_id") >= 400).write.parquet(batch_path)
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    similarity.ivfpq_build_index(spark, SF_SMOKE, full)
    similarity.ivfpq_build_index(
        spark, SF_SMOKE, inc, vectors=e.filter(F.col("vec_id") < 400)
    )
    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", inc,
         "--append", batch_path, "--probe"]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mode"] == "append"
    assert st["probe_rows"] > 0
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(p).select("vec_id", "pq_code").collect()
    )
    assert rows(inc) == rows(full)

    # the unpartitioned kind's own append path: base + batch == full
    pq_full, pq_inc = str(tmp_path / "pq_full"), str(tmp_path / "pq_inc")
    similarity.pq_build_index(spark, SF_SMOKE, pq_full)
    similarity.pq_build_index(
        spark, SF_SMOKE, pq_inc, vectors=e.filter(F.col("vec_id") < 400)
    )
    rc = jobs.main(
        ["index", "--kind", "pq", "--sf-dir", SF_SMOKE, "--output", pq_inc,
         "--append", batch_path, "--probe"]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mode"] == "append"
    assert st["probe_rows"] > 0
    assert rows(pq_inc) == rows(pq_full)


def test_cli_index_compact_and_report(spark, tmp_path, capsys):
    """jobs index --compact / --report: the maintenance surface — the
    report flags the post-append fragmentation, compaction clears it with
    the probe still live, and the after-report reads clean."""
    import json

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    e = similarity.load_table(spark, SF_SMOKE, "embeddings")
    idx = str(tmp_path / "idx")
    similarity.ivfpq_build_index(
        spark, SF_SMOKE, idx, vectors=e.filter(F.col("vec_id") < 400)
    )
    similarity.ivfpq_append_index(spark, idx, e.filter(F.col("vec_id") >= 400))
    similarity._fragment_index(spark, idx)
    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", idx,
         "--report"]
    )
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["statusCode"] == 200 and rep["complete"]
    assert rep["fragmented_partitions"] > 0
    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", idx,
         "--compact", "--probe"]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mode"] == "compact"
    assert st["partitions_compacted"] > 0 and st["probe_rows"] > 0
    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", idx,
         "--report"]
    )
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["fragmented_partitions"] == 0

    # the unpartitioned kind reports/maintains through the same surface:
    # one root leaf, complete, and the staged swap keeps it compact so
    # scheduled maintenance stays on its read-only path
    pq_idx = str(tmp_path / "pq_idx")
    similarity.pq_build_index(
        spark, SF_SMOKE, pq_idx, vectors=e.filter(F.col("vec_id") < 400)
    )
    similarity.pq_append_index(spark, pq_idx, e.filter(F.col("vec_id") >= 400))
    rc = jobs.main(
        ["index", "--kind", "pq", "--sf-dir", SF_SMOKE, "--output", pq_idx,
         "--report"]
    )
    assert rc == 0
    prep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prep["statusCode"] == 200 and prep["complete"]
    assert prep["n_partitions"] == 1 and prep["partitions"][0]["partition"] == ""
    assert prep["total_rows"] == e.count()
    rc = jobs.main(
        ["index", "--kind", "pq", "--sf-dir", SF_SMOKE, "--output", pq_idx,
         "--maintain"]
    )
    assert rc == 0
    mst = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert mst["statusCode"] == 200 and mst["mode"] == "maintain"
    assert mst["complete"] and mst["fragmented_after"] == 0
    assert rep2["total_rows"] == rep["total_rows"]


def test_cli_retrieve_indexed_serves_from_persisted_indexes(spark, tmp_path, capsys):
    """jobs retrieve --bm25-index/--ann-index: the deployed two-tower
    serving surface — result table equals the inline hybrid run."""
    import json

    from data_pipeline_python_aws_cdk_spark.operators import similarity, text
    from tests.conftest import SF_SMOKE

    bm25_dir, ann_dir = str(tmp_path / "bm25"), str(tmp_path / "ivf")
    text.bm25_build_index(spark, SF_SMOKE, bm25_dir)
    similarity.ivf_build_index(spark, SF_SMOKE, ann_dir)
    out_idx, out_inline = str(tmp_path / "ridx"), str(tmp_path / "rinl")
    rc = jobs.main(
        ["retrieve", "--sf-dir", SF_SMOKE, "--output", out_idx,
         "--bm25-index", bm25_dir, "--ann-index", ann_dir]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["rows"] > 0
    rc = jobs.main(["retrieve", "--sf-dir", SF_SMOKE, "--output", out_inline])
    assert rc == 0
    capsys.readouterr()
    a = {tuple(r) for r in spark.read.parquet(out_idx).collect()}
    b = {tuple(r) for r in spark.read.parquet(out_inline).collect()}
    assert a == b

    rc = jobs.main(
        ["retrieve", "--sf-dir", SF_SMOKE, "--output", out_idx,
         "--bm25-index", bm25_dir]
    )
    assert rc == 1
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 400


def test_cli_index_append_winnow_and_substring_kinds(spark, tmp_path, capsys):
    """jobs index --kind winnow/substring --append: the fingerprint side
    of the CLI maintenance surface — appended artifacts probe-equal to
    full builds."""
    import json

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.operators import dedup
    from tests.conftest import SF_SMOKE

    d = dedup.load_table(spark, SF_SMOKE, "documents")
    batch_path = str(tmp_path / "batch")
    d.filter(F.col("doc_id") >= 400).write.parquet(batch_path)
    for kind, build, probe in (
        ("winnow", dedup.winnow_index_build, dedup.dedup_winnowing_indexed),
        (
            "substring",
            dedup.substring_index_build,
            dedup.exact_substring_dedup_indexed,
        ),
    ):
        full, inc = str(tmp_path / f"{kind}_full"), str(tmp_path / f"{kind}_inc")
        build(spark, SF_SMOKE, full)
        build(spark, SF_SMOKE, inc, docs=d.filter(F.col("doc_id") < 400))
        rc = jobs.main(
            ["index", "--kind", kind, "--sf-dir", SF_SMOKE, "--output", inc,
             "--append", batch_path, "--probe"]
        )
        assert rc == 0
        st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert st["statusCode"] == 200 and st["mode"] == "append"
        pf = {tuple(r) for r in probe(spark, full).collect()}
        pi = {tuple(r) for r in probe(spark, inc).collect()}
        assert pi == pf and len(pi) > 0


def test_cli_ann_screen_routes_and_appends(spark, tmp_path, capsys):
    """jobs ann-screen: the deployed embedding ingest surface — verdicts
    per arriving vector against the persisted IVF index, with --append
    folding the new vectors back in."""
    import json

    from data_pipeline_python_aws_cdk_spark.operators.similarity import (
        ivf_build_index,
    )

    def one_hot(i):
        return [1.0 if j == i else 0.0 for j in range(64)]

    corpus = spark.createDataFrame(
        [(i, one_hot(i)) for i in range(32)],
        "vec_id long, embedding array<float>",
    )
    idx = str(tmp_path / "ivf_idx")
    ivf_build_index(spark, str(tmp_path), idx, vectors=corpus)
    vecs = str(tmp_path / "arrivals")
    spark.createDataFrame(
        [(100, one_hot(20)), (101, one_hot(50))],
        "vec_id long, embedding array<float>",
    ).write.parquet(vecs)
    out = str(tmp_path / "verdicts")
    rc = jobs.main([
        "ann-screen", "--source", vecs, "--index", idx,
        "--output", out, "--checkpoint", str(tmp_path / "ckpt"),
        "--append",
    ])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["statusCode"] == 200
    assert st["vectors"] == 2 and st["appended"] is True
    assert st["routes"] == {"near_dup_candidate": 1, "new": 1}
    assert spark.read.parquet(idx).count() == 33


def test_cli_index_delete_covers_partitioned_and_unpartitioned(
    spark, tmp_path, capsys
):
    """jobs index --delete: the right-to-be-forgotten CLI surface — the
    removed rows are gone from the probe's world for both a partitioned
    kind (ivfpq) and the unpartitioned pq code table."""
    import json

    import pyspark.sql.functions as F

    from data_pipeline_python_aws_cdk_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    e = similarity.load_table(spark, SF_SMOKE, "embeddings")
    ids_path = str(tmp_path / "delete_ids")
    e.filter(F.col("vec_id") >= 400).select("vec_id").write.parquet(ids_path)
    idx, base_idx = str(tmp_path / "idx"), str(tmp_path / "base_idx")
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx)
    similarity.ivfpq_build_index(
        spark, SF_SMOKE, base_idx, vectors=e.filter(F.col("vec_id") < 400)
    )
    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", idx,
         "--delete", ids_path, "--probe"]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mode"] == "delete"
    assert st["removed_rows"] > 0 and st["probe_rows"] > 0
    rows = lambda p: sorted(  # noqa: E731
        tuple(r) for r in spark.read.parquet(p).select("vec_id", "pq_code").collect()
    )
    assert rows(idx) == rows(base_idx)

    # the unpartitioned kind: delete(tail) == rebuild-without via the CLI
    pq_idx, pq_base = str(tmp_path / "pq_idx"), str(tmp_path / "pq_base")
    similarity.pq_build_index(spark, SF_SMOKE, pq_idx)
    similarity.pq_build_index(
        spark, SF_SMOKE, pq_base, vectors=e.filter(F.col("vec_id") < 400)
    )
    rc = jobs.main(
        ["index", "--kind", "pq", "--sf-dir", SF_SMOKE, "--output", pq_idx,
         "--delete", ids_path, "--probe"]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mode"] == "delete"
    assert st["removed_rows"] > 0 and st["probe_rows"] > 0
    assert rows(pq_idx) == rows(pq_base)


def test_cli_index_maintain_compacts_only_when_fragmented(
    spark, tmp_path, capsys
):
    """jobs index --maintain: the cron-safe composition — a fragmented
    artifact gets compacted (rows preserved), and the immediate re-run
    is read-only (no compaction stats, nothing rewritten)."""
    import json

    from data_pipeline_python_aws_cdk_spark.operators import similarity
    from tests.conftest import SF_SMOKE

    idx = str(tmp_path / "idx")
    similarity.ivfpq_build_index(spark, SF_SMOKE, idx)
    similarity._fragment_index(spark, idx)
    total = spark.read.parquet(idx).count()
    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", idx,
         "--maintain"]
    )
    assert rc == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["statusCode"] == 200 and st["mode"] == "maintain"
    assert st["fragmented_before"] > 0 and st["fragmented_after"] == 0
    assert st["compacted"]["partitions_compacted"] > 0
    assert st["total_rows"] == total and st["complete"]

    rc = jobs.main(
        ["index", "--kind", "ivfpq", "--sf-dir", SF_SMOKE, "--output", idx,
         "--maintain"]
    )
    assert rc == 0
    st2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st2["compacted"] is None and st2["fragmented_before"] == 0
    assert st2["total_rows"] == total

"""External-scheduler entry points (the reference's EventBridge role).

The reference schedules ingestion at 01:00 UTC and cataloging at 02:00 UTC
via EventBridge cron -> Lambda / Glue (reference
data_pipeline/data_pipeline_stack.py:166-186,116-118). Per BASELINE.json the
engine keeps orchestration external: any cron/Airflow/Dagster invokes these
subcommands:

    python -m data_pipeline_python_aws_cdk_spark.jobs ingest --output /lake/raw-data
    python -m data_pipeline_python_aws_cdk_spark.jobs crawl  --path /lake/raw-data
    python -m data_pipeline_python_aws_cdk_spark.jobs query  --sql "SELECT ..." --results /lake/results
    python -m data_pipeline_python_aws_cdk_spark.jobs janitor --results /lake/results
    python -m data_pipeline_python_aws_cdk_spark.jobs compact --path /lake/raw-data

Each prints a single JSON status line (the Lambda response contract) and
exits nonzero on failure.
"""

from __future__ import annotations

import argparse
import json
import sys

from .catalog import crawl
from .maintenance import DEFAULT_TARGET_FILE_BYTES, compact
from .plans import QueryExecutor
from .session import get_spark
from .sources import ingest_job


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="data-pipeline-spark-jobs")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ingest = sub.add_parser("ingest", help="fetch + flatten + partitioned write")
    p_ingest.add_argument("--output", required=True)
    p_ingest.add_argument("--url", default=None)
    p_ingest.add_argument("--fixture", default=None, help="JSON file of records (offline mode)")
    p_ingest.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "orc", "json"]
    )

    p_crawl = sub.add_parser("crawl", help="infer schema + register catalog table")
    p_crawl.add_argument("--path", required=True)
    p_crawl.add_argument("--database", default="data_pipeline_db")
    p_crawl.add_argument("--table", default="raw_data")
    p_crawl.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "orc", "json"]
    )

    p_query = sub.add_parser("query", help="run SQL through the executor harness")
    p_query.add_argument("--sql", required=True)
    p_query.add_argument("--results", required=True)
    p_query.add_argument("--crawl-path", default=None, help="register this path first")

    p_jan = sub.add_parser("janitor", help="expire result artifacts past retention")
    p_jan.add_argument("--results", required=True)
    p_jan.add_argument("--retention-days", type=int, default=7)
    p_jan.add_argument(
        "--data-path",
        default=None,
        help="also vacuum upsert version snapshots under this dataset root",
    )
    p_jan.add_argument(
        "--version-retention-days",
        type=int,
        default=30,  # reference data_pipeline_stack.py:30-36
        help="age after which noncurrent partition versions expire",
    )

    p_comp = sub.add_parser("compact", help="rewrite small files into target-size files")
    p_comp.add_argument("--path", required=True)
    p_comp.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "orc", "json"]
    )
    p_comp.add_argument("--target-file-bytes", type=int, default=DEFAULT_TARGET_FILE_BYTES)

    p_bkt = sub.add_parser(
        "bucketize", help="prepay the fact-fact join shuffle via bucketed tables"
    )
    p_bkt.add_argument("--sf-dir", required=True)
    p_bkt.add_argument("--location", required=True)
    p_bkt.add_argument("--buckets", type=int, default=None)

    p_cl = sub.add_parser(
        "cluster", help="range-cluster a dataset by key for row-group skipping"
    )
    p_cl.add_argument("--path", required=True)
    p_cl.add_argument("--out", required=True)
    p_cl.add_argument("--by", required=True, help="comma-separated cluster keys")
    p_cl.add_argument("--files", type=int, default=8)
    p_cl.add_argument(
        "--zorder",
        action="store_true",
        help="Morton-interleave the keys (multi-column skipping) instead of "
        "lexicographic range clustering",
    )

    p_an = sub.add_parser(
        "analyze", help="collect table/column statistics for the cost-based optimizer"
    )
    p_an.add_argument("--path", default=None, help="crawl this path first")
    p_an.add_argument("--database", default="data_pipeline_db")
    p_an.add_argument("--table", default="raw_data")
    p_an.add_argument("--columns", default="", help="comma-separated column stats")

    p_pack = sub.add_parser(
        "pack", help="pack documents into token-budget training sequences"
    )
    p_pack.add_argument("--sf-dir", required=True, help="testdata directory")
    p_pack.add_argument("--output", required=True, help="output directory")

    p_idx = sub.add_parser(
        "index", help="build (and optionally probe) a persisted ANN/LSH index"
    )
    p_idx.add_argument(
        "--kind",
        choices=(
            "ivf",
            "ivfpq",
            "ivfpq-residual",
            "lsh",
            "pq",
            "bm25",
            "winnow",
            "substring",
        ),
        required=True,
    )
    p_idx.add_argument("--sf-dir", required=True, help="testdata directory")
    p_idx.add_argument("--output", required=True, help="index directory")
    p_idx.add_argument(
        "--probe", action="store_true", help="probe after building; print match count"
    )
    p_idx.add_argument(
        "--append",
        default=None,
        metavar="BATCH_PARQUET",
        help="incremental maintenance: append this batch parquet "
        "((vec_id, embedding) or (doc_id, text) rows) to the EXISTING "
        "index at --output against its persisted sidecar codebooks, "
        "rewriting only the touched lists/buckets",
    )
    p_idx.add_argument(
        "--resume",
        action="store_true",
        help="with --append or --compact: re-run a torn pass (skips the "
        "completion-marker assert; both merges are convergent)",
    )
    p_idx.add_argument(
        "--delete",
        default=None,
        metavar="IDS_PARQUET",
        help="incremental maintenance: remove these ids ((vec_id) or "
        "(doc_id) rows) from the EXISTING index at --output, rewriting "
        "only the touched lists/buckets (BM25 repairs df + stats); the "
        "right-to-be-forgotten op, result-equal to a rebuild without them",
    )
    p_idx.add_argument(
        "--compact",
        action="store_true",
        help="maintenance: rewrite the EXISTING index at --output's "
        "over-fragmented partitions in place (parallel builds/appends "
        "fan each written list across tasks); result-equal, idempotent",
    )
    p_idx.add_argument(
        "--report",
        action="store_true",
        help="print the freshness/staleness report for the EXISTING index "
        "at --output (per-partition files/bytes/rows, fragmentation, "
        "completeness, sidecars) without building or probing",
    )
    p_idx.add_argument(
        "--maintain",
        action="store_true",
        help="scheduled maintenance: report the EXISTING index at "
        "--output, compact ONLY if fragmented, report again — the "
        "cron-safe composition (a stable artifact is read-only)",
    )

    p_scr = sub.add_parser(
        "screen", help="screen an ingest batch against the persisted LSH dedup index"
    )
    p_scr.add_argument("--index", required=True, help="lsh index directory")
    p_scr.add_argument("--sf-dir", required=True, help="testdata directory (batch source)")
    p_scr.add_argument("--output", required=True, help="verdict table destination")

    p_ret = sub.add_parser(
        "retrieve",
        help="run retrieval (bm25 | semantic | hybrid RRF) and persist the top-k table",
    )
    p_ret.add_argument("--sf-dir", required=True, help="testdata directory")
    p_ret.add_argument("--output", required=True, help="result table destination")
    p_ret.add_argument(
        "--mode", default="hybrid", choices=["bm25", "semantic", "hybrid"]
    )
    p_ret.add_argument(
        "--bm25-index",
        default=None,
        help="serve the lexical tower from this PERSISTED BM25 index "
        "(with --ann-index: no corpus pass at query time)",
    )
    p_ret.add_argument(
        "--ann-index",
        default=None,
        help="serve the semantic tower from this PERSISTED ANN index",
    )
    p_ret.add_argument(
        "--ann-probe",
        default="ivf",
        choices=["ivf", "ivfpq", "ivfpq-residual"],
        help="which probe the --ann-index artifact expects (ivf is exact "
        "at full nprobe; the PQ kinds trade recall for 32-bit reads)",
    )

    p_mine = sub.add_parser(
        "mine",
        help="margin-based pair mining over the embedding sides (bitext class)",
    )
    p_mine.add_argument("--sf-dir", required=True, help="testdata directory")
    p_mine.add_argument("--output", required=True, help="mined-pairs destination")

    p_fun = sub.add_parser(
        "funnel", help="cumulative quality-filter funnel report over documents"
    )
    p_fun.add_argument("--sf-dir", required=True, help="testdata directory")
    p_fun.add_argument(
        "--output", default=None, help="optional parquet destination for the report"
    )

    p_split = sub.add_parser(
        "split", help="leakage-safe train/valid/test hash split audit"
    )
    p_split.add_argument("--sf-dir", required=True, help="testdata directory")
    p_split.add_argument(
        "--output", default=None, help="optional parquet destination for the audit"
    )

    p_imp = sub.add_parser(
        "impact", help="per-source docs/tokens the dedup survivor policy drops"
    )
    p_imp.add_argument("--sf-dir", required=True, help="testdata directory")
    p_imp.add_argument(
        "--output", default=None, help="optional parquet destination for the report"
    )

    p_ins = sub.add_parser(
        "inspect", help="storage-health report (files/bytes/row-groups) for a dataset"
    )
    p_ins.add_argument("--path", required=True)

    p_str = sub.add_parser(
        "stream", help="drain a parquet directory stream into an upsert table"
    )
    p_str.add_argument("--source", required=True, help="parquet directory to stream")
    p_str.add_argument("--table", required=True, help="upsert table path")
    p_str.add_argument("--checkpoint", required=True)
    p_str.add_argument("--keys", required=True, help="comma-separated key columns")
    p_str.add_argument("--version-col", required=True)
    p_str.add_argument("--partition-cols", default="", help="comma-separated")

    p_qscr = sub.add_parser(
        "qscreen",
        help="streaming quality triage: keep/review/drop verdicts per micro-batch",
    )
    p_qscr.add_argument("--source", required=True, help="parquet directory to stream")
    p_qscr.add_argument("--output", required=True, help="verdict table path")
    p_qscr.add_argument("--checkpoint", required=True)

    p_roll = sub.add_parser(
        "rollup", help="incrementally refresh a partitioned aggregate table"
    )
    p_roll.add_argument("--data", required=True, help="source dataset root")
    p_roll.add_argument("--out", required=True, help="rollup table root")
    p_roll.add_argument("--partition-col", required=True)
    p_roll.add_argument("--group-cols", required=True, help="comma-separated")
    p_roll.add_argument("--sum-col", required=True)

    p_exp = sub.add_parser(
        "export", help="write the cleaned train corpus as JSONL shards"
    )
    p_exp.add_argument("--sf-dir", required=True, help="testdata directory")
    p_exp.add_argument("--output", required=True, help="shard root directory")

    p_bpe = sub.add_parser(
        "bpe", help="train BPE merge rules over the document corpus"
    )
    p_bpe.add_argument("--sf-dir", required=True, help="testdata directory")
    p_bpe.add_argument("--output", required=True, help="merges.json destination dir")
    p_bpe.add_argument("--merges", type=int, default=8)
    p_bpe.add_argument(
        "--batched",
        action="store_true",
        help="batch each round's provably-independent top merges into one "
        "rewrite (identical merge list, fewer driver rounds — the "
        "production-vocabulary scale path)",
    )

    p_benc = sub.add_parser(
        "bpe-encode",
        help="tokenize the corpus into BPE id sequences (parquet)",
    )
    p_benc.add_argument("--sf-dir", required=True, help="testdata directory")
    p_benc.add_argument("--output", required=True, help="parquet destination dir")
    p_benc.add_argument("--merges", type=int, default=6)

    p_rest = sub.add_parser(
        "restore", help="roll back an upsert from a .versions snapshot"
    )
    p_rest.add_argument("--path", required=True)
    p_rest.add_argument(
        "--snapshot", default=None, help="snapshot name (default: most recent)"
    )
    p_rest.add_argument(
        "--list", action="store_true", help="list snapshots instead of restoring"
    )

    p_up = sub.add_parser("upsert", help="merge updates by key, last writer wins")
    p_up.add_argument("--path", required=True)
    p_up.add_argument("--updates", required=True, help="parquet path of update rows")
    p_up.add_argument("--keys", required=True, help="comma-separated key columns")
    p_up.add_argument("--version-col", required=True)
    p_up.add_argument("--partition-cols", default="", help="comma-separated")

    p_scd2 = sub.add_parser(
        "scd2", help="materialize the SCD2 user-state history table"
    )
    p_scd2.add_argument("--sf-dir", required=True, help="testdata directory")
    p_scd2.add_argument("--output", default=None, help="optional parquet destination")

    p_attr = sub.add_parser(
        "attribution", help="first/last/linear multi-touch credit per campaign"
    )
    p_attr.add_argument("--sf-dir", required=True, help="testdata directory")
    p_attr.add_argument("--output", default=None, help="optional parquet destination")

    p_surv = sub.add_parser(
        "survivors", help="full-corpus dedup keep/drop assignment table"
    )
    p_surv.add_argument("--sf-dir", required=True, help="testdata directory")
    p_surv.add_argument(
        "--policy",
        choices=("id", "quality"),
        default="id",
        help="canonical pick: lowest doc_id, or best quality bucket then longest",
    )
    p_surv.add_argument("--output", default=None, help="optional parquet destination")

    p_sscr = sub.add_parser(
        "substring-screen",
        help="streaming exact-substring screen: dup/partial_dup/new routes"
        " per micro-batch against a persisted fingerprint index",
    )
    p_sscr.add_argument("--source", required=True, help="parquet directory to stream")
    p_sscr.add_argument("--index", required=True, help="fingerprint index dir")
    p_sscr.add_argument("--output", required=True, help="verdict table path")
    p_sscr.add_argument("--checkpoint", required=True)

    p_wscr = sub.add_parser(
        "winnow-screen",
        help="streaming winnowing near-dup screen: near_dup_candidate/new"
        " routes per micro-batch against a persisted winnow index",
    )
    p_wscr.add_argument("--source", required=True, help="parquet directory to stream")
    p_wscr.add_argument("--index", required=True, help="winnow index dir")
    p_wscr.add_argument("--output", required=True, help="verdict table path")
    p_wscr.add_argument("--checkpoint", required=True)

    p_ascr = sub.add_parser(
        "ann-screen",
        help="streaming embedding near-dup screen: near_dup_candidate/new"
        " verdicts per micro-batch against a persisted IVF index;"
        " --append folds each batch's new vectors back into the index"
        " (self-maintaining serving)",
    )
    p_ascr.add_argument(
        "--source", required=True, help="(vec_id, embedding) parquet dir to stream"
    )
    p_ascr.add_argument("--index", required=True, help="ivf index dir")
    p_ascr.add_argument("--output", required=True, help="verdict table path")
    p_ascr.add_argument("--checkpoint", required=True)
    p_ascr.add_argument(
        "--append",
        action="store_true",
        help="after each batch's verdicts commit, append its 'new' vectors"
        " to the index against the frozen _centroids sidecar",
    )

    p_sdd = sub.add_parser(
        "substring-dedup",
        help="exact-substring pipeline: fingerprint index + span manifest"
        " + keep-one-copy removal plan",
    )
    p_sdd.add_argument("--sf-dir", required=True, help="testdata directory")
    p_sdd.add_argument("--output", required=True, help="destination root dir")

    args = parser.parse_args(argv)
    spark = get_spark(f"job-{args.cmd}")

    if args.cmd == "ingest":
        records = None
        if args.fixture:
            records = json.loads(open(args.fixture).read())
        status = ingest_job(
            spark, args.output, source_url=args.url, records=records, fmt=args.format
        )
        print(json.dumps(status))
        return 0 if status["statusCode"] == 200 else 1

    if args.cmd == "crawl":
        qualified = crawl(spark, args.path, args.database, args.table, fmt=args.format)
        n = spark.table(qualified).count()
        print(json.dumps({"statusCode": 200, "table": qualified, "rows": n}))
        return 0

    if args.cmd == "query":
        if args.crawl_path:
            crawl(spark, args.crawl_path)
        ex = QueryExecutor(spark, args.results)
        qid = ex.submit(args.sql)
        st = ex.wait(qid)
        print(
            json.dumps(
                {
                    "query_id": qid,
                    "state": st.state,
                    "rows": st.row_count,
                    "output": st.output_location,
                    "error": st.error,
                }
            )
        )
        return 0 if st.state == "SUCCEEDED" else 1

    if args.cmd == "pack":
        import os

        from .operators.text import clean_survivor_packing, corpus_shard_manifest

        # The packed assignment of the CLEANED train split (quality filter
        # -> exact dedup -> split -> pack), partitioned by bucket: a trainer
        # shard reads exactly one directory, already in token-stream order.
        # The manifest below aggregates the SAME packing — writing the raw
        # whole-corpus packing here would leak val-split docs and exact
        # duplicates into training shards and desynchronize every manifest
        # count from the data on disk.
        assignment_dir = os.path.join(args.output, "assignment")
        (
            clean_survivor_packing(spark, args.sf_dir)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(assignment_dir)
        )
        manifest = [r.asDict() for r in corpus_shard_manifest(spark, args.sf_dir).collect()]
        manifest_path = args.output.rstrip("/") + "/manifest.json"
        # Through the Hadoop FS API, not a driver-local open(): --output may
        # be any scheme (s3a://, hdfs://) the assignment write above already
        # succeeded on, and os.path/open would crash or write a bogus local
        # path for those.
        from .sources.objectstore import write_text

        write_text(spark, manifest_path, json.dumps(manifest))
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "assignment": assignment_dir,
                    "manifest": manifest_path,
                    "buckets": len(manifest),
                    "train_tokens": sum(m["tokens"] for m in manifest),
                }
            )
        )
        return 0

    if args.cmd == "retrieve":
        if (args.bm25_index is None) != (args.ann_index is None):
            print(
                json.dumps(
                    {
                        "statusCode": 400,
                        "error": "indexed retrieval needs BOTH --bm25-index "
                        "and --ann-index (build them with jobs index)",
                    }
                )
            )
            return 1
        if args.bm25_index is not None:
            # Serving path: probe the two PERSISTED indexes and fuse —
            # no corpus pass at query time (both were paid at build).
            from .operators.text import retrieval_hybrid_rrf_from_indexes

            if args.mode != "hybrid":
                print(
                    json.dumps(
                        {
                            "statusCode": 400,
                            "error": "indexed retrieval serves --mode hybrid; "
                            "probe a single index with jobs index --probe",
                        }
                    )
                )
                return 1
            result = retrieval_hybrid_rrf_from_indexes(
                spark,
                args.bm25_index,
                args.ann_index,
                args.sf_dir,
                ann_probe=args.ann_probe,
            )
        else:
            if args.mode == "bm25":
                from .operators.text import text_bm25_retrieval as _ret
            elif args.mode == "semantic":
                from .operators.similarity import similarity_topk as _ret
            else:
                from .operators.text import retrieval_hybrid_rrf as _ret
            result = _ret(spark, args.sf_dir)
        result.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "mode": args.mode,
                    "rows": n,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "mine":
        from .operators.similarity import embedding_bitext_mining

        pairs = embedding_bitext_mining(spark, args.sf_dir)
        pairs.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(
            json.dumps(
                {"statusCode": 200, "mined_pairs": n, "output": args.output}
            )
        )
        return 0

    if args.cmd == "funnel":
        from .operators.text import corpus_filter_funnel

        report = corpus_filter_funnel(spark, args.sf_dir)
        if args.output:
            # Write once, read the persisted parquet back for the ledger —
            # collect() + write() would run the funnel (window explode +
            # shuffle) twice.
            report.write.mode("overwrite").parquet(args.output)
            rows = spark.read.parquet(args.output).orderBy("step").collect()
        else:
            rows = report.collect()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "steps": [
                        {
                            "step": r.step,
                            "rule": r.rule,
                            "docs_in": r.docs_in,
                            "docs_remaining": r.docs_remaining,
                        }
                        for r in rows
                    ],
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "split":
        from .operators.text import corpus_train_eval_split

        report = corpus_train_eval_split(spark, args.sf_dir)
        if args.output:
            report.write.mode("overwrite").parquet(args.output)
            rows = spark.read.parquet(args.output).orderBy("source", "split").collect()
        else:
            rows = report.collect()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "splits": [
                        {
                            "source": r.source,
                            "split": r.split,
                            "n_docs": r.n_docs,
                            "n_tokens": r.n_tokens,
                        }
                        for r in rows
                    ],
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "impact":
        from .operators.dedup import corpus_dedup_impact_report

        report = corpus_dedup_impact_report(spark, args.sf_dir)
        if args.output:
            report.write.mode("overwrite").parquet(args.output)
            rows = spark.read.parquet(args.output).orderBy("source").collect()
        else:
            rows = report.collect()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "sources": [
                        {
                            "source": r.source,
                            "docs_total": r.docs_total,
                            "docs_dropped": r.docs_dropped,
                            "tokens_dropped": r.tokens_dropped,
                            "token_drop_rate": r.token_drop_rate,
                        }
                        for r in rows
                    ],
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "screen":
        from .operators.dedup import lsh_probe_indexed

        verdicts = lsh_probe_indexed(spark, args.index, args.sf_dir)
        verdicts.write.mode("overwrite").parquet(args.output)
        flagged = spark.read.parquet(args.output)
        n_total = flagged.count()
        n_flagged = flagged.filter("near_candidates > 0").count()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "batch_docs": n_total,
                    "flagged": n_flagged,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "inspect":
        from .maintenance import inspect as inspect_dataset

        print(json.dumps({"statusCode": 200, **inspect_dataset(args.path)}))
        return 0

    if args.cmd == "qscreen":
        from .streaming.events import run_stream_quality_screen

        run_stream_quality_screen(spark, args.source, args.output, args.checkpoint)
        verdicts = spark.read.parquet(args.output)
        routes = {
            r["route"]: r["count"]
            for r in verdicts.groupBy("route").count().collect()
        }
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "docs": sum(routes.values()),
                    "routes": routes,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "stream":
        from .streaming.events import run_upsert_sink

        # Schema from a batch read of the same directory: the scheduler's
        # contract is "whatever the producer writes there", and availableNow
        # makes each cron invocation a bounded incremental drain that
        # resumes from the checkpoint.
        schema = spark.read.parquet(args.source).schema
        stream = spark.readStream.schema(schema).parquet(args.source)
        run_upsert_sink(
            stream,
            args.table,
            args.checkpoint,
            key_cols=[c for c in args.keys.split(",") if c],
            version_col=args.version_col,
            partition_cols=[c for c in args.partition_cols.split(",") if c] or None,
        )
        n = spark.read.parquet(args.table).count()
        print(json.dumps({"statusCode": 200, "table": args.table, "rows": n}))
        return 0

    if args.cmd == "rollup":
        from .maintenance import incremental_rollup

        info = incremental_rollup(
            spark,
            args.data,
            args.out,
            args.partition_col,
            [c for c in args.group_cols.split(",") if c],
            args.sum_col,
        )
        print(json.dumps({"statusCode": 200, **info}))
        return 0

    if args.cmd == "export":
        from .operators.text import export_jsonl_shards

        info = export_jsonl_shards(spark, args.sf_dir, args.output)
        print(json.dumps({"statusCode": 200, **info}))
        return 0

    if args.cmd == "bpe-encode":
        import pyspark.sql.functions as F

        from .operators.text import bpe_encode_ids

        ids = bpe_encode_ids(spark, args.sf_dir, n_merges=args.merges)
        ids.write.mode("overwrite").parquet(args.output)
        stats = ids.agg(
            F.count("*").alias("docs"), F.sum("n_bpe_tokens").alias("tokens")
        ).collect()[0]
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "docs": int(stats.docs),
                    "tokens": int(stats.tokens),
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "bpe":
        from .operators.text import bpe_train, bpe_train_batched
        from .sources.objectstore import write_text

        if args.batched:
            result = bpe_train_batched(spark, args.sf_dir, n_merges=args.merges)
        else:
            result = bpe_train(spark, args.sf_dir, n_merges=args.merges)
        out_path = args.output.rstrip("/") + "/merges.json"
        write_text(spark, out_path, json.dumps(result))
        status = {
            "statusCode": 200,
            "merges": len(result["merges"]),
            "vocab_size": result["vocab_size"],
            "total_symbols": result["total_symbols"],
            "output": out_path,
        }
        if "rounds" in result:
            status["rounds"] = result["rounds"]
        print(json.dumps(status))
        return 0

    if args.cmd == "cluster":
        from .maintenance import cluster, zorder_cluster

        if args.zorder:
            info = zorder_cluster(
                spark, args.path, args.by.split(","), args.out, files=args.files
            )
            print(json.dumps({"statusCode": 200, **info}))
            return 0
        info = cluster(
            spark, args.path, args.by.split(","), args.out, files_per_partition=args.files
        )
        print(json.dumps({"statusCode": 200, **info}))
        return 0

    if args.cmd == "analyze":
        from .catalog import analyze_table

        if args.path:
            crawl(spark, args.path, args.database, args.table)
        cols = [c for c in args.columns.split(",") if c]
        info = analyze_table(spark, f"{args.database}.{args.table}", columns=cols or None)
        print(json.dumps({"statusCode": 200, **info}))
        return 0

    if args.cmd == "janitor":
        ex = QueryExecutor(spark, args.results)
        removed = ex.cleanup_results(retention_days=args.retention_days)
        out = {"statusCode": 200, "removed": removed}
        if args.data_path:
            from .maintenance import vacuum_versions

            out["versions"] = vacuum_versions(
                args.data_path, retention_days=args.version_retention_days
            )
        print(json.dumps(out))
        return 0

    if args.cmd == "compact":
        st = compact(
            spark, args.path, fmt=args.format, target_file_bytes=args.target_file_bytes
        )
        print(json.dumps({"statusCode": 200, **st.as_dict()}))
        return 0

    if args.cmd == "bucketize":
        from .bucketing import DEFAULT_BUCKETS, bucketize_facts

        ot, lt = bucketize_facts(
            spark, args.sf_dir, args.location, n_buckets=args.buckets or DEFAULT_BUCKETS
        )
        print(json.dumps({"statusCode": 200, "tables": [ot, lt]}))
        return 0

    if args.cmd == "restore":
        from .maintenance import list_versions, restore_version

        versions = list_versions(args.path)
        if args.list:
            print(json.dumps({"statusCode": 200, "versions": versions}))
            return 0
        name = args.snapshot or (versions[-1]["snapshot"] if versions else None)
        if name is None:
            print(json.dumps({"statusCode": 404, "error": "no version snapshots"}))
            return 1
        st = restore_version(args.path, name)
        print(json.dumps({"statusCode": 200, "snapshot": name, **st}))
        return 0

    if args.cmd == "index":
        # All kinds share the write-once/probe-many shape: build pays the
        # one assignment/signature pass, probes become partition-pruned
        # scans (plan-gated in tests/test_extensions.py).  --append BATCH
        # runs the kind's incremental maintenance path instead: the batch
        # parquet is assigned/coded/signed against the EXISTING sidecars
        # and only the touched lists/buckets are rewritten (idempotent;
        # result-equal to a full rebuild, gated by test).
        from .operators.dedup import (
            dedup_winnowing_indexed,
            exact_substring_dedup_indexed,
            lsh_append_index,
            lsh_build_index,
            lsh_probe_indexed,
            substring_index_append,
            substring_index_build,
            winnow_index_append,
            winnow_index_build,
        )
        from .operators.similarity import (
            ivf_append_index,
            ivf_build_index,
            ivf_probe_indexed,
            ivfpq_append_index,
            ivfpq_build_index,
            ivfpq_probe_indexed,
            ivfpq_residual_append_index,
            ivfpq_residual_build_index,
            ivfpq_residual_probe_indexed,
            pq_append_index,
            pq_build_index,
            pq_delete_index,
            pq_probe_indexed,
        )
        from .operators.text import bm25_append_index, bm25_build_index, bm25_probe_indexed

        kinds = {
            "ivf": (ivf_build_index, ivf_append_index, ivf_probe_indexed),
            "ivfpq": (ivfpq_build_index, ivfpq_append_index, ivfpq_probe_indexed),
            "ivfpq-residual": (
                ivfpq_residual_build_index,
                ivfpq_residual_append_index,
                ivfpq_residual_probe_indexed,
            ),
            "pq": (pq_build_index, pq_append_index, pq_probe_indexed),
            "bm25": (bm25_build_index, bm25_append_index, bm25_probe_indexed),
            # the winnow/substring probes read only the persisted stream;
            # sf_dir is accepted for the shared CLI probe signature, unused
            "winnow": (
                winnow_index_build,
                winnow_index_append,
                lambda s, out, _sf: dedup_winnowing_indexed(s, out),
            ),
            "substring": (
                substring_index_build,
                substring_index_append,
                lambda s, out, _sf: exact_substring_dedup_indexed(s, out),
            ),
            "lsh": (lsh_build_index, lsh_append_index, lsh_probe_indexed),
        }
        build, append, probe_fn = kinds[args.kind]
        if args.maintain:
            # The scheduler's composition lives in functions.indexing so
            # the registered lifecycle row and this CLI share one frame.
            from .functions.indexing import index_maintain

            st = index_maintain(spark, args.output, resume=args.resume)
            print(
                json.dumps(
                    {
                        "statusCode": 200,
                        "kind": args.kind,
                        "index": args.output,
                        "mode": "maintain",
                        **st,
                    }
                )
            )
            return 0
        if args.report:
            from .functions.indexing import index_report

            rep = index_report(spark, args.output)
            if args.kind == "bm25":
                # BM25's denormalized df + stats sidecar are redundant with
                # the postings — the report can audit freshness exactly.
                from .operators.text import bm25_index_drift

                rep["drift"] = bm25_index_drift(spark, args.output)
            print(
                json.dumps(
                    {"statusCode": 200, "kind": args.kind, "index": args.output}
                    | rep
                )
            )
            return 0
        if args.compact:
            from .functions.indexing import index_compact

            st = index_compact(spark, args.output, resume=args.resume)
            out = {
                "statusCode": 200,
                "kind": args.kind,
                "index": args.output,
                "mode": "compact",
                **st,
            }
            if args.probe:
                out["probe_rows"] = probe_fn(
                    spark, args.output, args.sf_dir
                ).count()
            print(json.dumps(out))
            return 0
        if args.delete is not None:
            from .operators.dedup import winnow_index_delete
            from .operators.similarity import inverted_lists_delete
            from .operators.text import bm25_delete_index

            deleters = {
                "ivf": inverted_lists_delete,
                "ivfpq": inverted_lists_delete,
                "ivfpq-residual": inverted_lists_delete,
                "lsh": lambda s, out, ids, resume=False: inverted_lists_delete(
                    s, out, ids, resume=resume,
                    id_col="doc_id", partition_cols=("band", "bucket"),
                ),
                # the substring stream carries no denormalized df — the
                # generic per-id delete applies as-is
                "substring": lambda s, out, ids, resume=False: inverted_lists_delete(
                    s, out, ids, resume=resume,
                    id_col="doc_id", partition_cols=("bucket",),
                ),
                "winnow": winnow_index_delete,
                "bm25": bm25_delete_index,
                # unpartitioned code table: anti-join + staged full-table
                # swap (see pq_delete_index's crash-safety notes)
                "pq": pq_delete_index,
            }
            if args.kind not in deleters:
                print(
                    json.dumps(
                        {
                            "statusCode": 400,
                            "error": f"kind {args.kind} has no delete path; "
                            "rebuild without the rows",
                        }
                    )
                )
                return 1
            ids = spark.read.parquet(args.delete)
            removed = deleters[args.kind](
                spark, args.output, ids, resume=args.resume
            )
            out = {
                "statusCode": 200,
                "kind": args.kind,
                "index": args.output,
                "mode": "delete",
                "removed_rows": removed,
            }
            if args.probe:
                out["probe_rows"] = probe_fn(
                    spark, args.output, args.sf_dir
                ).count()
            print(json.dumps(out))
            return 0
        if args.append is not None:
            if append is None:
                print(
                    json.dumps(
                        {
                            "statusCode": 400,
                            "error": f"kind {args.kind} has no append path; "
                            "rebuild the index with the batch included",
                        }
                    )
                )
                return 1
            batch = spark.read.parquet(args.append)
            append(spark, args.output, batch, resume=args.resume)
        else:
            build(spark, args.sf_dir, args.output)
        out = {
            "statusCode": 200,
            "kind": args.kind,
            "index": args.output,
            "mode": "append" if args.append is not None else "build",
        }
        if args.probe:
            out["probe_rows"] = probe_fn(spark, args.output, args.sf_dir).count()
        print(json.dumps(out))
        return 0

    if args.cmd == "upsert":
        from .maintenance import upsert

        st = upsert(
            spark,
            args.path,
            spark.read.parquet(args.updates),
            key_cols=args.keys.split(","),
            version_col=args.version_col,
            partition_cols=[c for c in args.partition_cols.split(",") if c],
        )
        print(json.dumps({"statusCode": 200, **st}))
        return 0

    if args.cmd == "scd2":
        import pyspark.sql.functions as F

        from .operators.analytics import events_scd2_user_state

        hist = events_scd2_user_state(spark, args.sf_dir)
        if args.output:
            hist.write.mode("overwrite").parquet(args.output)
            hist = spark.read.parquet(args.output)
        agg = hist.agg(
            F.count("*").alias("rows"),
            F.countDistinct("user_id").alias("users"),
            F.sum(F.col("is_current").cast("int")).alias("open_runs"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "rows": agg.rows,
                    "users": agg.users,
                    "open_runs": agg.open_runs,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "attribution":
        from .operators.analytics import events_attribution

        rep = events_attribution(spark, args.sf_dir)
        if args.output:
            rep.write.mode("overwrite").parquet(args.output)
            rep = spark.read.parquet(args.output)
        rows = rep.orderBy("campaign").collect()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "campaigns": len(rows),
                    "touches": sum(r.touches for r in rows),
                    "linear_credit_micro": sum(r.linear_credit_micro for r in rows),
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "ann-screen":
        from .streaming.events import run_stream_ann_screen

        run_stream_ann_screen(
            spark,
            args.source,
            args.index,
            args.output,
            args.checkpoint,
            append=args.append,
        )
        verdicts = spark.read.parquet(args.output)
        routes = {
            r["verdict"]: r["count"]
            for r in verdicts.groupBy("verdict").count().collect()
        }
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "vectors": sum(routes.values()),
                    "routes": routes,
                    "appended": bool(args.append),
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "winnow-screen":
        from .streaming.events import run_stream_winnow_screen

        run_stream_winnow_screen(
            spark, args.source, args.index, args.output, args.checkpoint
        )
        verdicts = spark.read.parquet(args.output)
        routes = {
            r["verdict"]: r["count"]
            for r in verdicts.groupBy("verdict").count().collect()
        }
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "docs": sum(routes.values()),
                    "routes": routes,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "substring-screen":
        from .streaming.events import run_stream_substring_screen

        run_stream_substring_screen(
            spark, args.source, args.index, args.output, args.checkpoint
        )
        verdicts = spark.read.parquet(args.output)
        routes = {
            r["verdict"]: r["count"]
            for r in verdicts.groupBy("verdict").count().collect()
        }
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "docs": sum(routes.values()),
                    "routes": routes,
                    "output": args.output,
                }
            )
        )
        return 0

    if args.cmd == "substring-dedup":
        import pyspark.sql.functions as F

        from .operators.dedup import (
            exact_substring_dedup_indexed,
            span_removal_plan_indexed,
            substring_index_build,
        )

        root = args.output.rstrip("/")
        substring_index_build(spark, args.sf_dir, f"{root}/fingerprints")
        # span manifest AND removal plan served FROM the index just built
        # (each result-equal to its inline query by test) — the tokenize
        # scan runs exactly once, in the index build; everything after
        # reads three ints per window.
        spans = exact_substring_dedup_indexed(spark, f"{root}/fingerprints")
        spans.write.mode("overwrite").parquet(f"{root}/spans")
        plan = span_removal_plan_indexed(spark, f"{root}/fingerprints")
        plan.write.mode("overwrite").parquet(f"{root}/removal_plan")
        pstats = spark.read.parquet(f"{root}/removal_plan").agg(
            F.count("*").alias("docs_touched"),
            F.sum("removable_tokens").alias("removable_tokens"),
            F.sum("n_tokens").alias("tokens_in_touched_docs"),
        ).collect()[0]
        n_spans = spark.read.parquet(f"{root}/spans").count()
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "spans": int(n_spans),
                    "docs_touched": int(pstats.docs_touched or 0),
                    "removable_tokens": int(pstats.removable_tokens or 0),
                    "tokens_in_touched_docs": int(
                        pstats.tokens_in_touched_docs or 0
                    ),
                    "output": root,
                }
            )
        )
        return 0

    if args.cmd == "survivors":
        import pyspark.sql.functions as F

        if args.policy == "quality":
            from .operators.dedup import dedup_quality_survivors as _surv
        else:
            from .operators.dedup import dedup_survivors as _surv
        table = _surv(spark, args.sf_dir)
        if args.output:
            table.write.mode("overwrite").parquet(args.output)
            table = spark.read.parquet(args.output)
        agg = table.agg(
            F.count("*").alias("docs"),
            F.sum(F.col("is_survivor").cast("int")).alias("kept"),
        ).collect()[0]
        print(
            json.dumps(
                {
                    "statusCode": 200,
                    "policy": args.policy,
                    "docs": agg.docs,
                    "kept": agg.kept,
                    "dropped": agg.docs - agg.kept,
                    "output": args.output,
                }
            )
        )
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())

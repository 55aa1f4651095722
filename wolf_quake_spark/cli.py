"""spark-submit entry point.

Examples::

    # generate a seeded synthetic transcripts table
    spark-submit --py-files wqs.zip -m wolf_quake_spark.cli generate \
        --out /data/transcripts --convs 512 --mega-factor 200

    # run the pipeline, resumable
    spark-submit --py-files wqs.zip -m wolf_quake_spark.cli run \
        --input /data/transcripts --out /data/pipeline_out --strict

(Module-style invocation also works plain: ``python -m wolf_quake_spark.cli``.)
"""

from __future__ import annotations

import argparse
import json
import sys

from wolf_quake_spark.session import build_session


def _cmd_generate(args: argparse.Namespace) -> None:
    from wolf_quake_spark.datagen import synth_transcripts

    spark = build_session("wqs-generate", master=args.master)
    df = synth_transcripts(
        spark,
        n_convs=args.convs,
        lines_per_turn=args.lines_per_turn,
        seed=args.seed,
        mega_factor=args.mega_factor,
    )
    # conv-partitioned layout: a conversation never spans files, which is the
    # resumable-batch correctness precondition (plans/pipeline.py)
    df.repartition(args.out_partitions, "conv_id").write.mode("overwrite").parquet(
        args.out
    )
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"written_turns": n, "path": args.out}))


def _cmd_run(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans.pipeline import run_resumable

    spark = build_session("wqs-run", master=args.master)
    manifest = run_resumable(
        spark,
        input_path=args.input,
        out_dir=args.out,
        files_per_batch=args.files_per_batch,
        strict=args.strict,
        extractor=args.extractor,
        iceberg_catalog=args.iceberg_catalog,
        skew_chunk_turns=args.skew_chunk_turns,
        table_format=args.table_format,
    )
    print(json.dumps({"batches": len(manifest.completed), "totals": manifest.totals()}))


def _cmd_report(args: argparse.Namespace) -> None:
    from wolf_quake_spark.report import report_from_out_dir

    spark = build_session("wqs-report", master=args.master)
    rendered = report_from_out_dir(
        spark,
        args.out,
        fmt=args.format,
        report_type=args.report_type,
        conv_ids=args.conv or None,
    )
    # reference: report goes to the file when -o is given, else stdout
    # (src/main.rs:43-49)
    if args.output_file:
        with open(args.output_file, "w") as fh:
            fh.write(rendered)
    else:
        print(rendered)


def _cmd_curate(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans.curate import run_curation
    from wolf_quake_spark.sources.documents import read_documents, release

    spark = build_session("wqs-curate", master=args.master)
    docs = read_documents(spark, args.input, fmt=args.input_format)
    manifest = run_curation(spark, docs, args.out, threshold=args.threshold)
    release(docs)  # jsonl/csv ingest caches the raw frame for reject split
    print(json.dumps(manifest, sort_keys=True))


def _cmd_compact(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans.compact import compact_dir

    spark = build_session("wqs-compact", master=args.master)
    rep = compact_dir(spark, args.path, target_bytes=args.target_mb * 1024 * 1024)
    print(
        json.dumps(
            {
                "files_before": rep.files_before,
                "files_after": rep.files_after,
                "rows": rep.rows,
                "leaves": len(rep.leaves),
            }
        )
    )


def _parse_partition_spec(spec: str):
    """Delegates to the canonical descriptor parser (partition_transforms.
    parse_spec), keeping the CLI error shape."""
    from wolf_quake_spark.plans.partition_transforms import parse_spec

    try:
        return parse_spec(spec)
    except ValueError as e:
        raise SystemExit(f"{e} in --by") from None


def _cmd_table_write(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans.partition_transforms import write_hidden_partitioned

    spark = build_session("wqs-table-write", master=args.master)
    df = spark.read.parquet(args.input)
    manifest = write_hidden_partitioned(df, args.out, _parse_partition_spec(args.by))
    print(
        json.dumps(
            {
                "partitions": len(manifest["partitions"]),
                "rows": sum(p["n_rows"] for p in manifest["partitions"]),
                "spec": manifest["spec"],
            }
        )
    )


def _cmd_table_index(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans.bloom_index import build_bloom_index

    spark = build_session("wqs-table-index", master=args.master)
    sc = build_bloom_index(
        spark, args.table, args.col, bits_per_row=args.bits_per_row, k=args.k
    )
    print(
        json.dumps(
            {"col": sc["col"], "m_bits": sc["m"], "k": sc["k"],
             "partitions": len(sc["partitions"])}
        )
    )


def _cmd_table_read(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans.bloom_index import bloom_point_lookup
    from wolf_quake_spark.plans.partition_transforms import pruned_read

    spark = build_session("wqs-table-read", master=args.master)
    if args.eq is not None:
        col, value = args.eq
        df, report = bloom_point_lookup(spark, args.table, col, value)
    else:
        col, lo, hi = args.range
        df, report = pruned_read(spark, args.table, col, lo, hi)
    report["rows_matched"] = df.count()
    print(json.dumps(report))
    for r in df.limit(args.limit).collect():
        print(json.dumps(r.asDict(), default=str))


def _cmd_ann(args: argparse.Namespace) -> None:
    from wolf_quake_spark.analysis import ann_index as ai

    spark = build_session("wqs-ann", master=args.master)
    if args.action == "build":
        if not args.input:
            raise SystemExit("ann build needs --input")
        emb = spark.read.parquet(args.input)
        print(json.dumps(ai.ivfpq_build_index(emb, args.index)))
    elif args.action == "append":
        if not args.input:
            raise SystemExit("ann append needs --input")
        emb = spark.read.parquet(args.input)
        print(json.dumps(ai.ivfpq_index_append(spark, args.index, emb)))
    elif args.action == "compact":
        print(json.dumps(ai.ivfpq_index_compact(spark, args.index)))
    else:
        if args.query_vec:
            qv = [float(x) for x in args.query_vec.split(",")]
        elif args.input:
            from pyspark.sql import functions as F

            row = (
                spark.read.parquet(args.input)
                .where(F.col("vec_id") == 0)
                .select("embedding")
                .first()
            )
            if row is None:
                raise SystemExit("ann search: no vec_id 0 in --input")
            qv = list(row["embedding"])
        else:
            raise SystemExit("ann search needs --query-vec or --input")
        out = ai.ivfpq_index_search(
            spark, args.index, qv, n_probes=args.n_probes, k=args.k
        )
        rows = [r.asDict() for r in out.collect()]
        print(json.dumps({"scan": out._wqs_scan_report, "topk": rows}))


def _cmd_snapshot(args: argparse.Namespace) -> None:
    from wolf_quake_spark.plans import snapshots as sn

    act = args.action
    if act in ("create", "append", "merge", "stage") and not args.input:
        raise SystemExit(f"snapshot {act} needs --input")
    if act == "publish" and args.snapshot_id is None:
        raise SystemExit("snapshot publish needs --snapshot-id")
    if act in ("tag", "untag") and not args.name:
        raise SystemExit(f"snapshot {act} needs --name")
    if act == "tag":
        sid = sn.create_tag(args.table, args.name, args.snapshot_id)
        print(json.dumps({"tag": args.name, "snapshot_id": sid}))
        return
    if act == "untag":
        sid = sn.drop_tag(args.table, args.name)
        print(json.dumps({"untagged": args.name, "snapshot_id": sid}))
        return
    if act in ("branch", "unbranch", "ff"):
        if not args.name:
            raise SystemExit(f"snapshot {act} needs --name")
        if act == "branch":
            sid = sn.create_branch(args.table, args.name, args.snapshot_id)
            print(json.dumps({"branch": args.name, "snapshot_id": sid}))
        elif act == "unbranch":
            sid = sn.drop_branch(args.table, args.name)
            print(json.dumps({"unbranched": args.name, "snapshot_id": sid}))
        else:
            sid = sn.fast_forward(args.table, args.name)
            print(json.dumps({"fast_forwarded": args.name, "current_id": sid}))
        return
    if act == "changes" and (args.from_id is None or args.to_id is None):
        raise SystemExit("snapshot changes needs --from-id and --to-id")
    # metadata-only actions never need a JVM
    if act == "history":
        for row in sn.history(args.table):
            print(json.dumps(row))
        return
    if act == "refs":
        for row in sn.refs(args.table):
            print(json.dumps(row))
        return
    if act == "files":
        for row in sn.files_table(args.table, args.snapshot_id):
            print(json.dumps(row))
        return
    if act == "expire":
        print(json.dumps({"expired": sn.expire_snapshots(args.table, args.keep_last)}))
        return
    if act == "gc":
        print(json.dumps({"removed": sn.gc_orphans(args.table)}))
        return
    if act == "publish":
        sn.publish(args.table, args.snapshot_id)
        print(json.dumps({"published": args.snapshot_id}))
        return

    spark = build_session("wqs-snapshot", master=args.master)
    if act == "create":
        if not args.keys:
            raise SystemExit("snapshot create needs --keys")
        sid = sn.create_table(
            spark.read.parquet(args.input), args.table, args.keys.split(",")
        )
        print(json.dumps({"snapshot_id": sid}))
    elif act == "append":
        sid = sn.append(
            spark.read.parquet(args.input), args.table, branch=args.branch
        )
        print(json.dumps({"snapshot_id": sid}))
    elif act == "stage":
        sid = sn.stage_append(spark.read.parquet(args.input), args.table)
        print(json.dumps({"staged_snapshot_id": sid}))
    elif act == "merge":
        print(
            json.dumps(
                sn.merge_cow(
                    spark, args.table, spark.read.parquet(args.input),
                    branch=args.branch,
                )
            )
        )
    elif act == "read":
        if args.where_col:
            df, rep = sn.scan_where(
                spark, args.table, args.where_col, args.lo,
                args.hi, args.snapshot_id,
            )
            print(json.dumps({"rows": df.count(), **rep}))
            for r in df.limit(args.limit).collect():
                print(json.dumps(r.asDict(), default=str))
            return
        if args.branch:
            df = sn.read_branch(spark, args.table, args.branch)
        elif args.name:
            df = sn.read_tag(spark, args.table, args.name)
        else:
            df = sn.read_snapshot(spark, args.table, args.snapshot_id)
        print(json.dumps({"rows": df.count()}))
        for r in df.limit(args.limit).collect():
            print(json.dumps(r.asDict(), default=str))
    elif act == "changes":
        df = sn.snapshot_changes(spark, args.table, args.from_id, args.to_id)
        print(json.dumps({"rows": df.count()}))
        for r in df.limit(args.limit).collect():
            print(json.dumps(r.asDict(), default=str))
    elif act == "rewrite":
        zc = args.zorder_cols.split(",") if args.zorder_cols else None
        if args.strategy == "zorder" and len(zc or []) < 2:
            raise SystemExit(
                "snapshot rewrite --strategy zorder needs --zorder-cols "
                "with >= 2 comma-separated columns"
            )
        print(
            json.dumps(
                sn.rewrite_small_files(
                    spark,
                    args.table,
                    target_bytes=args.target_mb * 1024 * 1024,
                    strategy=args.strategy,
                    zorder_cols=zc,
                )
            )
        )


TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _register_views(spark, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _cmd_sql(args: argparse.Namespace) -> None:
    spark = build_session("wqs-sql", master=args.master)
    _register_views(spark, args.sf_dir)
    df = spark.sql(args.query)
    if args.explain:
        df.explain("formatted")
    rows = df.limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(), default=str))


def _cmd_explain(args: argparse.Namespace) -> None:
    from wolf_quake_spark.queries import queries

    spark = build_session("wqs-explain", master=args.master)
    fn = queries().get(args.query)
    if fn is None:
        print(f"unknown query {args.query!r}; known: {sorted(queries())}")
        sys.exit(2)
    fn(spark, args.sf_dir).explain("formatted")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="wolf_quake_spark")
    p.add_argument("--master", default=None, help="spark master override")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a seeded synthetic transcripts table")
    g.add_argument("--out", required=True)
    g.add_argument("--convs", type=int, default=256)
    g.add_argument("--lines-per-turn", type=int, default=4)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--mega-factor", type=int, default=0)
    g.add_argument("--out-partitions", type=int, default=32)
    g.set_defaults(fn=_cmd_generate)

    r = sub.add_parser("run", help="run the pipeline (resumable)")
    r.add_argument("--input", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--files-per-batch", type=int, default=64)
    r.add_argument("--strict", action="store_true")
    r.add_argument("--extractor", choices=["udf", "sql"], default="udf")
    r.add_argument("--iceberg-catalog", default=None)
    r.add_argument(
        "--table-format", choices=["parquet", "snapshot"], default="parquet",
        help="sink layout: batch-dir parquet or emulated snapshot tables",
    )
    r.add_argument(
        "--skew-chunk-turns",
        type=int,
        default=None,
        help="salt sessionization to (conv_id, turn_idx div N) chunks so "
        "mega-conversations parallelize (output identical to the default)",
    )
    r.set_defaults(fn=_cmd_run)

    rep = sub.add_parser("report", help="render the per-game report from a run's output")
    rep.add_argument("--out", required=True, help="pipeline output dir")
    rep.add_argument("--format", choices=["text", "html"], default="text")
    # reference CLI parity: report type selection (src/cli.rs:9-16) and
    # output-file sink (src/main.rs:43-49)
    rep.add_argument(
        "--report-type",
        choices=["all", "player-rank", "mean-death"],
        default="all",
    )
    rep.add_argument("--output-file", default=None, help="write report here instead of stdout")
    rep.add_argument(
        "--conv",
        action="append",
        default=[],
        help="restrict the report to these conv_id(s); repeatable",
    )
    rep.set_defaults(fn=_cmd_report)

    c = sub.add_parser(
        "curate", help="run the composed corpus-curation job over a documents table"
    )
    c.add_argument("--input", required=True, help="documents table path")
    c.add_argument(
        "--input-format", choices=["parquet", "jsonl", "csv"], default="parquet"
    )
    c.add_argument("--out", required=True, help="curation output dir")
    c.add_argument("--threshold", type=float, default=0.5, help="near-dup Jaccard")
    c.set_defaults(fn=_cmd_curate)

    k = sub.add_parser(
        "compact", help="rewrite small sink files to the target size (footer-verified)"
    )
    k.add_argument("--path", required=True, help="sink root directory")
    k.add_argument("--target-mb", type=int, default=128)
    k.set_defaults(fn=_cmd_compact)

    s = sub.add_parser("sql", help="ad-hoc SQL over the benchmark tables")
    s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=100)
    s.add_argument("--explain", action="store_true")
    s.set_defaults(fn=_cmd_sql)

    e = sub.add_parser("explain", help="formatted physical plan of a registry query")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.add_argument("--query", required=True, help="registry query name")
    e.set_defaults(fn=_cmd_explain)

    tw = sub.add_parser(
        "table-write",
        help="write a hidden-partitioned table (Iceberg-style transforms + stats manifest)",
    )
    tw.add_argument("--input", required=True, help="input parquet dir")
    tw.add_argument("--out", required=True)
    tw.add_argument(
        "--by", required=True,
        help="comma list of transform:col — day|hour|month|year:ts, bucketN:key, truncN:int_col, truncstrN:str_col",
    )
    tw.set_defaults(fn=_cmd_table_write)

    ti = sub.add_parser(
        "table-index", help="build the per-partition Bloom point-lookup sidecar"
    )
    ti.add_argument("--table", required=True)
    ti.add_argument("--col", required=True)
    ti.add_argument("--bits-per-row", type=int, default=10)
    ti.add_argument("--k", type=int, default=5)
    ti.set_defaults(fn=_cmd_table_index)

    tr = sub.add_parser(
        "table-read",
        help="pruned scan: --range col lo hi (manifest min/max) or --eq col value (Bloom)",
    )
    tr.add_argument("--table", required=True)
    tr.add_argument("--range", nargs=3, metavar=("COL", "LO", "HI"))
    tr.add_argument("--eq", nargs=2, metavar=("COL", "VALUE"))
    tr.add_argument("--limit", type=int, default=10)
    tr.set_defaults(fn=_cmd_table_read)

    sp = sub.add_parser(
        "snapshot",
        help="snapshot table ops: create/append/merge (copy-on-write upsert)/"
        "read (time travel)/stage+publish (write-audit-publish)/expire/gc",
    )
    sp.add_argument(
        "action",
        choices=[
            "create", "append", "merge", "read", "changes", "rewrite",
            "stage", "publish", "expire", "gc", "tag", "untag", "history",
            "refs", "files", "branch", "unbranch", "ff",
        ],
    )
    sp.add_argument("--table", required=True, help="snapshot table dir")
    sp.add_argument("--branch", default=None, help="append/read: target a named writable branch ref")
    sp.add_argument("--where-col", default=None, help="read: prune files by this column's entry stats")
    sp.add_argument("--lo", default=None, help="read --where-col: range low (or point value)")
    sp.add_argument("--hi", default=None, help="read --where-col: range high (omit for point lookup)")
    sp.add_argument("--input", default=None, help="parquet dir (create/append/merge/stage)")
    sp.add_argument("--keys", default=None, help="comma list of merge key cols (create)")
    sp.add_argument("--snapshot-id", type=int, default=None, help="read/publish target")
    sp.add_argument("--from-id", type=int, default=None, help="changes: older snapshot")
    sp.add_argument("--to-id", type=int, default=None, help="changes: newer snapshot")
    sp.add_argument("--keep-last", type=int, default=3, help="expire retention")
    sp.add_argument("--target-mb", type=int, default=128, help="rewrite bin size")
    sp.add_argument(
        "--strategy", choices=["binpack", "sort", "zorder"], default="binpack",
        help="rewrite: binpack (no shuffle), sort (re-cluster by key), or "
        "zorder (multi-dim Morton clustering; needs --zorder-cols)",
    )
    sp.add_argument(
        "--zorder-cols", default=None,
        help="rewrite --strategy zorder: comma list of >= 2 numeric/timestamp cols",
    )
    sp.add_argument("--name", default=None, help="tag name (tag/untag/read)")
    sp.add_argument("--limit", type=int, default=10)
    sp.set_defaults(fn=_cmd_snapshot)

    an = sub.add_parser(
        "ann",
        help="materialized IVFADC index ops: build (train + write the "
        "cent_id-partitioned codes table), search (manifest-pruned probe "
        "reads), append (frozen-structure incremental ingest)",
    )
    an.add_argument("action", choices=["build", "search", "append", "compact"])
    an.add_argument("--index", required=True, help="index dir")
    an.add_argument("--input", default=None, help="embeddings parquet (build/append)")
    an.add_argument("--query-vec", default=None,
                    help="search: comma list of floats (defaults to the "
                    "corpus vector with vec_id 0 read from --input)")
    an.add_argument("--n-probes", type=int, default=3)
    an.add_argument("--k", type=int, default=10)
    an.set_defaults(fn=_cmd_ann)

    args = p.parse_args(argv)
    if getattr(args, "fn", None) is _cmd_table_read and bool(args.range) == bool(args.eq):
        p.error("table-read needs exactly one of --range / --eq")
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])

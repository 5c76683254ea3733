"""``python -m moonlink_spark`` — the operator CLI.

Moonlink ships a service binary that hosts the REST API and the managed
tables (reference: src/moonlink_service/src/main.rs; backend dispatch
src/moonlink_backend/src/lib.rs:141-395 — create_table / drop_table /
list_tables / optimize_table / scan_table / load_files). This CLI is the
Spark-first equivalent over the same engine modules; every subcommand is a
thin shell around a public API the tests already cover:

    serve     --root DIR [--port P]       host the REST service (service.py)
    create    NS.TABLE [--catalog ROOT]   create a table in a FileCatalog
    tables    [--catalog ROOT]            list namespaces/tables
    drop      NS.TABLE [--purge]          drop through the catalog
    optimize  LOCATION [--mode auto|full|compact|cluster|expire]
    scan      LOCATION [--columns a,b] [--lsn N] [--limit N]
    ingest    LOCATION FILE.parquet --lsn N   MERGE a CDC parquet batch
    orphans   LOCATION [--apply]          sweep unreferenced objects
    recover   --store META.DB             re-attach registered tables

Run under ``spark-submit --py-files moonlink_spark.zip`` on a cluster; in
local mode it builds its own ``local[N]`` session (``--cores``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from moonlink_spark.session import get_spark

    return get_spark(cores=args.cores)


def _qualified(s: str) -> tuple[str, str]:
    if "." not in s:
        raise SystemExit(f"expected NS.TABLE, got {s!r}")
    ns, _, name = s.partition(".")
    return ns, name


def _cat(args):
    from moonlink_spark.table.namespace import FileCatalog

    return FileCatalog(args.catalog)


def cmd_serve(args) -> int:
    import threading

    from moonlink_spark.service import make_server

    srv = make_server(_spark(args), args.root, port=args.port)
    print(json.dumps({"serving": True, "port": srv.server_address[1],
                      "root": args.root}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


def cmd_create(args) -> int:
    from pyspark.sql.types import StructType

    from moonlink_spark.schema import IMAGES_SCHEMA

    ns, name = _qualified(args.table)
    cat = _cat(args)
    if not cat.namespace_exists(ns):
        cat.create_namespace(ns)
    schema = (
        StructType.fromJson(json.load(open(args.schema)))
        if args.schema
        else IMAGES_SCHEMA
    )
    props = dict(kv.split("=", 1) for kv in args.property or [])
    t = cat.create_table(ns, name, schema, properties=props or None)
    print(json.dumps({"created": args.table, "location": t.md.location}))
    return 0


def cmd_tables(args) -> int:
    cat = _cat(args)
    out = {ns: cat.list_tables(ns) for ns in cat.list_namespaces()}
    print(json.dumps(out, indent=2))
    return 0


def cmd_drop(args) -> int:
    ns, name = _qualified(args.table)
    _cat(args).drop_table(ns, name, purge=args.purge)
    print(json.dumps({"dropped": args.table, "purged": args.purge}))
    return 0


def cmd_optimize(args) -> int:
    from moonlink_spark.operators.maintenance import auto_optimize, optimize_table
    from moonlink_spark.table.catalog import load_table

    spark = _spark(args)
    t = load_table(args.location)
    if args.mode == "auto":
        rep = auto_optimize(spark, t)
        print(json.dumps({"auto": True, "triggered": rep.triggered}))
    elif args.mode == "cluster":
        from moonlink_spark.operators.cluster import cluster

        kw = {}
        if args.cols:
            kw["cols"] = tuple(c.strip() for c in args.cols.split(","))
        cluster(spark, t, strategy=args.strategy, **kw)
        print(json.dumps({"clustered": args.location, "strategy": args.strategy,
                          "cols": kw.get("cols")}))
    elif args.scope_key is not None and args.mode == "full":
        from moonlink_spark.operators.compact import compact

        res = compact(
            spark, t, mode="full",
            scope_key=args.scope_key, scope_lo=args.scope_lo,
            scope_hi=args.scope_hi,
        )
        print(json.dumps({"compacted": args.location, "scoped": True,
                          "skipped": res.skipped}))
    elif args.mode == "expire":
        from moonlink_spark.operators.expire import expire_snapshots

        r = expire_snapshots(t, retain_last=args.retain_last)
        print(json.dumps({"expired": args.location,
                          "retain_last": args.retain_last, "result": str(r)}))
    else:
        optimize_table(spark, t, mode=args.mode)
        print(json.dumps({"optimized": args.location, "mode": args.mode}))
    return 0


def cmd_scan(args) -> int:
    from moonlink_spark.table.catalog import load_table
    from moonlink_spark.table.scan import scan, scan_at_lsn

    spark = _spark(args)
    t = load_table(args.location)
    cols = args.columns.split(",") if args.columns else None
    df = (
        scan_at_lsn(spark, t, args.lsn, columns=cols)
        if args.lsn is not None
        else scan(spark, t, columns=cols)
    )
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


def cmd_ingest(args) -> int:
    from moonlink_spark.operators.merge import merge_cdc_batch
    from moonlink_spark.table.catalog import load_table

    spark = _spark(args)
    t = load_table(args.location)
    res = merge_cdc_batch(spark, t, spark.read.parquet(args.batch), args.lsn)
    print(json.dumps({"lsn": args.lsn, "skipped": res.skipped,
                      "metrics": res.metrics}))
    return 0


def cmd_dedupe(args) -> int:
    from moonlink_spark.operators.dedupe import dedupe_table
    from moonlink_spark.table.catalog import load_table

    spark = _spark(args)
    t = load_table(args.location)
    res = dedupe_table(
        spark, t, text_col=args.text_col, strategy=args.strategy,
        min_jaccard=args.min_jaccard, max_hamming=args.max_hamming,
        min_cos=args.min_cos,
    )
    print(json.dumps({"strategy": res.strategy, "removed": res.removed,
                      "skipped": res.skipped}))
    return 0


def cmd_publish(args) -> int:
    """Export a snapshot as a genuine Apache Iceberg v2 table
    (operators/publish.py) — the external-engine interop face."""
    from moonlink_spark.operators.publish import publish_iceberg
    from moonlink_spark.table.catalog import load_table

    spark = _spark(args)
    t = load_table(args.location)
    res = publish_iceberg(spark, t, args.dest, snapshot_id=args.snapshot_id)
    print(
        json.dumps(
            {
                "published": args.dest,
                "metadata": res.metadata_path,
                "snapshot_id": res.snapshot_id,
                "data_files": res.data_files,
                "pos_delete_files": res.pos_delete_files,
                "eq_delete_files": res.eq_delete_files,
            }
        )
    )
    return 0


def cmd_analyze(args) -> int:
    from moonlink_spark.operators.analyze import analyze_table
    from moonlink_spark.table.catalog import load_table

    spark = _spark(args)
    t = load_table(args.location)
    cols = args.columns.split(",") if args.columns else None
    res = analyze_table(spark, t, columns=cols)
    print(
        json.dumps(
            {
                "analyzed": args.location,
                "snapshot_id": res.snapshot_id,
                "row_count": res.row_count,
                "stats_file": res.path,
                "columns": res.columns,
            }
        )
    )
    return 0


def cmd_orphans(args) -> int:
    from moonlink_spark.operators.orphans import remove_orphan_files
    from moonlink_spark.table.catalog import load_table

    t = load_table(args.location)
    r = remove_orphan_files(t, grace_ms=args.grace_ms, dry_run=not args.apply)
    print(json.dumps({"scanned": r.scanned, "referenced": r.referenced,
                      "deleted": r.deleted, "dry_run": r.dry_run}))
    return 0


def cmd_clone(args) -> int:
    from moonlink_spark.operators.clone import clone_table
    from moonlink_spark.table.catalog import load_table

    c = clone_table(load_table(args.src), args.dst)
    print(json.dumps({"cloned": args.src, "to": c.location,
                      "snapshots": len(c.md.snapshots)}))
    return 0


def cmd_rollback(args) -> int:
    from moonlink_spark.table.catalog import load_table

    t = load_table(args.location)
    snap = t.rollback(snapshot_id=args.snapshot_id, lsn=args.lsn)
    print(json.dumps({"rolled_back": args.location,
                      "snapshot_id": snap.snapshot_id,
                      "lsn": t.refresh().flush_lsn}))
    return 0


def cmd_tag(args) -> int:
    from moonlink_spark.table.catalog import load_table
    from moonlink_spark.table.refs import create_tag, drop_ref, list_refs

    t = load_table(args.location)
    if args.drop:
        drop_ref(t, args.name)
        print(json.dumps({"dropped": args.name}))
    elif args.name:
        create_tag(t, args.name, snapshot_id=args.snapshot_id)
        print(json.dumps({"tagged": args.name,
                          "refs": sorted(list_refs(t))}))
    else:
        print(json.dumps({"refs": sorted(list_refs(t))}))
    return 0


def cmd_sync(args) -> int:
    from moonlink_spark.operators.sync import stream_sync, sync_table
    from moonlink_spark.table.catalog import load_table

    spark = _spark(args)
    src, dst = load_table(args.src), load_table(args.dst)
    if args.stream:
        stats = stream_sync(spark, src, dst, args.checkpoint)
        print(json.dumps({"mode": "stream", "batches": stats.batches,
                          "merged": stats.merged, "skipped": stats.skipped}))
    else:
        res = sync_table(spark, src, dst)
        print(json.dumps({"mode": "pull", "from_lsn": res.from_lsn,
                          "to_lsn": res.to_lsn, "skipped": res.skipped,
                          "bootstrapped": res.bootstrapped}))
    return 0


def cmd_optimize_all(args) -> int:
    from moonlink_spark.operators.maintenance import (
        catalog_tables,
        optimize_all,
        store_tables,
    )

    spark = _spark(args)
    if args.catalog:
        from moonlink_spark.table.namespace import FileCatalog

        feed = catalog_tables(FileCatalog(args.catalog))
    else:
        from moonlink_spark.metadata_store import MetadataStore

        feed = store_tables(MetadataStore(args.store))
    results = optimize_all(spark, feed)
    print(
        json.dumps(
            [
                {
                    "table": r.name,
                    "triggered": r.report.triggered if r.report else None,
                    "error": r.error,
                }
                for r in results
            ]
        )
    )
    return 0


def cmd_recover(args) -> int:
    from moonlink_spark.metadata_store import MetadataStore, recover_all_tables

    rec = recover_all_tables(MetadataStore(args.store))
    print(json.dumps([
        {"table": f"{r.entry.database}.{r.entry.table}",
         "flush_lsn": r.flush_lsn, "error": r.error}
        for r in rec
    ], indent=2))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="moonlink_spark")
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] cores (default: SPARK_GRAFT_CPUS or 32)")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("serve");
    s.add_argument("--root", required=True); s.add_argument("--port", type=int, default=0)
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser("create")
    s.add_argument("table"); s.add_argument("--catalog", required=True)
    s.add_argument("--schema", help="JSON StructType file (default: images)")
    s.add_argument("--property", action="append", metavar="K=V")
    s.set_defaults(fn=cmd_create)

    s = sub.add_parser("tables")
    s.add_argument("--catalog", required=True); s.set_defaults(fn=cmd_tables)

    s = sub.add_parser("drop")
    s.add_argument("table"); s.add_argument("--catalog", required=True)
    s.add_argument("--purge", action="store_true"); s.set_defaults(fn=cmd_drop)

    s = sub.add_parser("optimize")
    s.add_argument("location")
    s.add_argument("--mode", default="auto",
                   choices=["auto", "full", "data", "index", "cluster", "expire"])
    s.add_argument("--strategy", default="zorder", choices=["zorder", "hilbert"])
    s.add_argument("--cols", default=None,
                   help="cluster columns, comma-separated (default phash,w,h)")
    s.add_argument("--retain-last", type=int, default=2)
    s.add_argument("--scope-key", default=None,
                   help="spot compaction: restrict to this key's range")
    s.add_argument("--scope-lo", default=None)
    s.add_argument("--scope-hi", default=None)
    s.set_defaults(fn=cmd_optimize)

    s = sub.add_parser("scan")
    s.add_argument("location"); s.add_argument("--columns")
    s.add_argument("--lsn", type=int); s.add_argument("--limit", type=int, default=20)
    s.set_defaults(fn=cmd_scan)

    s = sub.add_parser("ingest")
    s.add_argument("location"); s.add_argument("batch")
    s.add_argument("--lsn", type=int, required=True); s.set_defaults(fn=cmd_ingest)

    s = sub.add_parser("dedupe")
    s.add_argument("location"); s.add_argument("--text-col", required=True)
    s.add_argument("--strategy", default="exact",
                   choices=["exact", "minhash", "phash", "embedding"])
    s.add_argument("--min-jaccard", type=float, default=0.8)
    s.add_argument("--max-hamming", type=int, default=4)
    s.add_argument("--min-cos", type=float, default=0.98)
    s.set_defaults(fn=cmd_dedupe)

    s = sub.add_parser("analyze")
    s.add_argument("location")
    s.add_argument("--columns", default=None)
    s.set_defaults(fn=cmd_analyze)

    s = sub.add_parser("publish")
    s.add_argument("location")
    s.add_argument("dest")
    s.add_argument("--snapshot-id", type=int, default=None)
    s.set_defaults(fn=cmd_publish)

    s = sub.add_parser("orphans")
    s.add_argument("location"); s.add_argument("--apply", action="store_true")
    s.add_argument("--grace-ms", type=int, default=0); s.set_defaults(fn=cmd_orphans)

    s = sub.add_parser("clone")
    s.add_argument("src"); s.add_argument("dst"); s.set_defaults(fn=cmd_clone)

    s = sub.add_parser("rollback")
    s.add_argument("location")
    g = s.add_mutually_exclusive_group(required=True)
    g.add_argument("--snapshot-id", type=int, default=None)
    g.add_argument("--lsn", type=int, default=None)
    s.set_defaults(fn=cmd_rollback)

    s = sub.add_parser("tag")
    s.add_argument("location")
    s.add_argument("name", nargs="?", default=None)
    s.add_argument("--snapshot-id", type=int, default=None)
    s.add_argument("--drop", action="store_true")
    s.set_defaults(fn=cmd_tag)

    s = sub.add_parser("sync")
    s.add_argument("src")
    s.add_argument("dst")
    s.add_argument("--stream", action="store_true",
                   help="drain via the Structured Streaming CDC source")
    s.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (required with --stream)")
    s.set_defaults(fn=cmd_sync)

    s = sub.add_parser("optimize-all")
    g = s.add_mutually_exclusive_group(required=True)
    g.add_argument("--catalog")
    g.add_argument("--store")
    s.set_defaults(fn=cmd_optimize_all)

    s = sub.add_parser("recover")
    s.add_argument("--store", required=True); s.set_defaults(fn=cmd_recover)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""Ingestion daemon entrypoint: ``python -m crest_spark.cli --config c.yaml``.

Process-lifecycle parity with the reference's main
(``/root/reference/cmd/ingestor/main.go:26-54``): load config, start the
pipeline, block until SIGINT/SIGTERM, drain gracefully.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import threading

from crest_spark.config import load_config
from crest_spark.session import get_spark
from crest_spark.streaming.ingest import IngestionService


def maintain(argv: list[str]) -> int:
    """Table-maintenance one-shots: ``python -m crest_spark.cli maintain
    --warehouse W --table ns.tbl [--vacuum-hours H] [--compact N
    [--compact-cluster-by COLS] [--compact-tail]] [--expire-keep K]
    [--export-iceberg]`` — the operational companions (VACUUM /
    OPTIMIZE [ZORDER] / snapshot expiry / Iceberg metadata export) to
    the ingestion daemon."""
    parser = argparse.ArgumentParser(
        prog="crest_spark.cli maintain", description="lakehouse maintenance"
    )
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--table", required=True, help="namespace.table")
    parser.add_argument(
        "--vacuum-hours",
        type=float,
        default=None,
        help="delete orphaned data files older than this many hours",
    )
    parser.add_argument(
        "--compact",
        type=int,
        default=None,
        metavar="N",
        help="compact into N files (full-snapshot rewrite; with "
        "--compact-tail, N sizes only the tail's new run)",
    )
    parser.add_argument(
        "--compact-cluster-by",
        metavar="COLS",
        default=None,
        help="comma-separated columns to range-cluster the compaction "
        "rewrite on (pairs with --compact)",
    )
    parser.add_argument(
        "--compact-tail",
        action="store_true",
        help="tail-only (LSM) compaction: rewrite ONLY files outside "
        "the current sorted/packed runs into a new run, carrying prior "
        "runs by reference — O(accreted tail) cost, never a full-table "
        "rewrite (pairs with --compact [+ --compact-cluster-by])",
    )
    parser.add_argument(
        "--expire-keep",
        type=int,
        default=None,
        metavar="K",
        help="expire history, keeping the last K snapshots",
    )
    parser.add_argument(
        "--export-iceberg",
        action="store_true",
        help="materialize an Iceberg v2 metadata/ directory",
    )
    parser.add_argument(
        "--sync-rest",
        metavar="ENDPOINT",
        default=None,
        help="mirror unseen snapshots into an Iceberg REST catalog "
        "(implies --export-iceberg)",
    )
    parser.add_argument(
        "--set-tag",
        metavar="NAME",
        default=None,
        help="pin a named tag to the current snapshot "
        "(expiry-protected reproducibility point)",
    )
    parser.add_argument(
        "--publish",
        action="store_true",
        help="publish ALL pending staged (write-audit-publish) commits",
    )
    parser.add_argument(
        "--discard-staged",
        action="store_true",
        help="discard ALL pending staged commits (audit rejected)",
    )
    parser.add_argument(
        "--history",
        type=int,
        default=None,
        metavar="N",
        help="print the last N commits (DESCRIBE HISTORY, log-only)",
    )
    parser.add_argument(
        "--create-branch",
        metavar="NAME",
        default=None,
        help="fork an append-only branch ref from the current snapshot",
    )
    parser.add_argument(
        "--fast-forward",
        metavar="NAME",
        default=None,
        help="land a branch's commits on main in one commit",
    )
    parser.add_argument(
        "--drop-branch",
        metavar="NAME",
        default=None,
        help="abandon a branch ref (files reclaimed by expire+vacuum)",
    )
    parser.add_argument(
        "--add-constraint",
        metavar="NAME=EXPR",
        default=None,
        help="add a CHECK constraint (validates existing rows, then "
        "gates every future write)",
    )
    parser.add_argument(
        "--drop-constraint",
        metavar="NAME",
        default=None,
        help="remove a CHECK constraint by name",
    )
    parser.add_argument(
        "--rebuild-indexes",
        action="store_true",
        help="staged drift rebuild for a vector index table (--table "
        "names the INDEX): when accumulated drift exceeds the "
        "recluster threshold stamped at build time, re-fit + re-encode "
        "off the ingest path and publish atomically — concurrent "
        "micro-batches keep committing; their adds are repaired into "
        "the new index (delta-bounded) before the conditional publish",
    )
    parser.add_argument(
        "--rebuild-threshold",
        type=float,
        default=None,
        metavar="F",
        help="override the stamped drift threshold (fraction of the "
        "index changed since the last build; default 0.5)",
    )
    parser.add_argument(
        "--rebuild-source",
        metavar="NS.TABLE",
        default=None,
        help="source embedding table for an IVF-PQ rebuild (codes "
        "hold no floats); defaults to the binding the ingest loop "
        "stamped at build time",
    )
    parser.add_argument(
        "--rebuild-force",
        action="store_true",
        help="rebuild even when drift is at-or-below the threshold",
    )
    args = parser.parse_args(argv)
    namespace, _, name = args.table.partition(".")
    if not name:
        parser.error("--table must be namespace.table")
    if args.compact is None and (
        args.compact_tail or args.compact_cluster_by
    ):
        # fail loudly: exiting 0 with no rewrite would let an operator
        # believe tail maintenance ran while the backlog keeps
        # accreting (review r13)
        parser.error(
            "--compact-tail/--compact-cluster-by require --compact N"
        )
    if not args.rebuild_indexes and (
        args.rebuild_threshold is not None
        or args.rebuild_source
        or args.rebuild_force
    ):
        # same fail-loud rule as --compact-tail: a silently ignored
        # rebuild flag would let an operator believe the index was
        # maintained while drift keeps accreting
        parser.error(
            "--rebuild-threshold/--rebuild-source/--rebuild-force "
            "require --rebuild-indexes"
        )

    from crest_spark.lakehouse import LakehouseCatalog

    table = LakehouseCatalog(args.warehouse).table(name, namespace)
    if args.set_tag:
        v = table.set_tag(args.set_tag)
        print(f"tag: {args.set_tag} -> v{v}", file=sys.stderr)
    if args.publish:
        v = table.publish_staged()
        print(
            f"publish: committed v{v}" if v else "publish: nothing staged",
            file=sys.stderr,
        )
    if args.discard_staged:
        v = table.discard_staged()
        print(
            f"discard: committed v{v}" if v else "discard: nothing staged",
            file=sys.stderr,
        )
    if args.create_branch:
        v = table.create_branch(args.create_branch)
        print(f"branch: created {args.create_branch} at v{v}", file=sys.stderr)
    if args.fast_forward:
        v = table.fast_forward(args.fast_forward)
        print(
            f"branch: fast-forwarded {args.fast_forward} -> v{v}"
            if v
            else f"branch: {args.fast_forward} had no commits (ref dropped)",
            file=sys.stderr,
        )
    if args.drop_branch:
        v = table.drop_branch(args.drop_branch)
        print(f"branch: dropped {args.drop_branch} at v{v}", file=sys.stderr)
    if args.add_constraint:
        cname, sep, cexpr = args.add_constraint.partition("=")
        if not sep or not cname or not cexpr:
            parser.error("--add-constraint needs NAME=EXPR")
        spark = get_spark("crest-spark-maintain")
        v = table.add_constraint(spark, cname, cexpr)
        print(f"constraint: added {cname!r} at v{v}", file=sys.stderr)
    if args.drop_constraint:
        v = table.drop_constraint(args.drop_constraint)
        print(
            f"constraint: dropped {args.drop_constraint!r} at v{v}",
            file=sys.stderr,
        )
    if args.history is not None:
        # log-only: no SparkSession needed for an ops query this small
        for s in table.snapshots()[-max(1, args.history):]:
            staged = " staged" if s.extra.get("staged") else ""
            print(
                f"v{s.version} {s.operation}{staged} rows={s.num_rows} "
                f"files={len(s.files)} writer={s.writer_id} "
                f"batch={s.batch_id}",
                file=sys.stderr,
            )
    if args.compact is not None:
        spark = get_spark("crest-spark-maintain")
        cluster = (
            [c.strip() for c in args.compact_cluster_by.split(",") if c.strip()]
            if args.compact_cluster_by
            else None
        )
        v = table.compact(
            spark,
            target_partitions=args.compact,
            cluster_by=cluster,
            cluster_partitions=args.compact if cluster else None,
            tail_only=args.compact_tail,
        )
        print(f"compact: committed v{v}", file=sys.stderr)
    if args.rebuild_indexes:
        from crest_spark.operators.vector_index import rebuild_if_drifted

        cat = LakehouseCatalog(args.warehouse)
        src_t = None
        if args.rebuild_source:
            sns, _, sname = args.rebuild_source.partition(".")
            if not sname:
                parser.error("--rebuild-source must be namespace.table")
            src_t = cat.table(sname, sns)
        spark = get_spark("crest-spark-maintain")
        v = rebuild_if_drifted(
            spark,
            table,
            catalog=cat,
            source_table=src_t,
            threshold=args.rebuild_threshold,
            force=args.rebuild_force,
        )
        print(
            f"rebuild: committed v{v}"
            if v is not None
            else "rebuild: drift at-or-below threshold (no-op)",
            file=sys.stderr,
        )
    if args.expire_keep is not None:
        expired = table.expire_snapshots(keep_last=args.expire_keep)
        print(f"expire: dropped {len(expired)} snapshots", file=sys.stderr)
    if args.vacuum_hours is not None:
        removed = table.vacuum(older_than_s=args.vacuum_hours * 3600.0)
        print(f"vacuum: removed {len(removed)} orphans", file=sys.stderr)
    if args.export_iceberg:
        from crest_spark.lakehouse.iceberg_export import export_iceberg_metadata

        out = export_iceberg_metadata(table)
        print(f"iceberg: exported {out}", file=sys.stderr)
    if args.sync_rest:
        from crest_spark.lakehouse.iceberg_export import sync_to_rest
        from crest_spark.lakehouse.rest_catalog import RestCatalogClient

        pushed = sync_to_rest(table, RestCatalogClient(args.sync_rest))
        print(f"rest: pushed snapshots {pushed}", file=sys.stderr)
    return 0


def query(argv: list[str]) -> int:
    """Ad-hoc query entry: run a registered operator by name, or raw
    SQL with the standard tables (and any lakehouse tables under
    --warehouse) registered as views. Output is JSON lines on stdout —
    the composable shape for piping into jq or a file. This is the
    user-facing switch path from the reference: every operator a crest
    deployment's warehouse users run is invocable from the shell."""
    parser = argparse.ArgumentParser(
        prog="crest_spark query", description="run a named query or SQL"
    )
    parser.add_argument("--name", help="registered query name")
    parser.add_argument("--sql", help="raw SQL over the registered views")
    parser.add_argument("--list", action="store_true",
                        help="list registered query names and exit")
    parser.add_argument(
        "--sf-dir", default="/root/testdata/sf0.01",
        help="parquet table directory (standard table names become views)",
    )
    parser.add_argument("--warehouse",
                        help="lakehouse root; its tables become views")
    parser.add_argument("--limit", type=int, default=0,
                        help="cap output rows (0 = no cap)")
    args = parser.parse_args(argv)
    from crest_spark.registry import load_all

    specs = load_all()
    if args.list:
        for name in sorted(specs):
            print(name)
        return 0
    if bool(args.name) == bool(args.sql):
        parser.error("exactly one of --name / --sql is required")
    if args.name and args.name not in specs:
        parser.error(f"unknown query {args.name!r} (see --list)")
    spark = get_spark("crest-spark-query")
    spark.sparkContext.setLogLevel("ERROR")
    if args.name:
        df = specs[args.name].fn(spark, args.sf_dir)
    else:
        from crest_spark.sources.tables import TABLE_NAMES, load_table

        for t in TABLE_NAMES:
            path = os.path.join(args.sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        if args.warehouse:
            from crest_spark.lakehouse import LakehouseCatalog

            cat = LakehouseCatalog(args.warehouse)
            for ns in cat.list_namespaces():
                for name in cat.list_tables(ns):
                    cat.table(name, namespace=ns).read(
                        spark
                    ).createOrReplaceTempView(name)
        df = spark.sql(args.sql)
    if args.limit:
        df = df.limit(args.limit)
    for line in df.toJSON().toLocalIterator():
        print(line)
    return 0


def curate(argv: list[str]) -> int:
    """Config-first curation pipeline: ``python -m crest_spark.cli
    curate recipe.yaml`` — composes the certified curation operators
    (dedup / quality gate / decontamination / DSIR / PII scrub /
    packing) over a documents source per the recipe, writes a curated
    lakehouse table with provenance columns, and prints ONE JSON report
    line (per-stage row counts) on stdout."""
    import json

    import yaml

    parser = argparse.ArgumentParser(
        prog="crest_spark.cli curate", description="run a curation recipe"
    )
    parser.add_argument("recipe", help="YAML recipe path")
    args = parser.parse_args(argv)
    with open(args.recipe) as fh:
        recipe = yaml.safe_load(fh) or {}
    from crest_spark.curation_recipe import run_recipe

    spark = get_spark("crest-spark-curate")
    spark.sparkContext.setLogLevel("ERROR")
    report = run_recipe(spark, recipe)
    print(json.dumps(report))
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "maintain":
        return maintain(argv[1:])
    if argv and argv[0] == "query":
        return query(argv[1:])
    if argv and argv[0] == "curate":
        return curate(argv[1:])
    parser = argparse.ArgumentParser(description="crest_spark ingestion service")
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument(
        "--once",
        action="store_true",
        help="drain all available input and exit (availableNow)",
    )
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    spark = get_spark("crest-spark-ingest")

    listener = None
    if cfg.metrics.enabled:
        from crest_spark.streaming import metrics

        listener = metrics.attach(spark, cfg.metrics.collection_path)

    def detach_listener():
        # progress callbacks are async; give them a beat to flush, then
        # detach BEFORE the py4j gateway closes (avoids teardown noise)
        if listener is not None:
            import time

            time.sleep(2)
            spark.streams.removeListener(listener)

    metadata_catalog = None
    if cfg.catalog.type == "rest":
        from crest_spark.lakehouse.rest_catalog import catalog_from_config

        metadata_catalog = catalog_from_config(
            "rest", warehouse=cfg.catalog.warehouse, endpoint=cfg.catalog.endpoint
        )

    svc = IngestionService(spark, cfg.ingest, metadata_catalog=metadata_catalog)

    if args.once:
        svc.run_once()
        detach_listener()
        return 0

    stop = threading.Event()

    def handle(signum, frame):
        print(f"signal {signum}: draining...", file=sys.stderr)
        stop.set()

    signal.signal(signal.SIGINT, handle)
    signal.signal(signal.SIGTERM, handle)

    svc.start()
    stop.wait()
    svc.stop()
    detach_listener()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

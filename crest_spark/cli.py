"""Ingestion daemon entrypoint: ``python -m crest_spark.cli --config c.yaml``.

Process-lifecycle parity with the reference's main
(``/root/reference/cmd/ingestor/main.go:26-54``): load config, start the
pipeline, block until SIGINT/SIGTERM, drain gracefully.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from crest_spark.config import load_config
from crest_spark.session import get_spark
from crest_spark.streaming.ingest import IngestionService


def main(argv: list[str] | None = None) -> int:
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

#!/usr/bin/env python
"""spark-submit entry point for the CDC replay job (north_rule deployment
form: ``spark-submit --py-files cht_sync_spark.zip scripts/submit_replay.py``).

Packaging + submit recipe for a real multi-executor cluster:

    cd /root/repo && zip -r /tmp/cht_sync_spark.zip cht_sync_spark
    spark-submit \
      --master <cluster-master> \
      --deploy-mode client \
      --num-executors <N> --executor-cores 8 --executor-memory 12g \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      --py-files /tmp/cht_sync_spark.zip \
      scripts/submit_replay.py \
      --feed <feed dir[,dir...]> --table <landing path> \
      [--lineage <lineage path>] [--mode mor|cow] [--batch-size 500000]
      [--models] [--tailing 5s]

The job body is identical to what the tests/benches drive: the only
local-mode-specific piece anywhere is the master URL (session.py). On a
cluster, N -> 4N scaling means more executors; the engine's work units
(feed partitions x seq-range micro-batches, bucket-parallel writes) are
already partitioned to saturate them (see BENCH/BASELINE.md for the
simulated-executor evidence).

Running under plain ``python`` (this sandbox) works too: SparkSession falls
back to the local master from cht_sync_spark.session.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True, help="feed dir, comma-separated for partitions")
    ap.add_argument("--table", required=True)
    ap.add_argument("--lineage", default=None)
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    ap.add_argument("--batch-size", type=int, default=500_000)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--models", action="store_true", help="maintain the built-in typed models")
    ap.add_argument("--tailing", default=None, help="poll interval (e.g. '5 seconds'); default drain-and-stop")
    ap.add_argument("--compact", action="store_true", help="compact deltas after the drain (mor)")
    ap.add_argument("--maintenance-every", type=int, default=None,
                    help="fold deltas + expire snapshots + vacuum every N applied batches")
    ap.add_argument("--sources", default=None,
                    help="comma-separated source names (static config, db.js:45 analogue)")
    ap.add_argument("--discover-sources", action="store_true",
                    help="opt into the O(feed) DISTINCT discovery scan when --sources is omitted")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit an active session already exists with the cluster
    # master; standalone runs fall back to the tuned local factory
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from cht_sync_spark.session import get_spark

        spark = get_spark("cht_sync_replay")

    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    models = []
    if args.models:
        from cht_sync_spark.operators.models import CONVERSATIONS, TOOL_CALLS

        models = [
            (CONVERSATIONS, args.table.rstrip("/") + "_conversations"),
            (TOOL_CALLS, args.table.rstrip("/") + "_tool_calls"),
        ]

    feed = ChangesFeedSource(
        spark, args.feed.split(","),
        sources=args.sources.split(",") if args.sources else None,
        discover_sources=args.discover_sources,
    )
    pipe = ReplayPipeline(
        spark, feed, args.table,
        batch_size=args.batch_size, num_buckets=args.num_buckets,
        mode=args.mode, lineage_path=args.lineage, models=models,
        maintenance_every=args.maintenance_every,
    )
    import time

    while True:
        results = pipe.run()
        if args.mode == "mor" and args.compact and results:
            pipe.table.compact()
        print(json.dumps({
            "batches": len(results),
            "events": sum(r.rows for r in results),
            "watermark": pipe.state()[0],
        }), flush=True)
        if args.tailing is None:
            break
        time.sleep(float(args.tailing.split()[0].rstrip("s")))


if __name__ == "__main__":
    main()

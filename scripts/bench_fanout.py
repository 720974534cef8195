#!/usr/bin/env python
"""Executor-style scaling bench: N vs 4N worker PROCESSES.

The single-JVM protocol (scripts/bench_scaling.py) scales threads inside
one JVM — but a real cluster grows from N to 4N executors by adding whole
JVMs, each with its own heap, GC, shuffle manager and write path. This
bench simulates exactly that: the change feed is split by
``pmod(xxhash64(conv_id), P)`` — the engine's own partitioning rule
(SURVEY.md §4: same-key events always co-partition, so per-partition
replay is order-correct and the union of the per-partition tables is the
partitioned table) — and each partition is replayed by an independent
``local[8]`` worker process into its own table shard.

  N  = 1 worker  x local[8]  (replays the whole feed)
  4N = 4 workers x local[8]  (each replays its hash quarter, concurrently)

  efficiency = (events_per_sec@4N / events_per_sec@N) / 4

Trials are interleaved and the best trial per level is kept (this host is
a shared VM with double-digit hypervisor steal; see BENCH/BASELINE.md).

Usage: python -m scripts.bench_fanout [--trials 3] [--events 3000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMP = os.environ.get("SPARK_GRAFT_BENCH_TMP", "/tmp/cht_sync_bench")
# Mutable benchmark state (tables, shuffle) lives on tmpfs: on a real
# cluster every added executor brings its own local disk, so disk bandwidth
# scales with N — on this single box the one virtual disk does NOT scale
# and would masquerade as an engine bottleneck. The input feed stays on
# disk (read-only, page-cached after first touch).
STATE = os.environ.get("SPARK_GRAFT_BENCH_STATE", "/dev/shm/cht_sync_bench")
CORES_PER_WORKER = int(os.environ.get("SPARK_GRAFT_FANOUT_CORES", "8"))
FEED_PARTS = 4  # fixed feed partition count, assigned round-robin to workers


def worker(nparts: int, part: int, feed_root: str, mode: str, run_id: str) -> None:
    """One simulated executor: replays its assigned feed partitions.

    The feed is pre-split into FEED_PARTS directories by
    ``pmod(xxhash64(conv_id), FEED_PARTS)`` (same-conv events co-partition,
    so per-slice LWW replay is exact — SURVEY.md §4); a worker is assigned
    FEED_PARTS/nparts of them, the way Kafka partitions or the reference's
    per-database watchers (S8) are assigned to consumers.
    """
    sys.path.insert(0, REPO)
    from cht_sync_spark.session import get_spark
    from cht_sync_spark.sources.changes import ChangesFeedSource
    from cht_sync_spark.sources.feedgen import feed_sources
    from cht_sync_spark.streaming.pipeline import ReplayPipeline

    os.makedirs(os.path.join(STATE, "local"), exist_ok=True)
    spark = get_spark(
        f"fanout{part}", cores=CORES_PER_WORKER,
        extra_conf={"spark.local.dir": os.path.join(STATE, "local", f"w{part}")},
    )
    # --models: maintain the model DAG (conversations -> conv_profiles)
    # inside every shard replay, so the scaling evidence covers the FULL
    # job, not just the landing ingest. Model shards co-partition with the
    # feed split (both hash conv_id), so per-shard model maintenance is
    # exact — the same argument that makes per-shard landing replay exact.
    with_models = os.environ.get("SPARK_GRAFT_FANOUT_MODELS") == "1"

    def _models(root: str):
        if not with_models:
            return []
        from cht_sync_spark.operators.models import CONV_PROFILES, CONVERSATIONS

        return [(CONVERSATIONS, os.path.join(root, "conversations")),
                (CONV_PROFILES, os.path.join(root, "conv_profiles"))]
    my_slices = [
        os.path.join(feed_root, f"part={s}")
        for s in range(FEED_PARTS)
        if s % nparts == part
    ]

    # warm pass: replay the worker's own first slice end-to-end into a
    # throwaway table (full-size batches -> every plan shape reaches JIT
    # steady state), so the timed pass measures warm throughput at BOTH
    # levels equally
    wdir = os.path.join(STATE, f"fw_{run_id}_{part}")
    shutil.rmtree(wdir, ignore_errors=True)
    wp = ReplayPipeline(
        spark,
        ChangesFeedSource(spark, os.path.join(feed_root, f"part={part % FEED_PARTS}"), sources=feed_sources()),
        os.path.join(wdir, "t"), batch_size=500_000, num_buckets=16, mode=mode,
        models=_models(wdir), model_mode=mode,
    )
    wp.run()
    if mode == "mor":
        wp.table.compact()
        for m in wp.models:
            m.table.compact()

    tdir = os.path.join(STATE, f"f_{run_id}_{part}")
    shutil.rmtree(tdir, ignore_errors=True)
    # The unit of work is a FEED-PARTITION REPLAY: one pipeline + one table
    # shard per feed partition (per-partition sequence checkpoints,
    # SURVEY.md §4; the union of shards is the partitioned table). A worker
    # drains its assigned partitions sequentially — so the N=1 level
    # executes EXACTLY the same work units as the 4N level, one at a time,
    # and efficiency measures parallel execution alone (strong scaling over
    # an identical task queue, the way one executor vs four drain four
    # Kafka partitions / the reference's per-database watchers, S8).
    pipes = [
        ReplayPipeline(
            spark, ChangesFeedSource(spark, s, sources=feed_sources()), os.path.join(tdir, f"shard{i}"),
            batch_size=500_000, num_buckets=16, mode=mode,
            models=_models(os.path.join(tdir, f"shard{i}")), model_mode=mode,
        )
        for i, s in enumerate(my_slices)
    ]
    print(f"READY {part}", flush=True)
    # wait for the coordinator's go signal so warmup never overlaps timing
    for line in sys.stdin:
        if line.strip() == "GO":
            break
    t0 = time.monotonic()
    n = 0
    batch_s = 0.0
    compact_s = 0.0
    nbatches = 0
    for pipe in pipes:
        res = pipe.run()
        if mode == "mor":
            c0 = time.monotonic()
            pipe.table.compact()
            for m in pipe.models:
                m.table.compact()
            compact_s += time.monotonic() - c0
        n += sum(r.rows for r in res)
        batch_s += sum(r.duration_ms for r in res) / 1000
        nbatches += len(res)
    sec = time.monotonic() - t0
    # fixed_s = the per-batch DRIVER overhead the r2 verdict flagged
    # (plan + manifest/commit bookkeeping + inter-job gaps), isolated from
    # the amortizable end-of-slice compaction
    print(
        "WORKER_DONE "
        + json.dumps({
            "part": part, "rows": n, "sec": round(sec, 2),
            "slices": len(pipes), "batches": nbatches,
            "batch_s": round(batch_s, 2),        # time inside run_batch
            "compact_s": round(compact_s, 2),    # end-of-slice compaction
            "fixed_s": round(sec - batch_s - compact_s, 2),
            "fixed_per_batch_s": round((sec - batch_s - compact_s) / max(nbatches, 1), 3),
            "other_s": round(sec - batch_s, 2),  # compact + fixed (legacy)
        }),
        flush=True,
    )
    shutil.rmtree(tdir, ignore_errors=True)
    shutil.rmtree(wdir, ignore_errors=True)


def _cpu_ticks() -> list[int]:
    return [int(x) for x in open("/proc/stat").readline().split()[1:9]]


def run_level(nparts: int, feed_path: str, mode: str, run_id: str, n_events: int) -> dict:
    procs = []
    for p in range(nparts):
        # cgroup-style isolation per simulated executor: pin to its own 8
        # CPUs and size the JVM's internal pools to them
        lo = p * CORES_PER_WORKER
        env = dict(os.environ,
                   SPARK_GRAFT_ACTIVE_PROCS=str(CORES_PER_WORKER),
                   SPARK_GRAFT_DRIVER_MEM="12g",
                   SPARK_GRAFT_JVM_OPTS="-Xms12g -XX:+AlwaysPreTouch")
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", f"{lo}-{lo + CORES_PER_WORKER - 1}",
                 sys.executable, "-m", "scripts.bench_fanout", "--worker",
                 str(nparts), str(p), feed_path, mode, run_id],
                cwd=REPO, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True, env=env,
            )
        )
    # wait until every worker is warmed and parked at the barrier
    for pr in procs:
        for line in pr.stdout:
            if line.startswith("READY"):
                break
    t0 = time.monotonic()
    ticks0 = _cpu_ticks()
    for pr in procs:
        pr.stdin.write("GO\n")
        pr.stdin.flush()
    results = []
    for pr in procs:
        for line in pr.stdout:
            if line.startswith("WORKER_DONE "):
                results.append(json.loads(line.removeprefix("WORKER_DONE ")))
                break
        pr.wait(timeout=600)
    wall = time.monotonic() - t0
    d = [a - b for a, b in zip(_cpu_ticks(), ticks0)]
    # hypervisor steal share of the level's non-idle CPU time: this is host
    # oversubscription (a shared-VM artifact), not engine serialization —
    # reported so the efficiency numbers can be read against it
    nonidle = sum(d) - d[3]
    steal_share = round(d[7] / nonidle, 3) if nonidle else 0.0
    if len(results) != nparts or any(pr.returncode != 0 for pr in procs):
        raise RuntimeError(f"fanout level {nparts} failed: {results}")
    # throughput numerator = RAW feed events (identical at every level);
    # per-worker "rows" are post-LWW upserts and vary with batch layout
    return {"workers": nparts, "events": n_events, "wall_sec": round(wall, 2),
            "events_per_sec": round(n_events / wall, 1), "steal_share": steal_share,
            "rows_upserted": sum(r["rows"] for r in results), "per_worker": results}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5], sys.argv[6])
        return

    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--events", type=int, default=3_000_000)
    ap.add_argument("--mode", type=str, default="mor")
    ap.add_argument("--models", action="store_true",
                    help="maintain the conversations->conv_profiles model DAG "
                         "in every shard replay (scaling evidence for the "
                         "full job, not just the landing ingest)")
    args = ap.parse_args()
    if args.models:
        os.environ["SPARK_GRAFT_FANOUT_MODELS"] = "1"

    # materialize the warm feed + the hash-partitioned main feed (untimed)
    from scripts.bench_scaling import _feed  # noqa: E402
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from cht_sync_spark.session import get_spark

    spark = get_spark("fanout_gen", cores=8)
    _feed(spark, 60_000, "warm")
    flat_path, n_events = _feed(spark, args.events, "main")
    feed_path = f"{flat_path}_p{FEED_PARTS}"
    marker = os.path.join(feed_path, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(feed_path, ignore_errors=True)
        flat = spark.read.parquet(flat_path)
        conv = F.substring_index(F.col("id"), ":", 1)
        for p in range(FEED_PARTS):
            (
                flat.where(F.pmod(F.xxhash64(conv), F.lit(FEED_PARTS)) == p)
                .repartitionByRange(8, "seq")
                .sortWithinPartitions("seq")
                .write.mode("overwrite")
                .parquet(os.path.join(feed_path, f"part={p}"))
            )
        open(marker, "w").write("ok")
    spark.stop()

    # Serve the (read-only) feed from tmpfs for the timed levels: the 4N
    # level's JVM teardown (4 x 12g AlwaysPreTouch heaps) evicts the feed
    # from the page cache, so disk-backed N trials that follow a 4N trial
    # read cold from the single shared virtual disk — a host artifact that
    # depressed N and made per-trial "efficiency" exceed 1. On a real
    # cluster the input comes from distributed storage whose bandwidth
    # scales with the executor count; pinning the input in memory is the
    # faithful equivalent (same argument as table state on tmpfs above).
    shm_feed = os.path.join(STATE, os.path.basename(feed_path))
    if not os.path.exists(os.path.join(shm_feed, "_DONE")):
        shutil.rmtree(shm_feed, ignore_errors=True)
        shutil.copytree(feed_path, shm_feed)
    feed_path = shm_feed

    trials: dict[int, list[dict]] = {1: [], 4: []}
    for t in range(args.trials):
        for nparts in (1, 4):
            print(f"=== trial {t}: {nparts} worker(s) x local[{CORES_PER_WORKER}] ===", flush=True)
            r = run_level(nparts, feed_path, args.mode, f"t{t}", n_events)
            trials[nparts].append(r)
            print(json.dumps(r), flush=True)

    best = {k: max(v, key=lambda r: r["events_per_sec"]) for k, v in trials.items()}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    suffix = ("" if args.mode == "mor" else f"_{args.mode}") + (
        "_models" if args.models else ""
    )
    out_path = os.path.join(REPO, "BENCH", f"fanout{suffix}.json")
    # POOL with any prior recorded run on the identical feed: the documented
    # methodology keeps every raw trial (nothing discarded) so both summary
    # statistics can be recomputed from the arrays. A fresh run must not
    # silently overwrite history.
    all_n = [r["events_per_sec"] for r in trials[1]]
    all_4 = [r["events_per_sec"] for r in trials[4]]
    try:
        with open(out_path) as fh:
            prior = json.load(fh)
        if prior.get("events") == n_events:
            all_n = prior["all_trials"]["1"] + all_n
            all_4 = prior["all_trials"]["4"] + all_4
            for lvl, key in ((1, "N"), (4, "4N")):
                if prior[key]["events_per_sec"] > best[lvl]["events_per_sec"]:
                    best[lvl] = prior[key]
    except (FileNotFoundError, KeyError, json.JSONDecodeError):
        pass
    # Per-trial pairing: each trial's N and 4N run back-to-back, so slow
    # hypervisor windows hit both sides of a pair; the median of per-trial
    # efficiencies is the robust estimate on this shared host. Best-of
    # throughputs are reported alongside as the peak-capacity numbers.
    per_trial_eff = [round((b / a) / 4, 3) for a, b in zip(all_n, all_4)]
    se = sorted(per_trial_eff)
    med = round(
        (se[len(se) // 2] + se[(len(se) - 1) // 2]) / 2, 3
    )
    eff = round((best[4]["events_per_sec"] / best[1]["events_per_sec"]) / 4, 3)
    report = {
        "protocol": f"worker processes x local[{CORES_PER_WORKER}], feed hash-partitioned by conv_id",
        "mode": args.mode,
        "events": n_events,
        "N": best[1],
        "4N": best[4],
        "all_trials": {"1": all_n, "4": all_4},
        "per_trial_efficiency": per_trial_eff,
        # PRIMARY statistic: each trial's N and 4N run back-to-back, so a
        # slow hypervisor window hits both sides of a pair — the median of
        # per-trial ratios is robust to host noise (BENCH/BASELINE.md).
        "efficiency": med,
        "efficiency_median": med,
        # best-ever-N vs best-ever-4N across the WHOLE pool — cross-window
        # and unpaired, so a single lucky N trial (one worker on an
        # otherwise-idle box: full turbo + uncontended memory bandwidth)
        # skews it in either direction; reported for completeness.
        "efficiency_peak_pool": eff,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({"efficiency_median": med, "efficiency_peak_pool": eff,
                      "N_eps": best[1]["events_per_sec"],
                      "4N_eps": best[4]["events_per_sec"]}))


if __name__ == "__main__":
    main()

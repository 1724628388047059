"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {"trip_rollup": sec, ...}, "sf": 0.1}

Each query is forced through full execution with the ``noop`` sink
(materializes every row, no collect-to-driver, no disk write) — the
number measures the Spark plan, not pandas conversion.

Each query runs ``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and
reports the per-query p50, so round-over-round deltas are signal, not
JIT/IO noise; ``queries_min`` carries the best run for reference — in
the SIDECAR artifacts only (bench_last_run.json + the dated record):
the r13 stdout line with 100 queries + 100 queries_min entries outgrew
the driver's bounded stdout tail and cost r14 its entire round-over-
round PERF comparison (VERDICT r14 "What's wrong" #2), so the stdout
line now carries ``queries`` only.

Host-load gating (VERDICT r14 "What's wrong" #3): the r14 driver bench
ran on a loaded host and nothing noticed, manufacturing 8 phantom
regressions.  The code-independent canaries are now a GATE, not just a
telemetry field: the suite re-runs up to $SPARK_GRAFT_BENCH_RETRIES
(default 1) extra times when the post-suite canary sits above
tolerance vs the best canary recorded in .benchmarks/ history, and the
printed record carries ``load_suspect`` either way so a contaminated
run can never masquerade as clean.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from peskas_mozambique_data_pipeline_spark import registry
from peskas_mozambique_data_pipeline_spark.session import get_spark

# a run counts as load-suspect when its canary exceeds the best canary
# ever recorded on this checkout by this factor (the r14 loaded run was
# 1.75× the clean-run canary; a quiet host repeats within ~1.2×)
_CANARY_TOL = 1.5


def _canary_once(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(30_000_000).select(
        F.sum(F.xxhash64("id") % 997).alias("s")
    ).collect()
    return time.perf_counter() - t0


def _canary_mc_once(spark) -> float:
    # multicore canary (VERDICT r12 Next #5): forces a real shuffle
    # across every core, so its ratio tracks multicore tenant load the
    # single-thread canary can't see
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(12_000_000)
        .withColumn("k", F.xxhash64("id") % 256)
        .repartition(64, "k")
        .groupBy("k")
        .agg(F.sum(F.xxhash64("id", "k") % 997).alias("s"))
        .select(F.sum("s"))
        .collect()
    )
    return time.perf_counter() - t0


def _best_recorded_canary(runs_dir: str) -> float | None:
    """Reference canary from the committed .benchmarks history — the
    code-independent measure of 'what a quiet run of this host class
    looks like'.  The MEDIAN OF THE 5 FASTEST rather than the single
    minimum: quiet-host canaries cluster (0.10-0.18 observed) while one
    unusually fast sample would otherwise tighten the gate until every
    ordinary quiet run flags load-suspect.  None when no history
    carries a canary."""
    vals = []
    for path in glob.glob(os.path.join(runs_dir, "bench_run_*.json")):
        try:
            with open(path) as f:
                c = json.load(f).get("canary_sec")
        except Exception:
            continue
        if isinstance(c, (int, float)) and c > 0:
            vals.append(c)
    if not vals:
        return None
    vals.sort()
    head = vals[:5]
    return head[len(head) // 2]


def _run_suite(spark, sf_dir: str, n_runs: int, trace_every: int = 25):
    """One full timed pass over the registry: p50 + min per query.
    The timed region (query build incl. eager checkpoints + noop-sink
    full execution) is unchanged from every prior round.

    ``canary_trace``: the pre/post canaries straddle the whole ~15 min
    suite, so a load window that opens and closes MID-run is invisible
    to them (observed 2026-08-18: a clean-canary run where one
    contiguous registry stretch p50'd 3-5x its isolated cost).  A
    single-thread canary sampled every ``trace_every`` queries costs
    ~0.1 s each and pins any such window to a position in the run; the
    retry gate uses the trace's worst point too.
    """
    import gc

    timings: dict[str, float] = {}
    best: dict[str, float] = {}
    trace: list[float] = []
    for i, (name, fn) in enumerate(registry.SPARK_QUERIES.items()):
        if trace_every and i and i % trace_every == 0:
            trace.append(round(_canary_once(spark), 3))
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # release driver references so the ContextCleaner can drop
        # localCheckpoint blocks between queries — without this the
        # checkpoint-backed queries' blocks accumulate across the suite
        # and inflate later queries' times
        gc.collect()
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)  # p50
        best[name] = round(runs[0], 3)
    return timings, best, trace


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not first-touch costs
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            registry._t(spark, sf_dir, t).count()
        except Exception:
            pass

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    n_retries = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "1")))

    here = os.path.dirname(os.path.abspath(__file__))
    runs_dir = os.path.join(here, ".benchmarks")
    best_hist = _best_recorded_canary(runs_dir)

    # canary-gated suite loop: take the attempt whose post-suite canary
    # is within tolerance of the best recorded; if none qualifies, keep
    # the attempt with the best canary and label it load-suspect
    attempts = []
    for attempt in range(1 + n_retries):
        canary = round(min(_canary_once(spark) for _ in range(3)), 3)
        timings, best, trace = _run_suite(spark, sf_dir, n_runs)
        # re-measure AFTER the suite too: load arriving mid-run is the
        # failure mode the pre-suite canary can't see.  The mid-suite
        # trace is OBSERVABILITY ONLY (sidecar): its samples run while
        # the suite's own background cleanup (ContextCleaner, GC) is
        # active, which elevates them ~1.5-2x on a provably quiet host
        # — gating on them would misfire retries; use them to ATTRIBUTE
        # per-row outliers to a load window, not to re-run
        canary_post = round(min(_canary_once(spark) for _ in range(3)), 3)
        canary_mc = round(min(_canary_mc_once(spark) for _ in range(3)), 3)
        worst = max(canary, canary_post)
        ref = best_hist if best_hist is not None else worst
        suspect = worst > _CANARY_TOL * ref
        attempts.append((worst, suspect, canary, canary_post, canary_mc,
                         trace, timings, best))
        if not suspect:
            break
        print(
            f"bench: attempt {attempt + 1} load-suspect "
            f"(canary {worst} vs best recorded {ref}); "
            + ("retrying" if attempt < n_retries else "out of retries"),
            file=sys.stderr,
        )
    attempts.sort(key=lambda a: a[0])
    (_, suspect, canary, canary_post, canary_mc, trace, timings,
     best) = attempts[0]

    total = round(sum(timings.values()), 3)
    line = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_min": round(sum(best.values()), 3),
        "runs_per_query": n_runs,
        "stat": "p50",
        # fixed-workload host-speed references (seconds; lower = faster
        # host).  Compare rounds as (query_sec / canary_sec) ratios;
        # canary_post_sec is the same workload re-measured after the
        # suite so mid-run load shows up too.
        "canary_sec": canary,
        "canary_post_sec": canary_post,
        "canary_mc_sec": canary_mc,
        # true when even the best attempt's canary sat above tolerance
        # vs the reference .benchmarks-recorded canary — treat per-query
        # numbers from such a run as upper bounds, not measurements
        "load_suspect": suspect,
        # true when a MID-suite canary sample sat far above the quiet
        # reference (2.5x — mid-suite samples read ~1.2-1.9x high even
        # when quiet, from the suite's own background cleanup): the
        # end canaries were clean but a load window opened mid-run, so
        # per-row outliers in this record are attributable to load.
        # Recorded, not retried — the retry gate stays on the
        # end-canary calibration
        "trace_suspect": bool(
            trace
            and best_hist is not None
            and max(trace) > 2.5 * best_hist
        ),
        "sf": sf,
    }
    # the driver captures a bounded stdout tail — keep the stdout line
    # COMPACT (queries only, no queries_min: the r13 line with both
    # maps outgrew the tail and broke PERF_r14's comparison) so it
    # always parses whole; the full artifact incl. per-query minima
    # goes to the sidecar files.  Every run writes a DATED record
    # (bench_run_<utc-timestamp>.json) so successive runs never
    # overwrite each other's numbers; bench_last_run.json stays as the
    # stable-name copy the tooling reads.
    artifact = dict(line)
    artifact["queries_min"] = best
    # sidecar-only (keep the stdout line compact): the mid-suite canary
    # samples, one per 25 queries, for attributing per-row outliers to
    # host-load windows the end canaries straddle
    artifact["canary_trace"] = trace
    stamp = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime())
    os.makedirs(runs_dir, exist_ok=True)
    for path in (
        os.path.join(runs_dir, f"bench_run_{stamp}.json"),
        os.path.join(here, "bench_last_run.json"),
    ):
        with open(path, "w") as f:
            json.dump(artifact, f, indent=2)
    spark.stop()
    print(json.dumps(line, separators=(",", ":")))


if __name__ == "__main__":
    main()

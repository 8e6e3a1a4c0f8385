#!/usr/bin/env python
"""Benchmark harness.

Plain run: full KG pipeline (pages → tables → triples → materialize) over a
deterministic synthetic corpus sized to $GRAFT_SF_DIR, plus representative
query timings over the testdata tables.  Prints ONE JSON line on stdout:

  {"metric": "kg_pipeline_e2e", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "triples": N,
   "triples_per_sec": N}

``--scaling``: runs the plain bench twice in fresh processes at
RAY_GRAFT_CPUS=8 and =32 over the same input and reports
efficiency = (t8/t32)/(32/8)  (1.0 = linear scaling).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary", "revenue_by_nation", "top_orders",
    "events_hourly_window", "token_counts", "exact_dedup", "quality_filter",
    "user_sessions", "top_orders_per_segment", "ann_topk",
]


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from mannheimsearchjoinsengine_ray.pipelines import kg
    from mannheimsearchjoinsengine_ray.pipelines.queries import QUERIES, corpus_for

    # corpus generation is not part of the measurement; also warms page cache
    corpus = corpus_for(SF_DIR)

    # untimed warmup: start Ray worker processes so the measured run reflects
    # pipeline compute, not one-time process spin-up (constant at every
    # parallelism level, which would otherwise distort the scaling ratio)
    import ray.data as rd

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 2) \
        .map_batches(lambda b: b, batch_format="pyarrow").materialize()

    out_dir = f"/tmp/graft_bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    metrics = kg.run_full(corpus, out_dir, num_shards=1,
                          partitions_per_shard=max(8, NUM_CPUS * 2))
    e2e = time.perf_counter() - t0
    n_triples = metrics["final_rows"]

    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_pipeline_e2e",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / e2e, 1),
        "phase_sec": {k: round(v, 2) for k, v in metrics.items()
                      if k.endswith("_sec")},
    }


def _canary_inner() -> float:
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mannheimsearchjoinsengine_ray.pipelines.queries import corpus_for
    from mannheimsearchjoinsengine_ray.stages.extract import TableExtractor

    corpus = corpus_for(SF_DIR)
    t = pq.read_table(corpus, columns=["url", "html"]).slice(0, 1500)
    t0 = time.perf_counter()
    TableExtractor()(t)
    return round(time.perf_counter() - t0, 2)


def machine_canary() -> float:
    """Single-process extract of a fixed 1500-page slice in a FRESH
    subprocess — a machine-speed probe recorded around every scaling leg.
    This container's throughput varies >1.4x across minutes (external
    co-tenancy, BASELINE.md #23); reference ~3.4s on a fast machine.  The
    subprocess matters: in-process repeats warm the worker-lifetime
    type-guess memo and read ~40% fast, which would skew the per-leg
    normalization the probe exists for."""
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--canary"], capture_output=True, text=True,
                         check=True, env=dict(os.environ))
    return float(out.stdout.strip().splitlines()[-1])


def run_scaling() -> dict:
    pin = shutil.which("taskset") is not None and \
        os.environ.get("GRAFT_SCALE_PIN", "1") != "0"

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        # larger input for the scaling runs: fixed per-stage overheads
        # (actor startup, shuffle scheduling, driver-side final merges)
        # amortize, so the measurement reflects the compute/shuffle scaling,
        # not constant costs.  128k pages after the round-4 optimizations
        # halved both legs' wall time (the constants became a third of the
        # 16-cpu leg at 64k; the scaling criterion models the 100 TB regime
        # where per-query constants are noise)
        env.setdefault("GRAFT_BENCH_PAGES", "128000")
        cmd = [sys.executable, os.path.abspath(__file__)]
        # HARD-pin the whole process tree (driver + raylet + workers +
        # object-store threads) to ncpu cores.  ray.init(num_cpus=N) only
        # caps TASK SLOTS — Ray's system threads still borrow idle cores,
        # which let the 4-CPU leg run 117-136s depending on machine
        # idleness (unpinned efficiency band 0.68-0.81).  Affinity makes
        # each leg a true N-core box, which is the point of the
        # two-cluster-size emulation.
        if pin:
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # 4 vs 16: a 4x parallelism factor that stays within this container's
    # ~16 PHYSICAL cores (num_cpus=32 oversubscribes logical CPUs and cannot
    # be 4x of 8 on this hardware; see BASELINE.md measurement protocol)
    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    # Bracket each leg with the single-process canary: this container's
    # underlying speed drifts >1.4x across MINUTES (external co-tenancy,
    # BASELINE.md #23), i.e. between the two legs of one run — which is why
    # raw two-leg ratios scattered 0.69-1.13 (superlinear = impossible ⇒
    # measurement noise, not scaling).  Each leg's wall time is normalized by
    # the mean of its bracketing canaries relative to the first canary, so
    # both legs are expressed at the SAME machine speed before the ratio.
    c0 = machine_canary()
    lo = one(lo_n)
    c1 = machine_canary()
    hi = one(hi_n)
    c2 = machine_canary()
    eff_raw = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    lo_norm = lo["value"] * c0 / ((c0 + c1) / 2)
    hi_norm = hi["value"] * c0 / ((c1 + c2) / 2)
    eff_norm = (lo_norm / hi_norm) / (hi_n / lo_n)
    canaries = [c0, c1, c2]
    return {
        "metric": "kg_pipeline_scaling",
        "canary_sec": canaries,
        "canary_stable": max(canaries) / min(canaries) <= 1.15,
        "pinned": pin,
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"tps_{lo_n}": lo["triples_per_sec"],
        f"tps_{hi_n}": hi["triples_per_sec"],
        "cpus": [lo_n, hi_n],
        "scaling_efficiency": round(eff_norm, 3),
        "scaling_efficiency_raw": round(eff_raw, 3),
        "sf": SF_DIR,
        "triples": hi["triples"],
    }


if __name__ == "__main__":
    if "--canary" in sys.argv:
        print(_canary_inner())
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

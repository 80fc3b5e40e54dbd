"""Benchmark harness (driver contract + SURVEY §6).

Plain run:     python bench.py         → ONE JSON line on stdout
Scaling run:   python bench.py --scaling
               → runs the headline job twice in FRESH processes
                 (num_cpus=8 then 32, same input), reports throughputs +
                 efficiency, writes BENCH/scaling_run.json (the curated
                 multi-run summary BENCH/BASELINE.md is updated manually).

Headline = flagship E1 filter pipeline (extract → langid → ppl → rules →
scrub → dedup → partitioned write) over a deterministic synthetic pages
corpus (seed=42), plus representative operator timings over
$GRAFT_SF_DIR (default /root/testdata/sf0.1).

This script OWNS its Ray session (library code never calls ray.init).
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
BENCH_DOCS = int(os.environ.get("DG_BENCH_DOCS", "100000"))
CORPUS = f"/tmp/dg_bench/pages_n{BENCH_DOCS}_s42"  # directory of parquet shards


def ensure_corpus() -> str:
    """Generate the bench corpus once: a DIRECTORY of parquet shards
    (parallel reads — a single big file caps the read at one task),
    deterministic content per row index regardless of sharding."""
    if os.path.isdir(CORPUS) and os.listdir(CORPUS):
        return CORPUS
    import pyarrow as pa
    import ray.data

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures.gen import pages_table_for_ids

    def gen(batch: pa.Table) -> pa.Table:
        return pages_table_for_ids(batch.column("id").to_pylist())

    tmp_dir = CORPUS + ".tmpdir"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    (
        ray.data.range(BENCH_DOCS, override_num_blocks=64)
        .map_batches(gen, batch_format="pyarrow", batch_size=2048)
        .write_parquet(tmp_dir)
    )
    os.replace(tmp_dir, CORPUS)
    return CORPUS


def _probe_spin(stop_at: float, started) -> None:
    with started.get_lock():
        started.value += 1
    x = 0
    while time.time() < stop_at:
        x += 1


def host_probe(n_procs: int, seconds: float = 2.0) -> dict:
    """Host-contention evidence embedded in the bench artifact: spin
    ``n_procs`` busy processes and sample /proc/stat during — on this
    shared sandbox CPU STEAL is near 0 when idle but has been measured
    at 40%+ the moment the VM goes wide (hypervisor contention), which
    moves every wall time here by 1.5-2x run-to-run.  Reporting
    steal/idle-under-load alongside the timings lets a reader separate
    host weather from code regressions."""
    import multiprocessing as mp

    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))

    procs = []
    try:
        la0 = open("/proc/loadavg").read().split()[0]
        stop_at = time.time() + seconds + 3.0
        started = mp.Value("i", 0)
        procs = [mp.Process(target=_probe_spin, args=(stop_at, started))
                 for _ in range(n_procs)]
        for p in procs:
            p.start()
        # sample only once every spinner is live (forking 32 procs from
        # a heavy driver can take >0.3 s; sampling early reads as idle)
        t_wait = time.time() + 2.5
        while started.value < n_procs and time.time() < t_wait:
            time.sleep(0.02)
        a = snap()
        time.sleep(seconds)
        b = snap()
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d) or 1
        names = ["user", "nice", "sys", "idle", "iowait", "irq",
                 "softirq", "steal"]
        pct = {n: round(100.0 * v / tot, 1) for n, v in zip(names, d)}
        return {"steal_pct_under_load": pct["steal"],
                "idle_pct_under_load": pct["idle"],
                "work_pct_under_load": round(
                    pct["user"] + pct["nice"] + pct["sys"], 1),
                "loadavg_before_probe": float(la0)}
    except Exception as e:  # non-linux / restricted /proc: omit, don't fail
        return {"error": str(e)}
    finally:
        # ALWAYS reap the spinners — a probe failure must not leave
        # n_procs busy loops burning into the timings it brackets
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join()


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # one fused actor stage does ~80% of the compute; the per-operator
    # reservation allocator would hand it only a fraction of the CPUs
    ctx.op_resource_reservation_enabled = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from dataguards_ray.pipeline import FilterPipeline

    corpus = ensure_corpus()
    # warm OS page cache (measure compute+shuffle, not first disk read):
    # stream the raw shard BYTES — warms the cache for every column with
    # no Arrow decode and no driver-RAM spike
    for name in sorted(os.listdir(corpus)):
        with open(os.path.join(corpus, name), "rb") as fh:
            while fh.read(1 << 24):
                pass

    out_dir = f"/tmp/dg_bench/out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # FIXED pool size: Ray's actor-pool autoscaler ramps far too slowly
    # (measured 2× wall vs a fixed pool); N-2 leaves scheduling slots for
    # the read / sort / write task ops (a full-width pool deadlocks the
    # downstream sort).
    conc = max(2, NUM_CPUS - 2)
    host_pre = host_probe(NUM_CPUS)  # bracket the flagship: contention
    # best-of-2 (the standard achievable-throughput estimator on a
    # shared host whose steal arrives in waves — scaling mode already
    # uses best-of-3); both raw walls are reported alongside.
    # (scaling mode spawns this script with DG_SKIP_QUERIES=1 and does
    # its own best-of-3 — don't nest repeats there)
    n_reps = 1 if os.environ.get("DG_SKIP_QUERIES") else 2
    flagship_runs = []
    for _ in range(n_reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        recs = FilterPipeline(concurrency=conc).run(corpus, out_dir)
        flagship_runs.append(round(time.time() - t0, 3))
    flagship_sec = min(flagship_runs)
    n_in = sum(r["input_rows"] for r in recs)

    queries = {"flagship_filter": round(flagship_sec, 3)}
    if not os.environ.get("DG_SKIP_QUERIES"):
        qs = entrymod.queries()
        for name in ("tpch_q1", "window_tumbling_events", "window_hopping_events",
                     "dedup_docs_exact", "knn_embeddings", "cfd_violations",
                     "minhash_near_dups", "minhash_near_dups_digest",
                     "asof_click_purchase",
                     "median_price_by_priority", "tpch_q5_shape",
                     "dense_rank_cust_balance", "span_dedup_docs",
                     "interval_overlap_click_view", "event_row_number",
                     "tpch_q18_shape", "substring_dedup_docs",
                     "embedding_dedup", "model_quality_scores",
                     "ppl_buckets", "decontaminate_docs",
                     "token_budget_sample", "sample_mixture_docs",
                     "dsir_resample_docs", "tpch_q7_shape",
                     "tpch_q8_shape", "tpch_q21_shape",
                     "line_dedup_docs", "semdedup_embeddings",
                     "semdedup_incremental", "simhash_dedup_docs",
                     "multimodal_video_frames"):
            t0 = time.time()
            res = qs[name](SF_DIR)
            if hasattr(res, "materialize"):
                res.materialize()
            queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "flagship_filter_sec",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": n_in,
        "docs_per_sec": round(n_in / flagship_sec, 1),
        "flagship_runs": flagship_runs,
        "host_before": host_pre,
        "host_after": host_probe(NUM_CPUS),
    }
    ray.shutdown()
    return result


def _hw_unit(_):
    import numpy as np

    a = np.random.rand(1000, 1000)
    for _ in range(4):
        (a @ a).sum()
    return 1


def _hw_ceiling(lo_n: int, hi_n: int) -> float:
    """Measured hardware scaling ceiling: a fixed, embarrassingly
    parallel pure-CPU workload (numpy matmuls, zero coordination) run at
    both process counts.  On this sandbox the 32 vCPUs are SMT threads
    over ~16 physical cores with ~10% steal: pure CPU work scales only
    ~2.3× from 8→32 procs (ceiling ≈ 0.58 of linear).  Any pipeline's
    raw T_lo/(k·T_hi) is bounded by this; we report efficiency both raw
    and normalized by the ceiling (the cluster-relevant number — on a
    real N→4N node cluster every node brings full cores)."""
    import multiprocessing as mp

    tasks = hi_n * 6
    walls = {}
    for nproc in (lo_n, hi_n):
        with mp.Pool(nproc) as p:
            t0 = time.time()
            p.map(_hw_unit, range(tasks))
            walls[nproc] = time.time() - t0
    return (walls[lo_n] / walls[hi_n]) / (hi_n / lo_n)


def run_scaling() -> dict:
    # larger corpus for the scaling criterion: fixed per-run costs
    # (session spin-up, thin-pass groupbys, actor-pool ramp) must be
    # small relative to streamed compute, as they would be on a real
    # multi-node corpus
    docs = os.environ.get("DG_SCALING_DOCS", "300000")

    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), DG_BENCH_DOCS=docs,
                   DG_SKIP_QUERIES="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best of 3: single-node wall times vary ±25% run-to-run in this
        # sandbox (shared host); min wall is the standard estimator of
        # achievable throughput
        runs = [run_once(ncpu) for _ in range(3)]
        return min(runs, key=lambda r: r["value"])

    # warm once (corpus generation + page cache) outside the timed runs
    subprocess.run([sys.executable, os.path.abspath(__file__)],
                   env=dict(os.environ, RAY_GRAFT_CPUS="32", DG_BENCH_DOCS=docs,
                            DG_SKIP_QUERIES="1"),
                   capture_output=True, text=True, check=True)
    # 32 first: its wall is the sensitive term and host noise grows with
    # sustained load on this shared sandbox.  The hardware ceiling is
    # itself ±0.15 noisy — sample it before AND after the pipeline runs
    # and use the mean.
    ceiling_pre = _hw_ceiling(8, 32)
    hi, lo = run(32), run(8)
    ceiling = (ceiling_pre + _hw_ceiling(8, 32)) / 2.0
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    result = {
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "hw_ceiling_8_to_32": round(ceiling, 3),
        "normalized_efficiency": round(min(eff / ceiling, 1.0), 3),
        "bench_docs": lo["bench_docs"],
        # host-steal evidence from the best run at each level (the
        # subprocesses embed probes in their own JSON)
        "host_8": lo.get("host_after"),
        "host_32": hi.get("host_after"),
    }
    os.makedirs("BENCH", exist_ok=True)
    # machine-readable record of the latest run; BENCH/BASELINE.md is the
    # curated multi-run summary (append runs there manually)
    with open("BENCH/scaling_run.json", "w") as f:
        json.dump(result, f)
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

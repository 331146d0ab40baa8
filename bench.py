"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra modes:
  python bench.py --scaling   # run pipeline at local[8] vs local[32],
                              # report docs/sec + scaling efficiency
                              # (BASELINE.md two-cluster-size evidence)
"""

from __future__ import annotations

import json
import os
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "doc_textstats",
    "doc_gates",
    "doc_langid_stopword",
    "dedup_exact",
    "doc_pii_counts",
    "events_hourly",
]


def _consume(df) -> int:
    """Force full execution without driver-side materialization cost."""
    return df.count()


def run_headline() -> dict:
    from dataprof_spark import queries as q
    from dataprof_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    reg = q.registry()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once
    _consume(reg["q1_pricing_summary"][0](spark, SF_DIR))
    for name in HEADLINE:
        fn, _sql = reg[name]
        t0 = time.perf_counter()
        _consume(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
    # full pipeline (UDF stages) once, reported as its own entry
    import __spark_entry__ as entry_mod

    t0 = time.perf_counter()
    n_docs = _consume(entry_mod._pipeline_decisions(spark, SF_DIR))
    pipe_s = time.perf_counter() - t0
    timings["pipeline_decisions"] = round(pipe_s, 3)
    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else SF_DIR
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec": round(n_docs / pipe_s, 1) if pipe_s else None,
        "cpus": CPUS,
    }
    spark.stop()
    return result


def run_scaling(out_path: str = "BENCH/BASELINE.md") -> dict:
    """Same pipeline job at local[8] and local[32] on identical input;
    efficiency = (T8/T32)/4 (ideal 4× speedup → 1.0)."""
    import subprocess

    results = {}
    for n in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(n), BENCH_MODE="pipeline")
        out = subprocess.run(
            [sys.executable, __file__, "--pipeline-once"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        results[n] = json.loads(out.stdout.strip().splitlines()[-1])
    t8, t32 = results[8]["value"], results[32]["value"]
    d8, d32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = (d32 / d8) / 4 if d8 else None
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3) if eff else None,
        "unit": "ratio",
        "t_local8_sec": t8,
        "t_local32_sec": t32,
        "docs_per_sec_8": d8,
        "docs_per_sec_32": d32,
        "sf": results[32]["sf"],
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling evidence\n\n"
            "Same pipeline job (full decisions incl. langid/perplexity/"
            "scrub UDFs), same input, two parallelism levels (the "
            "sandbox stand-in for N vs 4N executors per BASELINE.md).\n\n"
            f"| master | wall (s) | docs/sec |\n|---|---|---|\n"
            f"| local[8] | {t8} | {d8} |\n"
            f"| local[32] | {t32} | {d32} |\n\n"
            f"**Scaling efficiency (docs/sec ratio ÷ 4): "
            f"{summary['value']}** (target ≥ 0.8)\n"
        )
    return summary


def run_pipeline_once() -> dict:
    """One pipeline run at the current CPU count (used by --scaling)."""
    from dataprof_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name=f"bench_pipe_{CPUS}", master=f"local[{CPUS}]")
    # warm-up: JVM, Arrow, Python workers — excluded from measurement
    entry_mod._pipeline_decisions(spark, SF_DIR).count()
    t0 = time.perf_counter()
    n = entry_mod._pipeline_decisions(spark, SF_DIR).count()
    dt = time.perf_counter() - t0
    spark.stop()
    return {
        "metric": "pipeline_wall",
        "value": round(dt, 3),
        "unit": "sec",
        "docs_per_sec": round(n / dt, 1),
        "sf": 0.1 if "sf0.1" in SF_DIR else SF_DIR,
        "cpus": CPUS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--pipeline-once" in sys.argv:
        print(json.dumps(run_pipeline_once()))
    else:
        print(json.dumps(run_headline()))

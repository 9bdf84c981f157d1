#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--pipeline-only: run the KG-construction pipeline on a synthetic corpus
and print docs/sec (used as the subprocess worker for --scaling).

--scaling: run the pipeline at local[8] (N) and local[32] (4N) in fresh
subprocesses (cold JVM each) on the identical corpus and report both
throughputs + efficiency (T_8/T_32)/4 — the sandbox stand-in for the
north rule's N vs 4N executor criterion (see BASELINE.md protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "top_suppliers_per_nation",
    "lineitem_rollup",
    "events_daily",
    "events_sessionization",
    "events_running_total",
    "kg_mention_counts",
    "kg_cooccurrence_edges",
    "kg_connected_components",
    "kg_transitive_closure",
    "dedup_lsh_banded",
    "dedup_jaccard",
    "ann_cosine_scores",
    "text_quality",
    "text_token_stats",
    "text_fingerprint",
]


def _sf_from_dir(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def _materialize(df) -> int:
    # noop sink: computes every column (count() would let Catalyst prune)
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_headline(sf_dir: str, master: str | None) -> dict:
    from kbase_cdm_ontologies_spark.queries import queries
    from kbase_cdm_ontologies_spark.session import get_spark

    spark = get_spark(app_name="bench", master=master)
    qs = queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan+JIT)
        t0 = time.time()
        _materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
    }


def run_pipeline_bench(pages: int, master: str | None, seed: int = 42) -> dict:
    from kbase_cdm_ontologies_spark.plans.pipeline import run_pipeline
    from kbase_cdm_ontologies_spark.session import get_spark
    from kbase_cdm_ontologies_spark.sources.corpus import (
        CorpusSpec,
        corpus_to_spark,
        generate_corpus,
    )

    spark = get_spark(app_name="bench-pipeline", master=master)
    corpus = generate_corpus(CorpusSpec(seed=seed, n_pages=pages))
    pages_df, stmts, _ = corpus_to_spark(spark, corpus)
    pages_df = pages_df.repartition(spark.sparkContext.defaultParallelism).cache()
    pages_df.count()  # corpus materialized before the clock starts
    t0 = time.time()
    out = run_pipeline(spark, pages_df, stmts)
    n_edges = out["edges"].count()
    _materialize(out["mentions"])
    wall = time.time() - t0
    return {
        "pages": pages,
        "edges": n_edges,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(pages / wall, 2),
        "triples_per_sec": round(n_edges / wall, 2),
        "master": master or "default",
    }


def run_scaling(pages: int) -> dict:
    results = {}
    for label, n in [("N(8)", 8), ("4N(32)", 32)]:
        proc = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--pipeline-only", "--pages", str(pages),
                "--master", f"local[{n}]",
            ],
            capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[label] = json.loads(line)
    t8 = results["N(8)"]["wall_sec"]
    t32 = results["4N(32)"]["wall_sec"]
    eff = round((t8 / t32) / 4, 3)
    return {
        "pages": pages,
        "N(8)": results["N(8)"],
        "4N(32)": results["4N(32)"],
        "scaling_efficiency": eff,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pages", type=int, default=int(os.environ.get("BENCH_PAGES", "5000")))
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    if args.pipeline_only:
        print(json.dumps(run_pipeline_bench(args.pages, args.master)))
        return 0
    if args.scaling:
        print(json.dumps(run_scaling(args.pages)))
        return 0

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report = run_headline(sf_dir, args.master)
    # cheap pipeline throughput probe folded into the same session budget
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Reference parity: run the engine's entail() on the REFERENCE'S OWN
merged statements table and score it against the reference's golden
entailed_edge output (the north rule's "P/R >= 0.95 vs reference",
measured on the reference's own data rather than a fixture).

  python scripts/reference_parity.py \
      [--statements /root/reference/outputs_test/parquet_files/statements.parquet] \
      [--golden /root/reference/outputs_test/parquet_files/entailed_edge.parquet]

Semantics notes (mirroring the reference's semsql build, which runs
`robot remove --axioms "equivalent disjoint annotation abox type"` and
`robot filter --exclude-terms <semsql exclude list>` before
relation-graph — see notebooks/workflow.ipynb):
- the input reduction is emulated by operators/robot_min.py:
  equivalence axioms, ABox typing, and the reconstructed semsql
  exclude-terms (grouping relations like RO:0002323) are dropped from
  the input, so precision/recall are UNCONDITIONAL — measured over the
  full predicate inventory with no restriction. The previous
  inventory-restricted precision is still reported as
  `precision_in_inventory` for comparison with older rounds.
Prints one JSON line with precision/recall and writes nothing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable as `python scripts/reference_parity.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--statements",
        default="/root/reference/outputs_test/parquet_files/statements.parquet",
    )
    ap.add_argument(
        "--golden",
        default="/root/reference/outputs_test/parquet_files/entailed_edge.parquet",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument(
        "--distributed",
        action="store_true",
        help="force the distributed property-closure fixpoint "
        "(local_threshold=0) instead of the hybrid driver saturation — "
        "the regime a 100 TB corpus would run",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kbase_cdm_ontologies_spark.operators.closure import entail
    from kbase_cdm_ontologies_spark.operators.robot_min import robot_min
    from kbase_cdm_ontologies_spark.session import get_spark

    spark = get_spark(app_name="reference-parity", master=args.master)
    st = spark.read.parquet(args.statements).withColumn(
        "graph", F.col("graph").cast("string")
    )
    stmts = robot_min(st)
    class_nodes = (
        stmts.where(
            (F.col("predicate") == "rdf:type")
            & (F.col("object") == "owl:Class")
            & ~F.col("subject").startswith("_:")
        )
        .select(F.col("subject").alias("id"))
        .distinct()
    )
    t0 = time.time()
    got_pdf = entail(
        stmts,
        class_nodes,
        property_local_threshold=0 if args.distributed else 2_000_000,
    ).toPandas()  # Arrow batches — collect() pickles 431k rows one by one
    got = set(
        zip(
            got_pdf["subject"].tolist(),
            got_pdf["predicate"].tolist(),
            got_pdf["object"].tolist(),
        )
    )
    wall = round(time.time() - t0, 1)
    gold_pdf = spark.read.parquet(args.golden).toPandas()
    gold = set(
        zip(
            gold_pdf["subject"].tolist(),
            gold_pdf["predicate"].tolist(),
            gold_pdf["object"].tolist(),
        )
    )
    gold_preds = {p for _, p, _ in gold}
    got_f = {t for t in got if t[1] in gold_preds}
    tp = len(got & gold)
    report = {
        "wall_sec": wall,
        "engine_edges": len(got),
        "engine_edges_in_inventory": len(got_f),
        "golden_edges": len(gold),
        "true_positives": tp,
        # UNCONDITIONAL: every engine edge scored, no inventory filter
        "precision": round(tp / len(got), 6) if got else 0.0,
        "recall": round(tp / len(gold), 6) if gold else 0.0,
        "precision_in_inventory": (
            round(len(got_f & gold) / len(got_f), 6) if got_f else 0.0
        ),
    }
    print(json.dumps(report))
    return 0 if report["precision"] >= 0.95 and report["recall"] >= 0.95 else 1


if __name__ == "__main__":
    import sys

    sys.exit(main())

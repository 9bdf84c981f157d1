#!/usr/bin/env python
"""sf1.0 contract check: the DuckDB oracle gate at 10x the bench scale.

The driver's correctness gate runs at sf0.01 and the bench at sf0.1;
nothing had checked oracle equality where the dedup family's candidate
sets get genuinely large. This script:

1. Materializes a deterministic sf1.0 dataset at ``.sf1/`` by
   replicating the driver's sf0.1 tables 10x with
   referential-integrity-preserving key offsets (customer/orders/
   lineitem/part/supplier keys shift together; region/nation are
   dimension-stable; documents/embeddings replicate with id offsets and
   IDENTICAL payloads — so every document gains 9 exact twins and the
   dedup/LSH candidate sets blow up by ~100x, the stress the check is
   for). No external data; same parquet feeds both engines.

2. For the N heaviest contract queries (by BENCH timing): runs the
   Spark query and the DuckDB oracle on the same .sf1 parquet and
   compares row count, sorted column names, and an order-invariant
   content hash. The hash compare is DISTRIBUTED: the DuckDB result is
   shipped into Spark via Arrow and BOTH frames pass the identical
   normalization (columns sorted by name, floating columns formatted
   to 10 significant digits by the same JVM formatter), so multi-
   million-row results never need a driver-side sorted collect.

3. Times each query at sf0.1 and sf1.0 with the bench's noop-sink
   protocol and reports the scale factor (contract: within 2x of
   linear, i.e. sf1_wall <= 20 * sf01_wall).

Writes CORRECTNESS_SF1.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".sf1")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# (table, [(col, offset_key)]) — offset_key names the id space; every
# replica k shifts the column by k * (max(id space)+1)
KEYED = {
    "customer": [("c_custkey", "cust")],
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"), ("l_partkey", "part"), ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "events": [("event_id", "event")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}
STATIC = {"region", "nation"}

QUERY_SET = [
    "dedup_jaccard",
    "dedup_lsh_banded",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_embedding_lsh_bucketed",
    "ann_cosine_scores",
    "kg_connected_components",
    "kg_mentions_operator",
    "q3_shipping_priority",
    "top_suppliers_per_nation",
    "q1_pricing_summary",
    "curie_compact",
]


def generate(spark, replicas: int = 10) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    spaces: dict[str, int] = {}
    src = {t: spark.read.parquet(f"{SF01}/{t}.parquet") for t in TABLES}
    for space, (t, c) in {
        "cust": ("customer", "c_custkey"),
        "order": ("orders", "o_orderkey"),
        "part": ("part", "p_partkey"),
        "supp": ("supplier", "s_suppkey"),
        "event": ("events", "event_id"),
        "doc": ("documents", "doc_id"),
        "vec": ("embeddings", "vec_id"),
    }.items():
        spaces[space] = int(src[t].agg(F.max(c)).collect()[0][0]) + 1
    for t in TABLES:
        out = f"{SF1}/{t}.parquet"
        if os.path.exists(out):
            continue
        df = src[t]
        if t in STATIC:
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for k in range(replicas):
            rep = df
            for col, space in KEYED[t]:
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(k * spaces[space])).cast("long")
                )
            parts.append(rep)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"[gen] {t} -> {out}", file=sys.stderr, flush=True)


def _normalize_for_hash(df):
    """Sorted columns; floating columns formatted to 10 significant
    digits by the JVM formatter — applied IDENTICALLY to the Spark
    result and the Arrow-shipped DuckDB result."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = sorted(df.columns)
    out = []
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            out.append(
                F.when(F.isnan(F.col(c)), F.lit("NaN"))
                .otherwise(F.format_string("%.10g", F.col(c) + F.lit(0.0)))
                .alias(c)
            )
        else:
            out.append(F.col(c).cast("string").alias(c))
    return df.select(*out), cols


def _sig(df):
    from pyspark.sql import functions as F

    n, cols = df.count(), df.columns
    h = df.select(
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")
    ).collect()[0]["h"]
    return n, str(h)


def main() -> int:
    import duckdb

    from kbase_cdm_ontologies_spark.queries import oracle_sql, queries
    from kbase_cdm_ontologies_spark.session import get_spark

    spark = get_spark(app_name="sf1-contract")
    generate(spark)

    con = duckdb.connect()
    # the heaviest oracles (dedup_minhash_pairs) emit ~10^9 rows at
    # sf1: let DuckDB spill instead of dying in-memory
    con.sql("SET temp_directory='/tmp/duck_sf1_tmp'")
    con.sql("SET memory_limit='48GB'")
    for t in TABLES:
        # Spark writes each table as a DIRECTORY of part files
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF1}/{t}.parquet/*.parquet')"
        )
    qs, oracles = queries(), oracle_sql()
    report: dict = {"sf": 1.0, "dir": SF1, "queries": {}}
    for name in QUERY_SET:
        entry: dict = {}
        # --- wall at sf0.1 and sf1.0 (noop sink, min of 2, warm) ---
        for label, d in [("sf01_sec", SF01), ("sf1_sec", SF1)]:
            qs[name](spark, d).write.format("noop").mode("overwrite").save()
            best = None
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                best = min(best or 9e9, time.time() - t0)
            entry[label] = round(best, 3)
        entry["scale_factor"] = round(entry["sf1_sec"] / max(entry["sf01_sec"], 1e-9), 1)
        entry["within_2x_linear"] = bool(entry["scale_factor"] <= 20.0)
        # --- correctness vs DuckDB oracle ---
        got_n, gcols = None, None
        sdf, gcols = _normalize_for_hash(qs[name](spark, SF1))
        got_n, got_h = _sig(sdf)
        # hand the DuckDB result to Spark through parquet, not
        # arrow->pandas: the heaviest results (~10^9 pairs) would need
        # ~2x result size resident in the python process AND again in
        # the JVM via createDataFrame; COPY TO streams, and the
        # distributed normalize+hash never collects it
        t0 = time.time()
        duck_out = os.path.join(SF1, f"_oracle_{name}.parquet")
        con.sql(
            f"COPY ({oracles[name]}) TO '{duck_out}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 1048576)"
        )
        entry["duck_sec"] = round(time.time() - t0, 3)
        ddf_raw = spark.read.parquet(duck_out)
        wcols = sorted(ddf_raw.columns)
        ddf, _ = _normalize_for_hash(ddf_raw)
        want_n, want_h = _sig(ddf)
        import shutil as _sh

        _sh.rmtree(duck_out, ignore_errors=True)
        if os.path.isfile(duck_out):
            os.remove(duck_out)
        entry.update(
            rows=got_n,
            rows_match=bool(got_n == want_n),
            schema_match=bool(gcols == wcols),
            hash_match=bool(got_h == want_h),
        )
        print(f"[q] {name} {json.dumps(entry)}", file=sys.stderr, flush=True)
        report["queries"][name] = entry
    report["all_match"] = all(
        e["rows_match"] and e["schema_match"] and e["hash_match"]
        for e in report["queries"].values()
    )
    report["all_within_2x_linear"] = all(
        e["within_2x_linear"] for e in report["queries"].values()
    )
    with open(os.path.join(ROOT, "CORRECTNESS_SF1.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report))
    return 0 if report["all_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Export stage — the Spark analog of the reference's stages 6-7
(extract_sql_tables_to_tsv.py + create_parquet_files.py): write every
output table as TSV and snappy Parquet under tsv_tables/ and
parquet_files/, and report per-table rows/bytes/compression like
create_parquet_files.py:87-99 does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def sorted_text_sink(df: DataFrame, col: str, out_path: str) -> None:
    """One value per line, globally sorted — the reference's term-list
    sink (analyze_core_ontologies.py:300-310,
    core_onto_unique_external_terms.tsv). Global sort = range shuffle;
    coalesce(1) only because the artifact is a single small file."""
    df.select(F.col(col).cast("string").alias("v")).distinct().orderBy("v").coalesce(
        1
    ).write.mode("overwrite").text(out_path)


def export_tables(tables: dict[str, DataFrame], out_root: str) -> list[dict]:
    """Write each table as TSV + parquet; return the size/compression
    report. Arrays are serialized as |-joined strings in the TSV
    (TSV is a flat format; parquet keeps the true schema)."""
    report = []
    for name, df in tables.items():
        flat = df
        for field in df.schema.fields:
            if field.dataType.typeName() == "array":
                flat = flat.withColumn(field.name, F.concat_ws("|", F.col(field.name)))
        tsv_path = os.path.join(out_root, "tsv_tables", name)
        pq_path = os.path.join(out_root, "parquet_files", name)
        flat.write.mode("overwrite").option("sep", "\t").option("header", True).csv(tsv_path)
        df.write.mode("overwrite").parquet(pq_path)  # snappy default
        tsv_b, pq_b = _dir_bytes(tsv_path), _dir_bytes(pq_path)
        report.append(
            {
                "table": name,
                "rows": df.count(),
                "tsv_bytes": tsv_b,
                "parquet_bytes": pq_b,
                "compression_pct": round(100 * (1 - pq_b / tsv_b), 1) if tsv_b else 0.0,
            }
        )
    return report

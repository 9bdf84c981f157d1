"""Incremental ingest: process only pages not yet seen.

Spark re-expression of the reference's checksum-based skip
(version_tracker.py:111-138 — re-download only when content changed)
at table granularity: a processed-manifest table records
(url, text_sha256) for every page already through the doc pass; a new
batch is anti-joined against it, only the delta runs through the fused
extractor, and results/manifest are appended. With an Iceberg catalog
the manifest is replaced by snapshot-range incremental reads; the logic
is identical.

Changed pages (same url, different content hash) are REPROCESSED and
the manifest row superseded — mirroring the reference's
checksum-mismatch branch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.doc_pipeline import fused_doc_pass
from ..sources.tables import read_table, write_table

MANIFEST_COLS = ("url", "content_sha")


def _page_hashes(pages: DataFrame) -> DataFrame:
    return pages.select("url", F.sha2(F.col("html").cast("binary"), 256).alias("content_sha"))


class IncrementalDocPass:
    """Maintains <root>/findings (fused long-format results) and
    <root>/processed_manifest across incremental batches."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.findings_path = os.path.join(root, "findings")
        self.manifest_path = os.path.join(root, "processed_manifest")

    def _manifest(self) -> DataFrame | None:
        if os.path.exists(self.manifest_path):
            return read_table(self.spark, self.manifest_path)
        return None

    def ingest(self, pages: DataFrame, alias: DataFrame) -> dict:
        """Process the delta of `pages` vs the manifest; returns stats."""
        hashes = _page_hashes(pages)
        manifest = self._manifest()
        if manifest is None:
            delta_urls = hashes
        else:
            delta_urls = hashes.join(manifest, ["url", "content_sha"], "left_anti")
        delta_pages = pages.join(delta_urls.select("url"), "url", "left_semi")

        n_delta = delta_pages.count()
        if n_delta:
            new_findings = fused_doc_pass(delta_pages, alias)
            if os.path.exists(self.findings_path):
                # supersede findings of changed urls, then append delta's
                old = read_table(self.spark, self.findings_path).join(
                    delta_urls.select("url"), "url", "left_anti"
                )
                combined = old.unionByName(new_findings)
            else:
                combined = new_findings
            staging = self.findings_path + ".staging"
            write_table(combined, staging)
            self._swap(staging, self.findings_path)

            new_manifest = hashes if manifest is None else (
                manifest.join(delta_urls.select("url"), "url", "left_anti")
                .unionByName(delta_urls)
            )
            staging_m = self.manifest_path + ".staging"
            write_table(new_manifest, staging_m)
            self._swap(staging_m, self.manifest_path)

        total = read_table(self.spark, self.manifest_path).count()
        return {"delta_pages": n_delta, "total_processed": total}

    def _swap(self, staging: str, final: str) -> None:
        import shutil

        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(staging, final)

    def findings(self) -> DataFrame:
        return read_table(self.spark, self.findings_path)

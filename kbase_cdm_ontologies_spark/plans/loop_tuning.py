"""Per-round shuffle-partition tuning for iterative fixpoint loops.

The closure/CC loops checkpoint every round, and a checkpointed frame
keeps the partition count of the shuffle that produced it — so with the
session default (sized for corpus-scale scans, e.g. 32 on local[32])
every dictionary-scale round schedules default-many tasks per stage
even when the whole frame is a few hundred thousand rows. The per-task
work is microseconds; the wall is pure scheduling. Measured on the
reference corpus (430k-row property fixpoint, local[32]): the forced
distributed regime drops 58 s -> 48 s when per-round shuffles run at 8
partitions instead of 32, with identical results.

``ShufflePartitionTuner`` sets ``spark.sql.shuffle.partitions`` from
the DRIVER-KNOWN row count of the loop's accumulated relation (the
per-round action returns it for free) before each round's action, and
restores the session value afterwards. The mapping targets
``TARGET_ROWS`` rows per partition, floored at ``MIN_PARTS`` (keep
some parallelism for stragglers) and capped at the session default —
so a genuinely large loop (2.5M+ links in the dense-graph benches) is
untouched, and AQE's runtime coalescing still applies on top.

This is a driver-side conf flip per round (no jobs, no data movement)
and composes with the stats-reset cuts in ``plans/stats_cut.py``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_KEY = "spark.sql.shuffle.partitions"


class ShufflePartitionTuner:
    """Scope-bound tuner: ``with ShufflePartitionTuner(spark) as t:``
    then ``t.tune(n_rows)`` before each round's action. Restores the
    session conf on exit (including on error)."""

    TARGET_ROWS = 64_000
    MIN_PARTS = 8

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._saved = spark.conf.get(_KEY)
        self._default = int(self._saved)
        self._current = self._default

    def tune(self, n_rows: int | None) -> None:
        if n_rows is None:
            return
        n = max(
            self.MIN_PARTS,
            min(self._default, n_rows // self.TARGET_ROWS + 1),
        )
        if n != self._current:
            self.spark.conf.set(_KEY, str(n))
            self._current = n

    def restore(self) -> None:
        if self._current != self._default:
            self.spark.conf.set(_KEY, self._saved)
            self._current = self._default

    def __enter__(self) -> "ShufflePartitionTuner":
        return self

    def __exit__(self, *exc) -> None:
        self.restore()

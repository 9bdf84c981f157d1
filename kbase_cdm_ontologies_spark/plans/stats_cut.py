"""Lineage cuts that also reset Catalyst's size estimate.

Iterative DataFrame loops (semi-naive closure, connected components)
cut lineage with ``localCheckpoint`` every round. Spark's checkpoint,
however, PRESERVES the child plan's estimated statistics on the new
``LogicalRDD`` leaf (``originStats``), and the size-only estimator
multiplies children's ``sizeInBytes`` at every join
(``SizeInBytesOnlyStatsPlanVisitor.visitJoin``). A loop that joins the
previous round's checkpoint therefore DOUBLES the estimate's bit-length
every round: after k rounds the "size" is a BigInteger of ~2^k bits,
and each planning pass runs Karatsuba/Toom-Cook multiplication over it.

Measured on the reference corpus (429k-row property fixpoint, 32-core
local mode): inner rounds grew 2 s -> 4 s -> 9 s -> 23 s -> ... -> 367 s
on SHRINKING deltas, a jstack during the 546 s round showed all 32
executor threads parked and one driver thread pegged inside
``BigInteger.multiplyToomCook3`` under
``SizeInBytesOnlyStatsPlanVisitor.default``. The same fixpoint with
stats-reset cuts runs every round in ~1 s flat.

``cut(df)`` = ``localCheckpoint`` + rebuild the DataFrame from the
checkpointed RDD (JVM-side ``internalCreateDataFrame`` — an
``RDD[InternalRow]`` wrap, no Python round-trip, no copy). The rebuilt
leaf carries no ``originStats``; its estimate falls back to
``spark.sql.defaultSizeInBytes`` (one 63-bit long), so per-round plans
stay flat forever. Planning-time auto-broadcast of cut frames is
disabled by the conservative default size, but every loop here runs
under AQE, which re-plans joins from ACTUAL shuffle sizes at runtime
(and explicit ``F.broadcast`` hints are unaffected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# capability probe result: None = untested, True/False after the probe.
# The rebuild uses the classic-mode JVM handle (`_jdf`) and the
# package-private-in-Scala (public-in-bytecode) internalCreateDataFrame
# — absent under Spark Connect and conceivably renamed in a future
# Spark. The API's availability is probed ONCE against a trivial
# literal frame, so a frame-specific error in a real plan is never
# mistaken for a missing API (which would silently disable the stats
# reset engine-wide and reintroduce the BigInteger blow-up).
_CAPABLE: bool | None = None


def _rebuild(ck: DataFrame) -> DataFrame:
    jdf = ck._jdf
    spark = ck.sparkSession
    fresh = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return DataFrame(fresh, spark)


def _probe(spark) -> bool:
    global _CAPABLE
    if _CAPABLE is None:
        try:
            probe = spark.range(1).localCheckpoint(eager=False)
            _rebuild(probe).schema  # force the JVM round-trip
            _CAPABLE = True
        except Exception:
            import warnings

            _CAPABLE = False
            warnings.warn(
                "stats_cut: JVM DataFrame rebuild unavailable "
                "(Spark Connect or API drift) — iterative closures fall "
                "back to plain localCheckpoint; deep fixpoints may hit "
                "the Catalyst size-estimate blow-up documented in "
                "plans/stats_cut.py",
                RuntimeWarning,
                stacklevel=3,
            )
    return _CAPABLE


def cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """localCheckpoint + stats reset (see module docstring).

    eager=False matches localCheckpoint's lazy mode: the checkpoint
    materializes with the first action that touches the frame (in the
    closure loops, the per-round frontier count).

    Falls back (with a RuntimeWarning, once per process) to the plain
    checkpoint when the JVM rebuild path is unavailable, where the
    estimator pathology cannot be fixed from the client side anyway.
    Errors raised for a specific frame on a capable runtime propagate —
    they are real plan failures, not capability misses."""
    ck = df.localCheckpoint(eager=eager)
    if not _probe(df.sparkSession):
        return ck
    return _rebuild(ck)

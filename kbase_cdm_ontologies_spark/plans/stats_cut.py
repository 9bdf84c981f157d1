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

# capability probe result: None = untested, True/False after first call.
# The rebuild uses the classic-mode JVM handle (`_jdf`) and the
# package-private-in-Scala (public-in-bytecode) internalCreateDataFrame
# — absent under Spark Connect and conceivably renamed in a future
# Spark. Probe once, and on failure degrade to the plain checkpoint
# everywhere instead of retrying (and re-raising) per round.
_CAPABLE: bool | None = None


def cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """localCheckpoint + stats reset (see module docstring).

    eager=False matches localCheckpoint's lazy mode: the checkpoint
    materializes with the first action that touches the frame (in the
    closure loops, the per-round frontier count).

    Falls back to the plain checkpoint when the JVM rebuild path is
    unavailable (Spark Connect / future API drift), where the estimator
    pathology cannot be fixed from the client side anyway."""
    global _CAPABLE
    ck = df.localCheckpoint(eager=eager)
    if _CAPABLE is False:
        return ck
    try:
        jdf = ck._jdf
        spark = ck.sparkSession
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        out = DataFrame(fresh, spark)
        _CAPABLE = True
        return out
    except Exception:
        if _CAPABLE:  # worked before — this failure is real, surface it
            raise
        _CAPABLE = False
        return ck

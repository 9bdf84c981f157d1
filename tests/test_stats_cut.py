"""plans/stats_cut.cut — lineage cut + Catalyst size-estimate reset.

Regression guard for the round-4 discovery: localCheckpoint preserves
the child plan's estimated sizeInBytes (originStats), the size-only
estimator multiplies child estimates at joins, so iterative join loops
double the estimate's bit-length every round and the driver ends up
multiplying astronomical BigIntegers during planning (625 s fixpoint
with all executors idle — BENCH.md §3c). cut() must (a) preserve data
exactly and (b) keep the estimate bounded across rounds.
"""

from pyspark.sql import functions as F

from kbase_cdm_ontologies_spark.operators.closure import transitive_closure
from kbase_cdm_ontologies_spark.plans.stats_cut import cut


def _size_bits(df) -> int:
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return int(stats.sizeInBytes()).bit_length()


def test_cut_preserves_rows_and_schema(spark):
    a = spark.range(500).selectExpr("id as s", "id + 1 as o")
    j = (
        a.alias("x")
        .join(a.alias("y"), F.col("x.o") == F.col("y.s"))
        .select(F.col("x.s").alias("s"), F.col("y.o").alias("o"))
    )
    c = cut(j)
    assert c.schema == j.schema
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, j.collect()))
    # eager mode and empty frames
    assert cut(j, eager=True).count() == j.count()
    e = cut(a.limit(0))
    assert e.count() == 0 and e.schema == a.schema


def test_cut_resets_size_estimate(spark):
    a = spark.range(200).selectExpr("id as s", "id + 1 as o")
    plain = a
    through_cut = cut(a)
    for _ in range(4):
        plain = plain.alias("x").join(
            plain.alias("y"), F.col("x.o") == F.col("y.s")
        ).select(F.col("x.s").alias("s"), F.col("y.o").alias("o")).localCheckpoint(
            eager=False
        )
        through_cut = cut(
            through_cut.alias("x")
            .join(through_cut.alias("y"), F.col("x.o") == F.col("y.s"))
            .select(F.col("x.s").alias("s"), F.col("y.o").alias("o"))
        )
    # plain checkpoints compound: the estimate's bit-length grows with
    # every round (the BigInteger blow-up); cut frames stay at the
    # 63-bit defaultSizeInBytes leaf forever
    assert _size_bits(plain) > 100
    assert _size_bits(through_cut) <= 64


def test_closure_round_estimates_stay_bounded(spark):
    # end-to-end: a forced-distributed transitive closure's OUTPUT
    # frame must not carry a compounded estimate (its plan embeds every
    # inner-round cut)
    edges = spark.range(300).selectExpr(
        "concat('n', id) as s", "concat('n', id + 1) as o"
    )
    out = transitive_closure(edges, local_threshold=0)
    assert out.count() > 300
    assert _size_bits(out) <= 64

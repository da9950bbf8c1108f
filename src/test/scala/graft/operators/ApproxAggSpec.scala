package graft.operators

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

/** Approximate aggregates (HLL++ count-distinct, GK approximate percentiles).
  * Their sketches are engine-specific, so no DuckDB hash oracle is possible —
  * the correctness contract is the error bound vs the exact answer, asserted
  * here. At 100 TB these are the default: approx_count_distinct shuffles a
  * fixed-size sketch per group instead of the value set, and
  * approx_percentile bounds memory where exact `percentile` buffers all
  * values per group.
  */
class ApproxAggSpec extends SparkSpec {

  private def t = T(spark, sfDir)

  test("approx_count_distinct is within 5% of exact on every group") {
    import spark.implicits._
    val both = t.lineitem.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        approx_count_distinct($"l_partkey", 0.02).as("approx"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile lands within the accuracy contract of exact percentile") {
    import spark.implicits._
    val both = t.lineitem.groupBy($"l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx_p50"),
        count(lit(1)).as("n"))
      .collect()
    both.foreach { r =>
      // quantity is 1..50; with accuracy 1000 the rank error is n/1000, which
      // for this distribution keeps the value within a few units
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 3.0,
        s"flag ${r.getString(0)}: approx ${r.getDouble(2)} vs exact ${r.getDouble(1)}")
    }
  }

  test("approximate and exact agree exactly on a small distinct domain") {
    import spark.implicits._
    // 3 distinct return flags: HLL++ at default precision is exact here
    val r = t.lineitem.agg(
      countDistinct($"l_returnflag").as("exact"),
      approx_count_distinct($"l_returnflag").as("approx")).head()
    assert(r.getLong(0) == r.getLong(1))
  }
}

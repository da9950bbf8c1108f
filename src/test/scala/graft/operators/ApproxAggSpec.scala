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

  test("hll sketches: estimate within 5% of exact, and shard sketches union-merge") {
    import spark.implicits._
    // the 100 TB pattern: each shard keeps a fixed-size DataSketches HLL
    // binary; the global distinct is a UNION of sketches, never a re-scan
    val exact = t.lineitem.select(countDistinct($"l_partkey")).head().getLong(0)
    val whole = t.lineitem
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("est"))
      .head().getLong(0)
    assert(math.abs(whole - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"whole-table estimate $whole vs exact $exact")
    val merged = t.lineitem
      .groupBy(pmod($"l_orderkey", lit(8)).as("shard"))
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    // identical input set => the merged estimate must equal the single-pass
    // sketch estimate exactly (HLL union over the same items is lossless
    // at equal lgK)
    assert(merged == whole, s"sharded-union estimate $merged vs single-pass $whole")
  }
}

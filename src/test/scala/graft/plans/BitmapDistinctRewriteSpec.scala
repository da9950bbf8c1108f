package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapDistinctRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ BitmapDistinctRewrite(spark)
    try f
    finally {
      spark.experimental.extraOptimizations = prior
      spark.conf.unset("spark.graft.bitmapDistinct")
    }
  }

  private def eventsDistinct = {
    val t = graft.T(spark, sfDir)
    t.events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  test("COUNT(DISTINCT int) rewrites to the bitmap shape — no Expand, same answer") {
    val expected = snap(eventsDistinct) // stock plan, rule absent
    withRule {
      spark.conf.set("spark.graft.bitmapDistinct", "true")
      val df = eventsDistinct
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bitmap_construct_agg"), optimized)
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("Expand"), physical)
      assert(snap(df) == expected)
    }
  }

  test("exact on negative, boundary, and huge values") {
    import spark.implicits._
    val vals = Seq(-100000L, -100000L, -1L, 0L, 1L, 32767L, 32768L,
      32769L, (1L << 40), (1L << 40) + 1, -1L,
      Long.MinValue, Long.MinValue, Long.MaxValue)
    val df = vals.toDF("v").withColumn("g", lit(1))
    val stock = df.groupBy($"g").agg(count_distinct($"v").as("n")).collect()(0).getLong(1)
    withRule {
      spark.conf.set("spark.graft.bitmapDistinct", "true")
      val got = df.groupBy($"g").agg(count_distinct($"v").as("n"))
      assert(got.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
      assert(got.collect()(0).getLong(1) == stock)
      assert(stock == 11)
    }
  }

  test("conf off, multi-agg, non-integral, and filtered shapes are untouched") {
    withRule {
      // conf defaults to false -> passthrough even with the rule installed
      val off = eventsDistinct.queryExecution.optimizedPlan.toString
      assert(!off.contains("bitmap_construct_agg"), off)
      spark.conf.set("spark.graft.bitmapDistinct", "true")
      val t = graft.T(spark, sfDir)
      // a second non-distinct aggregate alongside -> not the narrow shape
      val multi = t.events.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n"), sum(col("value")).as("s"))
      assert(!multi.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
      // string column -> not integral
      val str = t.events.groupBy(col("user_id"))
        .agg(count_distinct(col("event_type")).as("n"))
      assert(!str.queryExecution.optimizedPlan.toString.contains("bitmap_construct_agg"))
    }
  }
}

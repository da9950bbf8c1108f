package graft.plans

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  private def t = T(spark, sfDir)

  test("IntervalJoinExec matches the theta-join encoding pair-for-pair") {
    import spark.implicits._
    val clicks = t.events.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("c_us"), $"event_id".as("click_id"))
    val purchases = t.events.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), unix_micros($"ts").as("p_us"), $"event_id".as("purchase_id"))
    val viaExec = IntervalJoin.join(clicks, purchases,
        Seq("user_id"), Seq("pu"), "c_us", "p_us", 0L, 300L * 1000000L)
      .select($"click_id", $"purchase_id")
    val viaTheta = clicks.join(purchases,
        $"user_id" === $"pu" && $"p_us" >= $"c_us" && $"p_us" <= $"c_us" + 300000000L)
      .select($"click_id", $"purchase_id")
    assert(viaExec.count() > 0)
    assert(snap(viaExec) === snap(viaTheta))
  }

  test("hot key: one giant key group stays linear and exact") {
    import spark.implicits._
    // force everything onto one key — the SMJ-residual worst case
    val l = t.events.select(lit(1L).as("k"), unix_micros($"ts").as("lt"), $"event_id".as("lid"))
    val r = t.events.select(lit(1L).as("rk"), unix_micros($"ts").as("rt"), $"event_id".as("rid"))
    val viaExec = IntervalJoin.join(l, r, Seq("k"), Seq("rk"), "lt", "rt",
        -60L * 1000000L, 60L * 1000000L)
      .select($"lid", $"rid")
    val viaTheta = l.join(r, $"rt" >= $"lt" - 60000000L && $"rt" <= $"lt" + 60000000L)
      .select($"lid", $"rid")
    assert(snap(viaExec) === snap(viaTheta))
  }

  test("plan: custom exec, one exchange per side, no nested-loop fallback") {
    import spark.implicits._
    val clicks = t.events.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("c_us"))
    val purchases = t.events.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), unix_micros($"ts").as("p_us"))
    val df = IntervalJoin.join(clicks, purchases,
      Seq("user_id"), Seq("pu"), "c_us", "p_us", 0L, 300000000L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("IntervalJoin"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
    df.collect()
  }
}

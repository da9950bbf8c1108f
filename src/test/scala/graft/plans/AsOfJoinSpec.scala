package graft.plans

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class AsOfJoinSpec extends SparkSpec {

  private def t = T(spark, sfDir)

  test("AsOfJoinExec matches the window-encoded as-of semantics") {
    import spark.implicits._
    val p = t.events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val c = t.events.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("cu"), $"ts".as("cts"), $"click_id")
    val viaExec = AsOf.join(p, c, Seq("user_id"), Seq("cu"), "ts", "cts")
      .select($"user_id", $"purchase_id",
        coalesce($"click_id", lit(-1L)).as("click_id"))

    // reference: union both event kinds, carry the latest click forward
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"kind", $"eid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = t.events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", lit(1).as("kind"), $"event_id".as("eid"))
      .unionAll(t.events.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("eid"))
        .select($"user_id", $"ts", lit(0).as("kind"), $"eid"))
    val viaWindow = u
      .withColumn("latest_click",
        last(when($"kind" === 0, $"eid"), ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .select($"user_id", $"eid".as("purchase_id"),
        coalesce($"latest_click", lit(-1L)).as("click_id"))

    assert(viaExec.count() === p.count(), "as-of join must keep every left row")
    assert(snap(viaExec) === snap(viaWindow))
    // some purchase must predate every click for its user (null path hit)
    assert(viaExec.filter($"click_id" === -1L).count() > 0)
  }

  test("plan uses the custom exec with one hash exchange per side, no window") {
    import spark.implicits._
    val p = t.events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val c = t.events.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("click_id"))
    val df = AsOf.join(p, c, Seq("user_id"), Seq("cu"), "ts", "cts")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical.take(800))
    assert(!physical.contains("Window"), "no window/union fallback expected")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(exchanges == 2, s"expected 2 exchanges (one per side), got $exchanges:\n$physical")
    df.collect() // and it runs
  }

  test("composite keys and bigint time columns merge correctly") {
    import spark.implicits._
    // two-part key (user_id, event_type bucket) + long micros time
    val l = t.events
      .select($"user_id", substring($"event_type", 1, 1).as("kb"),
        unix_micros($"ts").as("t_us"), $"event_id")
    val r = t.events
      .select($"user_id".as("ru"), substring($"event_type", 1, 1).as("rb"),
        (unix_micros($"ts") - 1L).as("r_us"), $"event_id".as("r_id"))
    val res = AsOf.join(l, r, Seq("user_id", "kb"), Seq("ru", "rb"), "t_us", "r_us")
    // every left row's own twin sits 1µs before it with the same key, so
    // every left row matches, and the as-of pick (largest r_us <= t_us)
    // must land in [t_us - 1, t_us]
    assert(res.count() === l.count())
    assert(res.filter($"r_us".isNull).count() === 0)
    assert(res.filter($"r_us" > $"t_us" || $"r_us" < $"t_us" - 1L).count() === 0)
  }

  test("empty right side yields all-null right columns, left preserved") {
    import spark.implicits._
    val p = t.events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val c = t.events.filter($"event_type" === "never_matches")
      .select($"user_id".as("cu"), $"ts".as("cts"), $"event_id".as("click_id"))
    val res = AsOf.join(p, c, Seq("user_id"), Seq("cu"), "ts", "cts")
    assert(res.count() === p.count())
    assert(res.filter($"click_id".isNotNull).count() === 0)
  }
}

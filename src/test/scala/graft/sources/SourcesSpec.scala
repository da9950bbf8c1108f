package graft.sources

import java.nio.file.Files

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString
  private lazy val orders = T(spark, sfDir).orders

  test("binaryFile source reads raw blobs with path metadata (media ingest lane)") {
    import org.apache.spark.sql.functions._
    // the ingest path Multimodal.assets documents: opaque bytes + metadata
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet").load(sfDir)
    assert(files.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = files.select(col("path"), col("length"),
      length(col("content")).cast("long").as("n")).collect()
    assert(rows.length == graft.Tables.names.length) // one blob per corpus table
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
  }

  test("parquet round-trip preserves rows and schema") {
    Sources.writeParquet(orders, s"$tmp/o_parquet", numFiles = 2)
    val back = Sources.readParquet(spark, s"$tmp/o_parquet")
    assert(back.schema == orders.schema)
    assert(snap(back) == snap(orders))
  }

  test("csv round-trip with explicit schema (timestamps survive)") {
    Sources.writeCsv(orders, s"$tmp/o_csv")
    val back = Sources.readCsv(spark, s"$tmp/o_csv", orders.schema)
    assert(snap(back) == snap(orders))
  }

  test("json round-trip with explicit schema") {
    Sources.writeJson(orders, s"$tmp/o_json")
    val back = Sources.readJson(spark, s"$tmp/o_json", orders.schema)
    assert(snap(back) == snap(orders))
  }

  test("orc round-trip preserves rows") {
    Sources.writeOrc(orders, s"$tmp/o_orc")
    assert(snap(Sources.readOrc(spark, s"$tmp/o_orc")) == snap(orders))
  }

  test("text read: line-oriented input (WordCount shape)") {
    import spark.implicits._
    Seq("the quick fox", "the slow fox").toDF("value")
      .write.mode("overwrite").text(s"$tmp/t_text")
    val wc = Sources.readText(spark, s"$tmp/t_text")
      .select(explode(split(col("value"), " ")).as("word"))
      .groupBy("word").count()
    val m = wc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("the" -> 2L, "quick" -> 1L, "slow" -> 1L, "fox" -> 2L))
  }

  test("tagged sink: one directory per tag, partition pruning on read-back") {
    Sources.writeTagged(orders.withColumn("tag", col("o_orderstatus")),
      "tag", s"$tmp/o_tagged")
    val dirs = new java.io.File(s"$tmp/o_tagged").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.sameElements(orders.select("o_orderstatus").distinct()
      .collect().map(r => s"tag=${r.getString(0)}").sorted))
    // a tag-filtered read back must prune to one partition directory
    val one = Sources.readParquet(spark, s"$tmp/o_tagged").filter(col("tag") === "F")
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(tag"))
    assert(one.count() == orders.filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed table: equi-join on bucket column plans no shuffle") {
    Sources.writeBucketed(orders, "orders_b", "o_custkey", 8)
    val t1 = spark.table("orders_b")
    val joined = t1.as("a").join(t1.as("b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(joined.count() > 0)
  }
}

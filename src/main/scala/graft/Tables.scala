package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table registry (TESTDATA.md).
  *
  * The reference registered client tables via `registerTempTable` after DAG
  * reassembly (reference: sparksql-server/.../listener/DAGListener.scala:155-162);
  * here tables are plain parquet relations registered as temp views, so every
  * query — DataFrame or SQL — resolves through the session catalog and Catalyst
  * prunes columns / pushes filters into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Normalize events.ts to the µs session-TZ TimestampType whatever the
      // generator wrote: older corpora store INT64 TIMESTAMP(NANOS), which
      // the Spark reader rejects unless read as long (then ÷1000 with
      // integer division — nanos exceed 2^53, no double round-trip); newer
      // corpora store TIMESTAMP(MICROS) NTZ, which only needs the NTZ→LTZ
      // cast (identity wall-clock under the UTC session TZ).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
        case _ =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all corpus tables as temp views for the SQL surface. */
  def register(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** Per-query handle on the corpus: lazy accessors, one scan relation each. */
final case class T(spark: SparkSession, dir: String) {
  private def t(n: String): DataFrame = Tables.load(spark, dir, n)
  lazy val region: DataFrame     = t("region")
  lazy val nation: DataFrame     = t("nation")
  lazy val customer: DataFrame   = t("customer")
  lazy val supplier: DataFrame   = t("supplier")
  lazy val part: DataFrame       = t("part")
  lazy val orders: DataFrame     = t("orders")
  lazy val lineitem: DataFrame   = t("lineitem")
  lazy val events: DataFrame     = t("events")
  lazy val documents: DataFrame  = t("documents")
  lazy val embeddings: DataFrame = t("embeddings")
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.4 rows "Scans/sources" and "Sinks").
  *
  * The reference's surface: text scans (`sc.textFile` — reference:
  * testSharingScan/WordCount/src/main/scala/WordCount.scala:64), Parquet/JSON
  * via examples (reference: sparksql-server/examples/.../sql/RDDRelation.scala:63-66),
  * text sinks (`saveAsTextFile` — .../FIFOStrategy.scala:70) and the tagged
  * multi-file sink (`RDDMultipleTextOutputFormat` — reference:
  * testSharingScan/WordCountInputTagging/.../WordCount.scala:45-95).
  *
  * Here each is the DataFrameReader/Writer equivalent; the tagged sink is
  * `partitionBy` (one directory per tag — same layout contract, but executed
  * as a single distributed write with per-partition files, no custom
  * OutputFormat). All writers take explicit partitioning knobs because at
  * 100 TB the file count IS the performance contract (small-file storms
  * kill downstream scans).
  */
object Sources {

  // ---- readers ---------------------------------------------------------

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Schema'd JSON read — explicit schema skips the inference pass (at scale,
    * inference reads the data twice). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Line-oriented text (the reference's WordCount input). */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
  // Avro: the reference's examples shipped users.avro; the spark-avro
  // connector jar is not in this build's offline classpath, so Avro I/O is
  // intentionally not claimed (it is the same one-line DataFrameReader call).

  // ---- writers ---------------------------------------------------------

  def writeParquet(df: DataFrame, path: String, numFiles: Int = 0): Unit =
    (if (numFiles > 0) df.coalesce(numFiles) else df)
      .write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Tagged sink: one directory per tag value (reference #34's
    * one-file-per-tag contract, scalably). */
  def writeTagged(df: DataFrame, tagCol: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(tagCol).parquet(path)

  /** Bucketed managed table: co-locates future joins on `bucketCol` —
    * the zero-shuffle-join path for repeatedly joined 100 TB facts. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
}

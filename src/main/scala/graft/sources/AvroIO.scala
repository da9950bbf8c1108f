package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro read/write without the spark-avro connector.
  *
  * The reference ships Avro example data (reference:
  * sparksql-server/examples/src/main/resources/users.avro + user.avsc) but
  * this environment has no spark-avro connector jar (re-verified every
  * round; only avro-1.12 / avro-mapred-1.12 are on the Spark classpath) —
  * so the capability is built from those public pieces directly:
  * `AvroKeyInputFormat`/`AvroKeyOutputFormat` via the Hadoop-RDD bridge,
  * with an explicit Avro↔Catalyst type mapping. This is one of the few
  * deliberate RDD seams in the repo (file-format integration is genuine
  * per-partition imperative logic); everything downstream of `read` is a
  * normal DataFrame and everything upstream of `write` is a normal plan.
  *
  * Supported schema subset — flat records of: boolean/int/long/float/
  * double/string/bytes, nullable `[T, "null"]` unions of those, and
  * arrays of those (exactly what the reference's user.avsc/full_user.avsc
  * use). Nested records would map recursively the same way; they are
  * rejected explicitly rather than half-supported.
  *
  * Scale shape: one Spark partition per Avro block range (splittable
  * container format, standard Hadoop input splits), schema read once
  * driver-side from the first file; the writer shards via
  * `saveAsNewAPIHadoopFile`, one container file per partition.
  */
object AvroIO {

  private def catalystType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.ARRAY =>
      val (et, en) = catalystType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1 && branches.size == 2,
        s"unsupported Avro union (only [T, null]): $s")
      (catalystType(nonNull.head)._1, true)
    case other => throw new IllegalArgumentException(
      s"unsupported Avro type $other in $s")
  }

  /** Avro record schema → Catalyst StructType. */
  def sparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"not a record schema: $avro")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = catalystType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(fromAvro(_, et))
    case (x, _) => x
  }

  private def toAvro(v: Any, s: Schema): Any = {
    val target = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s
    (v, target.getType) match {
      case (null, _) => null
      case (x: String, Schema.Type.STRING) => x
      case (b: Array[Byte], Schema.Type.BYTES) => java.nio.ByteBuffer.wrap(b)
      case (a: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        a.map(toAvro(_, target.getElementType)).asJava
      case (x, _) => x
    }
  }

  /** Driver-side schema sniff: the container header of the first file. */
  private def readSchema(spark: SparkSession, path: String): Schema = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath).filter(_.getName.endsWith(".avro")).minBy(_.getName)
      else p
    val in = fs.open(file)
    // the reader owns (and closes) the stream once constructed; if its
    // constructor throws (non-Avro/corrupt header), close the stream here
    // or the handle leaks (ADVICE r8)
    val reader =
      try new org.apache.avro.file.DataFileStream(
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      catch { case e: Throwable => in.close(); throw e }
    try reader.getSchema finally reader.close()
  }

  /** Read an Avro container file (or directory of them) as a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val avroSchema = readSchema(spark, path)
    val schema = sparkSchema(avroSchema)
    val fieldTypes = schema.fields.map(_.dataType)
    val n = fieldTypes.length
    val rdd = spark.sparkContext
      .newAPIHadoopFile(path, classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions { it =>
        // convert inside the task: GenericRecord is not kryo-friendly and
        // Hadoop RecordReaders reuse the key object across next() calls
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq((0 until n).map(i => fromAvro(rec.get(i), fieldTypes(i))))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def avroFieldSchema(dt: DataType, nullable: Boolean): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case ArrayType(et, en) => Schema.createArray(avroFieldSchema(et, en))
      case other => throw new IllegalArgumentException(s"unsupported Spark type $other")
    }
    if (nullable) Schema.createUnion(base, Schema.create(Schema.Type.NULL)) else base
  }

  /** Catalyst StructType → Avro record schema (name is cosmetic). */
  def avroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name, avroFieldSchema(f.dataType, f.nullable),
        null, null.asInstanceOf[AnyRef])
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  /** Write a DataFrame as Avro container files under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val avro = avroSchema(schema)
    val schemaJson = avro.toString // Schema is not serializable; ship JSON
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avro)
    val fieldSchemas = schema.fields.indices.toArray
    df.rdd.mapPartitions { it =>
      val s = new Schema.Parser().parse(schemaJson)
      val fs = s.getFields.asScala.toArray
      it.map { row =>
        val rec = new GenericData.Record(s)
        fieldSchemas.foreach(i => rec.put(i, toAvro(row.get(i), fs(i).schema())))
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }
}

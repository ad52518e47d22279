package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Avro interchange — SURVEY §2.1 (round-5 plan item 4, previously
  * environment-blocked: there is still no spark-avro DATASOURCE jar in the
  * offline classpath, but the Avro core + avro-mapred jars ship with
  * Spark, which is all the container format needs).
  *
  * Read path: `AvroKeyInputFormat` through `newAPIHadoopFile` — the public
  * Hadoop input format, which splits WITHIN a file on Avro sync markers,
  * so one huge .avro file parallelizes across tasks (Round6Spec pins >1
  * split on a single file). Records are converted to Rows inside the same
  * iterator element-by-element because Hadoop record readers reuse their
  * key objects — the Row construction IS the defensive copy.
  *
  * Write path: one Avro container file per partition via the Hadoop
  * FileSystem API (cluster-correct; local FS here), snappy-compressed,
  * schema derived from the DataFrame schema with nullable-union fields.
  * The Schema object is not serializable, so its JSON travels to the
  * tasks and is re-parsed per partition.
  */
object Avro {
  private type Q = (SparkSession, String) => DataFrame

  private def fresh(tag: String, sfDir: String): String =
    graft.Scratch.fresh(tag, sfDir)

  private[sources] def avroSchemaOf(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case other => throw new IllegalArgumentException(
          s"graft-avro: unsupported column type $other for '${f.name}'" +
            " (dates/timestamps travel as ISO strings — the house rule)")
      }
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_avro", null, "graft", false,
      java.util.Arrays.asList(fields: _*))
  }

  /** Write each partition as one Avro container file under `outDir`. */
  def write(df: DataFrame, outDir: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchemaOf(sparkSchema).toString
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.get().partitionId()
        val path = new Path(s"$outDir/part-$pid.avro")
        val out = path.getFileSystem(new Configuration()).create(path, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.snappyCodec())
        w.create(schema, out)
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
            if (!row.isNullAt(i)) rec.put(f.name, f.dataType match {
              case StringType => row.getString(i)
              case _          => row.get(i)
            })
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** Read Avro container files under `path` as a DataFrame with the given
    * schema — splittable within files (sync markers), one task per split.
    */
  def read(s: SparkSession, path: String, schema: StructType,
           maxSplitBytes: Long = -1L): DataFrame = {
    val conf = new Configuration()
    if (maxSplitBytes > 0)
      conf.setLong("mapreduce.input.fileinputformat.split.maxsize", maxSplitBytes)
    val raw = s.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      conf)
    val fields = schema.fields
    val rows = raw.mapPartitions(_.map { case (k, _) =>
      val rec = k.datum()
      Row.fromSeq(fields.toSeq.map { f =>
        rec.get(f.name) match {
          case null => null
          case u: org.apache.avro.util.Utf8 => u.toString
          case v => v
        }
      })
    })
    s.createDataFrame(rows, schema)
  }

  // ======================================================================
  // §2.1 row
  // ======================================================================

  private val rtSchema = StructType(Seq(
    StructField("k", LongType), StructField("cust", LongType),
    StructField("price_cents", LongType), StructField("prio", StringType),
    StructField("odate", StringType)))

  /** src_avro_roundtrip — orders → 8 Avro container files → splittable
    * Hadoop-input-format read → aggregate; the values must round-trip
    * bit-exactly against the parquet-derived oracle. `read_parallel` pins
    * that the read planned multiple tasks (intra-file splitting is pinned
    * separately in Round6Spec with a forced split size on ONE file).
    */
  val srcAvroRoundtrip: Q = (s, d) => {
    val dir = fresh("src_avro_roundtrip", d)
    val t = Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      col("o_custkey").as("cust"),
      round(col("o_totalprice") * 100).cast("long").as("price_cents"),
      col("o_orderpriority").as("prio"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
    write(t.repartition(8), s"$dir/avro")
    val back = read(s, s"$dir/avro", rtSchema)
    val parallel = back.rdd.getNumPartitions >= 2
    back.groupBy(col("prio"))
      .agg(count(lit(1)).as("n"),
        sum(col("price_cents")).as("sum_cents"),
        sum(col("k") + col("cust")).as("sum_keys"),
        min(col("odate")).as("min_date"),
        max(col("odate")).as("max_date"))
      .withColumn("read_parallel", lit(parallel))
      .orderBy(col("prio"))
  }

  val queries: Map[String, Q] = Map(
    "src_avro_roundtrip" -> srcAvroRoundtrip)

  val oracles: Map[String, String] = Map(
    "src_avro_roundtrip" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_custkey AS cust,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS pc,
        |         o_orderpriority AS prio,
        |         strftime(o_orderdate, '%Y-%m-%d') AS odate FROM orders)
        |SELECT prio, count(*) AS n, CAST(sum(pc) AS BIGINT) AS sum_cents,
        |       CAST(sum(k + cust) AS BIGINT) AS sum_keys,
        |       min(odate) AS min_date, max(odate) AS max_date,
        |       TRUE AS read_parallel
        |FROM base GROUP BY prio ORDER BY prio""".stripMargin)
}

package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.connector.{CheckResult, EtlpSink}

/** Avro container-file connector built directly on the avro core
  * library (the spark-avro datasource module is not on this
  * classpath). The wire format is the standard Avro object container
  * file, so files interchange with any Avro reader.
  *
  * Scale shape: the sink writes ONE container file per input
  * partition from inside the executors (no driver bytes); the source
  * parallelizes per FILE (`binaryFiles` streams each container
  * through `DataFileStream`, never materializing a whole file in
  * memory). Files are therefore the unit of read parallelism — fine
  * when the writer sized partitions sensibly (the usual lake
  * discipline); a sync-marker splitter would be the next step if
  * gigantic single files ever appear.
  *
  * Covers the reference's wire-format surface (cf.
  * /root/reference/src/etlp/utils/reducers.clj — line/JSONL reducers)
  * for the one mainstream ETL format the other sources don't.
  */
object AvroConversions {

  /** Spark StructType → Avro record schema. Every field is wrapped in
    * `[null, T]` (Spark columns are nullable by default and Avro has
    * no per-field nullability flag outside unions). */
  def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name, nullable(toAvroType(f.dataType, name + "_" + f.name)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def toAvroType(dt: DataType, recName: String): Schema = dt match {
    case StringType  => Schema.create(Schema.Type.STRING)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, _) =>
      Schema.createArray(nullable(toAvroType(et, recName + "_item")))
    case st: StructType => toAvroSchema(st, recName)
    case other =>
      throw new IllegalArgumentException(
        s"AvroSink: unsupported Spark type $other (map types not mapped)")
  }

  /** Avro schema → Spark StructType (inverse of the above; also reads
    * third-party files using the same primitive/logical types). */
  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nul) = toSparkType(f.schema())
      StructField(f.name(), dt, nul)
    })
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"AvroSource: only [null, T] unions supported, got $s")
      (toSparkType(branches.head)._1, true)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros])
        (TimestampType, false)
      else (LongType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.RECORD => (toSparkSchema(s), false)
    case other =>
      throw new IllegalArgumentException(s"AvroSource: unsupported Avro type $other")
  }

  /** Catalyst external Row value → Avro datum, per the field's Spark
    * type (drives the writer). */
  def toAvro(v: Any, dt: DataType, avro: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (x: java.math.BigDecimal, d: DecimalType) =>
      val scaled = x.setScale(d.scale)
      ByteBuffer.wrap(scaled.unscaledValue().toByteArray)
    case (x: Array[Byte], BinaryType) => ByteBuffer.wrap(x)
    case (x: java.sql.Date, DateType) => x.toLocalDate.toEpochDay.toInt
    case (x: java.time.LocalDate, DateType) => x.toEpochDay.toInt
    case (x: java.sql.Timestamp, TimestampType) =>
      x.getTime * 1000L + (x.getNanos / 1000L) % 1000L
    case (x: java.time.Instant, TimestampType) =>
      x.getEpochSecond * 1000000L + x.getNano / 1000L
    case (x: scala.collection.Seq[_], ArrayType(et, _)) =>
      val elemSchema = unwrap(unwrap(avro).getElementType)
      x.map(toAvro(_, et, elemSchema)).asJava
    case (x: Row, st: StructType) => rowToRecord(x, st, unwrap(avro))
    case (x: Short, _) => x.toInt
    case (x: Byte, _)  => x.toInt
    case (x, _) => x
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  def rowToRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.length) {
      val f = st.fields(i)
      rec.put(i, toAvro(row.get(i), f.dataType, avro.getFields.get(i).schema()))
      i += 1
    }
    rec
  }

  /** Avro datum → external Row value for `createDataFrame`. */
  def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (x: Utf8, StringType) => x.toString
    case (x: String, StringType) => x
    case (x: ByteBuffer, d: DecimalType) =>
      val bytes = new Array[Byte](x.remaining()); x.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case (x: ByteBuffer, BinaryType) =>
      val bytes = new Array[Byte](x.remaining()); x.duplicate().get(bytes)
      bytes
    case (x: Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.toLong))
    case (x: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(x, 1000L))
      ts.setNanos((Math.floorMod(x, 1000000L) * 1000L).toInt)
      ts
    case (x: java.util.Collection[_], ArrayType(et, _)) =>
      x.asScala.toSeq.map(fromAvro(_, et))
    case (x: GenericRecord, st: StructType) => recordToRow(x, st)
    case (x, _) => x
  }

  def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) =>
      fromAvro(rec.get(i), f.dataType)
    })
}

/** Hadoop Configuration is not Serializable; ship it to executors via
  * its own writable form (same trick as Spark's internal
  * SerializableConfiguration, which is private[spark]). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
  }
}

/** Reads a directory of Avro object-container files. Schema comes from
  * the first file's header (one driver-side open, header-only); data
  * decode is distributed, one task per file, streaming — a container
  * is never buffered whole. */
final case class AvroSource(path: String) extends PathSource {
  def spec: Map[String, String] = Map("type" -> "avro", "path" -> path)

  def read(spark: SparkSession): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf)
    val files = fs.listStatus(dir).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".avro")
    }
    require(files.nonEmpty, s"AvroSource: no .avro files under $path")
    val header = new DataFileStream(
      fs.open(files.head.getPath), new GenericDatumReader[GenericRecord]())
    val avroSchema = try header.getSchema finally header.close()
    val sparkSchema = AvroConversions.toSparkSchema(avroSchema)

    val rows = spark.sparkContext
      .binaryFiles(path, minPartitions = files.length)
      .filter(_._1.endsWith(".avro"))
      .flatMap { case (_, pds) =>
        val stream = new DataFileStream(
          pds.open(), new GenericDatumReader[GenericRecord]())
        val it = stream.iterator().asScala
          .map(AvroConversions.recordToRow(_, sparkSchema))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) stream.close()
            h
          }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}

/** Writes one Avro container file per input partition, deflate-coded,
  * from inside the executor tasks. Task retries re-create (overwrite)
  * the same part file, so the last attempt wins — no partial-file
  * duplication. Row count comes from an `observe` riding the same job
  * (see SinkMetrics). */
final case class AvroSink(path: String) extends EtlpSink {
  def spec: Map[String, String] = Map("type" -> "avro", "path" -> path)
  def check(spark: SparkSession): CheckResult = CheckResult(valid = true, "ok")

  def write(df: DataFrame): Long = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val avroJson =
      AvroConversions.toAvroSchema(sparkSchema, "graft_record").toString
    val confSer =
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val out = new Path(path)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val dirStr = out.toString

    graft.sinks.SinkMetrics.writeCounted(df) { observed =>
      observed.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val avroSchema = new Schema.Parser().parse(avroJson)
          val pid = TaskContext.get().partitionId()
          val file = new Path(s"$dirStr/part-${"%05d".format(pid)}.avro")
          val ofs = file.getFileSystem(confSer.value)
          val writer = new DataFileWriter(
            new GenericDatumWriter[GenericRecord](avroSchema))
          writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(1))
          writer.create(avroSchema, ofs.create(file, true))
          try it.foreach { row =>
            writer.append(
              AvroConversions.rowToRecord(row, sparkSchema, avroSchema))
          } finally writer.close()
        }
      }
    }
  }
}

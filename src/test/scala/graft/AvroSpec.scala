package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{AvroSink, AvroSource, AvroConversions}

/** Avro connector: container-file round-trips through the avro core
  * lib (no spark-avro module on this classpath). */
class AvroSpec extends SparkSpec {

  private def tmp(name: String) = s"/tmp/graft_test/avro_$name"

  test("round-trips all supported types including nulls") {
    val schema = StructType(Seq(
      StructField("s", StringType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(10, 2)),
      StructField("arr", ArrayType(IntegerType)),
      StructField("rec", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val ts = Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row("a", 1, 2L, 3.5, 4.5f, true, Array[Byte](1, 2, 3),
        Date.valueOf("2024-03-01"), ts,
        new java.math.BigDecimal("12345.67"), Seq(1, 2, 3), Row(9L, "n")),
      Row(null, null, null, null, null, null, null, null, null, null,
        null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp("types")
    AvroSink(path).write(df)

    val back = AvroSource(path).read(spark)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().sortBy(r => Option(r.getAs[String]("s")).getOrElse(""))
    val nul = got(0)
    assert((0 until nul.length).forall(nul.isNullAt))
    val full = got(1)
    assert(full.getAs[String]("s") == "a")
    assert(full.getAs[Int]("i") == 1)
    assert(full.getAs[Long]("l") == 2L)
    assert(full.getAs[Double]("d") == 3.5)
    assert(full.getAs[Float]("f") == 4.5f)
    assert(full.getAs[Boolean]("b"))
    assert(full.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2, 3))
    assert(full.getAs[Date]("dt") == Date.valueOf("2024-03-01"))
    assert(full.getAs[Timestamp]("ts") == ts)
    assert(full.getAs[java.math.BigDecimal]("dec")
      .compareTo(new java.math.BigDecimal("12345.67")) == 0)
    assert(full.getSeq[Int](full.fieldIndex("arr")) == Seq(1, 2, 3))
    assert(full.getAs[Row]("rec") == Row(9L, "n"))
  }

  test("write count matches and re-read preserves row count on a real table") {
    val df = spark.read.parquet(s"$sf0001/nation.parquet")
    val path = tmp("nation")
    val n = AvroSink(path).write(df)
    assert(n == df.count())
    val back = AvroSource(path).read(spark)
    assert(back.count() == n)
    // value-level check on a keyed row
    val r = back.where("n_nationkey = 0").collect().head
    val e = df.where("n_nationkey = 0").collect().head
    assert(r.getAs[String]("n_name") == e.getAs[String]("n_name"))
  }

  test("one container file per non-empty partition; empty partitions skipped") {
    val df = spark.range(0, 100, 1, 4).toDF("id")
      .where("id < 50") // partitions 2,3 become empty
    val path = tmp("parts")
    AvroSink(path).write(df)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(files.length == 2)
    assert(AvroSource(path).read(spark).count() == 50)
  }

  test("schema conversion rejects unsupported map type with a clear error") {
    val st = StructType(Seq(
      StructField("m", MapType(StringType, IntegerType))))
    val e = intercept[IllegalArgumentException] {
      AvroConversions.toAvroSchema(st, "r")
    }
    assert(e.getMessage.contains("unsupported Spark type"))
  }

  test("source check() verb reports missing path") {
    assert(!AvroSource("/tmp/graft_test/definitely_absent").check(spark).valid)
    val ok = tmp("nation")
    assert(AvroSource(ok).check(spark).valid)
  }
}

package graft.plans

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** One-pass Gram/scatter aggregate buffer: the full upper triangle of
  * Σ_v round(v[i]·v[j], 9) as exact scaled-by-1e9 integers, plus the
  * per-size vector counts the cell counts derive from.
  *
  * Cell layout is j-major (`t = j(j+1)/2 + i`, i ≤ j), which is
  * independent of the final dimension — a longer vector only APPENDS
  * cells, so growing the buffer never re-indexes existing sums and
  * buffers built from different-dimension partitions merge by
  * element-wise add over the common prefix.
  *
  * Exactness contract (must stay bit-identical to the SQL form
  * `CAST(ROUND(CAST(vi AS DOUBLE)*CAST(vj AS DOUBLE), 9) AS
  * DECIMAL(38,9))` summed as DECIMAL(38,9)):
  *  - ROUND(double, 9) is `BigDecimal(Double.toString(p)).setScale(9,
  *    HALF_UP).toDouble` — Spark's RoundBase on DoubleType goes through
  *    scala.math.BigDecimal(double), which is Double.toString-based.
  *  - the DECIMAL(38,9) cast re-rounds the rounded double the same way
  *    and nulls out on precision > 38 (non-ANSI overflow → null).
  *  - NaN/Infinity products: ROUND passes them through and the decimal
  *    cast nulls them — a null never reaches the sum but the row still
  *    counts toward n_vecs (COUNT(*) semantics), tracked by `nn`.
  *  - per-cell sums accumulate in a long (units of 1e-9) with an
  *    overflow spill into a per-cell BigInteger, so the sum is exact at
  *    any row count; the final DECIMAL(38,9) overflow check mirrors
  *    Spark's null-on-overflow SUM.
  */
final class GramBuffer {
  var maxDim: Int = 0
  /** cntBySize(s) = number of input vectors of size exactly s (s >= 1). */
  var cntBySize: Array[Long] = Array.emptyLongArray
  /** per-cell scaled (1e-9 units) partial sums. */
  var lo: Array[Long] = Array.emptyLongArray
  /** per-cell count of non-null contributions (SUM-null detection). */
  var nn: Array[Long] = Array.emptyLongArray
  /** per-cell overflow carry, allocated lazily on first long overflow. */
  var big: Array[BigInteger] = null

  private def cells(d: Int): Int = d * (d + 1) / 2

  def grow(d: Int): Unit = if (d > maxDim) {
    val nc = cells(d)
    cntBySize = java.util.Arrays.copyOf(cntBySize, d + 1)
    lo = java.util.Arrays.copyOf(lo, nc)
    nn = java.util.Arrays.copyOf(nn, nc)
    if (big != null) {
      val nb = new Array[BigInteger](nc)
      System.arraycopy(big, 0, nb, 0, big.length)
      var t = big.length
      while (t < nc) { nb(t) = BigInteger.ZERO; t += 1 }
      big = nb
    }
    maxDim = d
  }

  private def ensureBig(): Array[BigInteger] = {
    if (big == null) {
      big = Array.fill(lo.length)(BigInteger.ZERO)
    }
    big
  }

  def addCell(t: Int, un: BigInteger): Unit = {
    nn(t) += 1L
    if (un.bitLength() <= 62) {
      val u = un.longValue()
      val s = lo(t) + u
      if (((lo(t) ^ s) & (u ^ s)) < 0L) { // signed-add overflow
        val b = ensureBig()
        b(t) = b(t).add(BigInteger.valueOf(lo(t))).add(BigInteger.valueOf(u))
        lo(t) = 0L
      } else lo(t) = s
    } else {
      val b = ensureBig()
      b(t) = b(t).add(un)
    }
  }

  def update(v: Array[Double]): Unit = {
    val d = v.length
    if (d == 0) return
    grow(d)
    cntBySize(d) += 1L
    var j = 0
    while (j < d) {
      val vj = v(j)
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        val p = vj * v(i)
        // NaN/Inf → decimal cast yields null → skip the sum (row still
        // counted via cntBySize)
        if (!java.lang.Double.isNaN(p) && !java.lang.Double.isInfinite(p)) {
          val r = new JBigDecimal(java.lang.Double.toString(p))
            .setScale(9, RoundingMode.HALF_UP).doubleValue()
          val dec = new JBigDecimal(java.lang.Double.toString(r))
            .setScale(9, RoundingMode.HALF_UP)
          if (dec.precision() <= 38) addCell(base + i, dec.unscaledValue())
        }
        i += 1
      }
      j += 1
    }
  }

  def merge(o: GramBuffer): Unit = {
    if (o.maxDim == 0) return
    grow(o.maxDim)
    var s = 1
    while (s <= o.maxDim) { cntBySize(s) += o.cntBySize(s); s += 1 }
    val oc = o.lo.length
    var t = 0
    while (t < oc) {
      nn(t) += o.nn(t)
      if (o.big != null && o.big(t).signum != 0) {
        val b = ensureBig()
        b(t) = b(t).add(o.big(t))
      }
      // fold the long partial through addCell's overflow-safe path
      if (o.lo(t) != 0L) {
        nn(t) -= 1L // addCell counts a contribution; we already merged nn
        addCell(t, BigInteger.valueOf(o.lo(t)))
      }
      t += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(maxDim)
    var s = 1
    while (s <= maxDim) { out.writeLong(cntBySize(s)); s += 1 }
    var t = 0
    while (t < lo.length) {
      out.writeLong(lo(t)); out.writeLong(nn(t)); t += 1
    }
    out.writeBoolean(big != null)
    if (big != null) {
      t = 0
      while (t < big.length) {
        val bytes = big(t).toByteArray
        out.writeInt(bytes.length); out.write(bytes); t += 1
      }
    }
    out.flush()
    bos.toByteArray
  }
}

object GramBuffer {
  def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new GramBuffer
    val d = in.readInt()
    buf.grow(d)
    var s = 1
    while (s <= d) { buf.cntBySize(s) = in.readLong(); s += 1 }
    var t = 0
    while (t < buf.lo.length) {
      buf.lo(t) = in.readLong(); buf.nn(t) = in.readLong(); t += 1
    }
    if (in.readBoolean()) {
      val big = new Array[BigInteger](buf.lo.length)
      t = 0
      while (t < big.length) {
        val n = in.readInt()
        val b = new Array[Byte](n)
        in.readFully(b)
        big(t) = new BigInteger(b)
        t += 1
      }
      buf.big = big
    }
    buf
  }
}

/** `graft_gram_agg(array<double>) → array<struct<i int, j int, n bigint,
  * s decimal(38,9)>>` — the Gram upper triangle in ONE aggregation pass:
  * no d²-per-row explode, no Σ·d² shuffle rows, no per-product Decimal
  * boxing through the hash aggregate. Each partition collapses to one
  * d(d+1)/2-cell buffer (~17 KB at d=64); partials merge by integer
  * adds. NULL input vectors must be filtered by the caller (mirrors the
  * SQL form's `WHERE vec IS NOT NULL`); empty vectors contribute
  * nothing. Guarded to d ≤ 2048 — the buffer is d²-shaped and a
  * million-dim "vector" would be a caller bug, not a workload. */
final case class GramAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gram_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("s", DecimalType(38, 9), nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): GramBuffer = new GramBuffer

  override def update(buf: GramBuffer, row: InternalRow): GramBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      require(d <= 2048,
        s"$prettyName: vector dimension $d exceeds the 2048 guard " +
          "(the Gram buffer is d^2-shaped)")
      // toDoubleArray would NPE on null elements; the SQL form's
      // product with a null element is null → skipped by the sum but
      // the row still counts. Null elements are not a thing the
      // embedding tables produce; treat one as a hard error rather
      // than silently diverging from the SQL form.
      var k = 0
      while (k < d) {
        require(!arr.isNullAt(k),
          s"$prettyName: null element at index $k in embedding vector")
        k += 1
      }
      buf.update(arr.toDoubleArray())
    }
    buf
  }

  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    a.merge(b); a
  }

  override def eval(buf: GramBuffer): Any = {
    val d = buf.maxDim
    val out = new Array[Any](d * (d + 1) / 2)
    // n(i,j) = #vectors with size >= j+1 — suffix sums of cntBySize
    val nBySize = new Array[Long](d + 1)
    var s = d
    var acc = 0L
    while (s >= 1) { acc += buf.cntBySize(s); nBySize(s) = acc; s -= 1 }
    var j = 0
    var idx = 0
    while (j < d) {
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        val t = base + i
        val dec: Decimal =
          if (buf.nn(t) == 0L) null
          else {
            var total = BigInteger.valueOf(buf.lo(t))
            if (buf.big != null) total = total.add(buf.big(t))
            val bd = new JBigDecimal(total, 9)
            // DECIMAL(38,9) SUM overflow → null (non-ANSI)
            if (bd.precision() > 38) null else Decimal(bd, 38, 9)
          }
        out(idx) = new GenericInternalRow(
          Array[Any](i, j, nBySize(j + 1), dec))
        idx += 1
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): GramBuffer =
    GramBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): GramAgg = copy(child = c.head)
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities for multi-dimensional data layout.
  *
  * At warehouse scale, file-level min/max statistics only prune scans on
  * the column the data happens to be sorted by. Sorting by the
  * interleaved bits of SEVERAL columns (the Z-order curve) keeps every
  * participating column locally clustered, so predicates on ANY of them
  * skip most files — the standard layout-optimization trick in lakehouse
  * table formats, reconstructed here from the public Morton-code
  * literature as plain Catalyst arithmetic.
  *
  * [[interleave16]] builds the Morton code of two 16-bit coordinates
  * with the classic shift-or "bit spreading" chain (4 mask steps per
  * coordinate, all int64 ops) — one codegen'd row-local expression, no
  * UDF, reproducible by any engine with bitwise ops (the DuckDB oracle
  * runs the identical arithmetic). [[clusterBy]] range-partitions and
  * sorts by the code: the shuffle is ONE range exchange (sampled
  * boundaries), identical in shape to a global ORDER BY, after which
  * each output file covers a tight Z-range ⇒ tight min/max on both
  * coordinates.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (Morton):
    * bit i moves to bit 2i. Magic-mask shift-or chain, all BIGINT ops. */
  private def spread16(v: Column): Column = {
    val x0 = v.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: x in even bits, y in
    * odd. Callers bucket wider domains down to 16 bits first (e.g.
    * `pmod(hash, 65536)` or a range quantile) — layout clustering needs
    * locality, not full precision. */
  def interleave16(x: Column, y: Column): Column =
    spread16(x.cast("long"))
      .bitwiseOR(shiftleft(spread16(y.cast("long")), 1))

  /** ORDER-PRESERVING numeric coordinate of a STRING column (r15 — the
    * string half of ZORDER BY (day, value)): skip `skipPrefix` UTF-8
    * bytes (the caller strips the column's global common prefix, else
    * a "2024-01-XX" day key collapses to one coordinate), read the
    * next 7 bytes as an unsigned integer, zero-padding short strings
    * on the RIGHT so "ab" < "b" still holds after the mapping. Pure
    * Column DSL (substring/hex/rpad/conv — padding the HEX string with
    * '0' pairs is byte-identical to padding the binary with 0x00), so
    * it is injection-safe for any column expression and reproducible
    * by any engine. Monotone in binary UTF8 order — the collation the
    * string min/max stats record — with strings sharing prefix+7
    * bytes collapsing together (locality, not exactness; residual
    * predicates stay exact). */
  def stringCoord(s: Column, skipPrefix: Int): Column =
    conv(rpad(hex(substring(encode(s, "UTF-8"), skipPrefix + 1, 7)),
      14, "0"), 16, 10).cast("double")

  /** Driver-side twin of [[stringCoord]] — bit-identical by
    * construction (same bytes, same unsigned read), for computing
    * coordinate BOUNDS from already-known min/max strings without a
    * second data pass. */
  def stringCoordValue(s: String, skipPrefix: Int): Double = {
    val b = s.getBytes("UTF-8")
    val seven = java.util.Arrays.copyOfRange(b,
      math.min(skipPrefix, b.length),
      math.min(skipPrefix + 7, b.length))
    val padded = java.util.Arrays.copyOf(seven, 7)
    BigInt(1, padded).toDouble
  }

  /** Rewrite `df` into a Z-clustered layout on (x, y): range-partition
    * by the Morton code into `numFiles` tasks and sort inside each.
    * One range exchange; every output file then holds a contiguous
    * Z-range, giving tight per-file min/max on BOTH columns. */
  def clusterBy(df: DataFrame, x: Column, y: Column,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("graft_z", interleave16(x, y))
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
  }

  /** Generic k-way spread: bit j of `v`'s low `b` bits moves to bit
    * j·k — a b-term shift-or chain (all int64 ops, codegen'd; the
    * 2-way magic-mask chain above is the hand-unrolled special case).
    * b ≤ 21 keeps k = 3 inside one int64. */
  private def spreadK(v: Column, b: Int, k: Int): Column =
    (0 until b).map(j =>
      shiftleft(shiftright(v, j).bitwiseAND(lit(1L)), j * k))
      .reduce(_ bitwiseOR _)

  /** Morton code of k coordinates (k ≥ 2), each in [0, 2^bitsPer):
    * coordinate i occupies bit positions i, i+k, i+2k, … — ZORDER BY
    * over ANY column count, not just pairs. bitsPer·k must fit an
    * int64; callers quantize via min/max scaling exactly as for the
    * 2-column form. For k = 2 with 16-bit coordinates this equals
    * [[interleave16]] bit for bit (spec-pinned). */
  def interleaveK(coords: Seq[Column], bitsPer: Int): Column = {
    require(coords.size >= 2, s"need >= 2 coordinates: ${coords.size}")
    require(bitsPer >= 1 && bitsPer * coords.size <= 63,
      s"bitsPer * k must fit an int64: $bitsPer * ${coords.size}")
    coords.zipWithIndex.map { case (c, i) =>
      shiftleft(spreadK(c.cast("long"), bitsPer, coords.size), i)
    }.reduce(_ bitwiseOR _)
  }

  /** k-column [[clusterBy]]: range-partition + sort by the k-way
    * Morton code — one range exchange, every output file a tight
    * k-rectangle of the quantized domain. */
  def clusterByK(df: DataFrame, coords: Seq[Column], bitsPer: Int,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.withColumn("graft_z", interleaveK(coords, bitsPer))
      .repartitionByRange(numFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
  }
}

package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** E11 — typed custom aggregators (`Aggregator[IN, BUF, OUT]`), the
  * documented extension point for aggregation logic Spark lacks.
  * Registered via `functions.udaf` so they plan as ObjectHashAggregate
  * with full partial/final (map-side combine) split — unlike an RDD
  * `aggregateByKey`, they compose with groupBy/rollup/window.
  */
object Aggregates {

  /** Geometric mean via sum-of-logs (numerically stable, mergeable). */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      if (a > 0.0) (b._1 + math.log(a), b._2 + 1) else b
    override def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Element-wise minimum over string arrays — merges per-partition MinHash
    * signatures: min is associative+commutative, so partial aggregation
    * (map-side combine) applies and the shuffle carries one signature per
    * group, not one per row.
    */
  class ElementwiseMin(val width: Int) extends Aggregator[Seq[String], Seq[String], Seq[String]] {
    override def zero: Seq[String] = Seq.empty
    private def m(a: Seq[String], b: Seq[String]): Seq[String] =
      if (a.isEmpty) b else if (b.isEmpty) a
      else {
        // Fail fast on ragged signatures: zip would silently truncate to
        // the shorter input and emit a partial signature.
        require(a.length == width && b.length == width,
          s"ElementwiseMin(width=$width) got signatures of length " +
            s"${a.length} and ${b.length}")
        a.zip(b).map { case (x, y) => if (x <= y) x else y }
      }
    override def reduce(b: Seq[String], a: Seq[String]): Seq[String] = m(b, a)
    override def merge(b1: Seq[String], b2: Seq[String]): Seq[String] = m(b1, b2)
    override def finish(r: Seq[String]): Seq[String] = r
    override def bufferEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Kirsch–Mitzenmacher double hashing over one 64-bit input hash:
    * position i = h + i·h2 mod numBits, h2 derived and forced ODD so the
    * i-sequence cycles the whole bit space. Shared by [[BloomFilterAgg]]
    * and every probe ([[Manifest.bloomRead]]) — build and query MUST
    * agree bit for bit or membership silently breaks.
    */
  def bloomPos(h: Long, i: Int, numBits: Int): Int = {
    val h2 = (java.lang.Long.rotateLeft(h, 27) * 0x9E3779B97F4A7C15L) | 1L
    val g = h + i.toLong * h2
    (((g % numBits) + numBits) % numBits).toInt
  }

  /** Fixed-width Bloom filter over PRE-HASHED (`xxhash64`) values — the
    * file-skipping aggregate: the buffer is a flat bit array mutated in
    * place (O(k) per row, zero allocation), merge is bitwise OR, so
    * partial aggregation applies and the shuffle carries ONE
    * numBits/8-byte buffer per group (file), never rows. 131072 bits =
    * 16 KB ≈ 1.5% false positives at 20k distinct values per file.
    */
  class BloomFilterAgg(val numBits: Int, val numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64: $numBits")
    require(numHashes > 0, s"numHashes must be > 0: $numHashes")
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        val p = bloomPos(h, i, numBits)
        buf(p >>> 6) |= 1L << (p & 63)
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def geometricMeanUdaf = udaf(GeometricMean)
  def elementwiseMinUdaf(width: Int) = udaf(new ElementwiseMin(width))
  def bloomFilterUdaf(numBits: Int, numHashes: Int) =
    udaf(new BloomFilterAgg(numBits, numHashes), Encoders.scalaLong)
}

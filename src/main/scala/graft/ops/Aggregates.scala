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

  def geometricMeanUdaf = udaf(GeometricMean)
  def elementwiseMinUdaf(width: Int) = udaf(new ElementwiseMin(width))
}

package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (the UDAF surface, SURVEY.md §2.5 [EXT]).
  * `Aggregator[IN, BUF, OUT]` is the user-facing path; buffers are
  * encoder-serialized and merged map-side, so these scale like built-in
  * aggregates (partial aggregation + shuffle of one buffer per key).
  */
object Aggregators {

  /** Bounded top-k: keeps the k largest values per group in the buffer —
    * a per-group top-k without sorting whole groups (the buffer is the
    * only state that shuffles). */
  final case class TopK(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    override def zero: Seq[Double] = Vector.empty
    override def reduce(buf: Seq[Double], v: Double): Seq[Double] = insert(buf, v)
    override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[Double]): Seq[Double] = buf
    private def insert(buf: Seq[Double], v: Double): Seq[Double] = {
      val merged = (buf :+ v).sorted(Ordering[Double].reverse)
      if (merged.size > k) merged.take(k) else merged
    }
    override def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }

  /** Streaming-friendly exact weighted mean: (sum, weight) buffer. */
  final case class WeightedMean() extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

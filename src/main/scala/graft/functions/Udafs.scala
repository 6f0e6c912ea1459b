package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY.md §2.B "UDF / UDAF surface"):
  * `Aggregator[IN,BUF,OUT]` + `functions.udaf` is the preferred
  * extension mechanism when a metric isn't built in.
  *
  * Determinism: the buffer accumulates *scaled longs* (the integer
  * bridge, ops package doc) so merge order — which Spark does not
  * guarantee across partials — cannot change the result, and the DuckDB
  * oracle can reproduce it exactly in SQL.
  */
object Udafs {

  final case class WeightedMeanBuf(sumWX: Long, sumW: Long)

  /** Weighted mean of `x` with weight `w`, both doubles, scaled to 1e4.
    * weighted_mean = Σ round(w·x·1e4) / Σ round(w·1e4), computed in
    * exact integer space and converted once at the end.
    */
  object WeightedMean extends Aggregator[(Double, Double), WeightedMeanBuf, Double] {
    def zero: WeightedMeanBuf = WeightedMeanBuf(0L, 0L)
    def reduce(b: WeightedMeanBuf, in: (Double, Double)): WeightedMeanBuf = {
      val (x, w) = in
      WeightedMeanBuf(b.sumWX + math.round(w * x * 1e4), b.sumW + math.round(w * 1e4))
    }
    def merge(a: WeightedMeanBuf, b: WeightedMeanBuf): WeightedMeanBuf =
      WeightedMeanBuf(a.sumWX + b.sumWX, a.sumW + b.sumW)
    def finish(b: WeightedMeanBuf): Double =
      if (b.sumW == 0L) Double.NaN else b.sumWX.toDouble / b.sumW.toDouble
    def bufferEncoder: Encoder[WeightedMeanBuf] = Encoders.product[WeightedMeanBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

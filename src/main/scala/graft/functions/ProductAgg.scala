package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.9 escape hatch, demonstrated):
  * multiplicative fold — Spark has no `product()` built-in. Registered via
  * `functions.udaf` so it works in both the Column and SQL surfaces; the
  * merge is associative+commutative so Catalyst gets map-side partial
  * aggregation for free. */
object ProductAgg extends Aggregator[Double, Double, Double] {
  override def zero: Double = 1.0
  override def reduce(acc: Double, x: Double): Double = acc * x
  override def merge(a: Double, b: Double): Double = a * b
  override def finish(acc: Double): Double = acc
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

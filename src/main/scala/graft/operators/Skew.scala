package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{AggOp, Measure}

/**
 * Skew-resilient aggregation: two-phase group-by with key salting.
 *
 * Problem at scale: a hash-partitioned `groupBy(dims)` sends ALL rows of
 * one hot key to one reducer — a single straggler task bounds the job at
 * 100 TB. AQE's skew handling splits skewed *join* partitions but does not
 * re-shard a skewed aggregation key.
 *
 * Scheme (standard salting): phase 1 groups by (dims, salt) where
 * `salt = pmod(hash(row-random), buckets)`, spreading a hot key over
 * `buckets` reducers; phase 2 re-aggregates the per-salt partials by dims
 * alone. Phase-2 input is ≤ buckets rows per key — tiny by construction.
 *
 * Only ops closed under re-aggregation decompose exactly (the same
 * algebra behind the reference's `SAFE_PREAGGREGATE`, `parquery/tool.py:37`,
 * and Spark's partial aggregation): sum/count/count_na → sum of partials,
 * min/max/one → min/max of partials, mean → sum÷count pair. `std` and
 * `count_distinct` are rejected — they need moment pairs / distinct sets,
 * not partials (use the plain engine path; Spark's own partial
 * aggregation already handles their shuffle correctly).
 */
object Skew {

  def saltedAggregate(df: DataFrame, dims: Seq[String],
                      measureSpecs: Seq[Seq[String]],
                      buckets: Int = 16): DataFrame = {
    require(dims.nonEmpty, "saltedAggregate needs at least one dimension")
    val measures = Measure.normalize(measureSpecs)

    val unsupported = measures.filter(m => m.op match {
      case AggOp.Std | AggOp.CountDistinct | AggOp.SortedCountDistinct =>
        true
      case _ => false
    })
    require(unsupported.isEmpty,
      s"ops not decomposable over salt: ${unsupported.map(_.op.name).distinct.mkString(", ")}")

    // phase 1: per-(dims, salt) partials. Salt from a uniform random —
    // independent of the data, so hot keys spread evenly.
    val salted = df.withColumn("__salt",
      pmod((rand(42) * buckets).cast("int"), lit(buckets)))
    val p1Exprs: Seq[Column] = measures.zipWithIndex.flatMap { case (m, i) =>
      val c = col(m.input)
      m.op match {
        case AggOp.Sum     => Seq(sum(c).as(s"__p$i"))
        case AggOp.Count   => Seq(count(c).as(s"__p$i"))
        case AggOp.CountNa => Seq(count(when(c.isNull, 1)).as(s"__p$i"))
        case AggOp.Min | AggOp.One => Seq(min(c).as(s"__p$i"))
        case AggOp.Max     => Seq(max(c).as(s"__p$i"))
        case AggOp.Mean    => Seq(sum(c).as(s"__p${i}_s"),
          count(c).as(s"__p${i}_c"))
        case other => throw new IllegalStateException(other.name)
      }
    }
    val phase1 = salted.groupBy((dims :+ "__salt").map(col): _*)
      .agg(p1Exprs.head, p1Exprs.tail: _*)

    // phase 2: merge partials by dims alone (≤ buckets rows per key)
    val p2Exprs: Seq[Column] = measures.zipWithIndex.map { case (m, i) =>
      val p = col(s"__p$i")
      (m.op match {
        case AggOp.Sum | AggOp.Count | AggOp.CountNa => sum(p)
        case AggOp.Min | AggOp.One => min(p)
        case AggOp.Max => max(p)
        case AggOp.Mean =>
          sum(col(s"__p${i}_s")) / sum(col(s"__p${i}_c"))
        case other => throw new IllegalStateException(other.name)
      }).as(m.output)
    }
    phase1.groupBy(dims.map(col): _*).agg(p2Exprs.head, p2Exprs.tail: _*)
  }
}

package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * [[Measure]] → aggregate [[Column]] compiler (SURVEY.md §2.3, A1–A10).
 *
 * Every op maps to a built-in (codegen'd, partial-aggregation-capable)
 * Spark aggregate. Spark plans all of these as partial `HashAggregateExec`
 * → shuffle → final `HashAggregateExec` automatically — the distributed
 * generalization of the reference's `SAFE_PREAGGREGATE` row-group
 * pre-aggregation (`parquery/tool.py:37`,
 * `parquery/aggregate_pyarrow.py:135-138`), but valid for all ops, not
 * just {min, max, sum, one}.
 */
object Aggs {

  /**
   * Compile one measure to an aliased aggregate expression.
   *
   * @param countNaDuckdbCompat the reference's DuckDB engine maps
   *   `count_na` to plain `COUNT` (counts NON-null despite the name —
   *   `parquery/aggregate_duckdb.py:311`). Default `false` honors the
   *   README contract ("Count of null values", `README.md:61`); pass
   *   `true` to bug-compatibly match the reference's DuckDB engine.
   */
  def compile(m: Measure, countNaDuckdbCompat: Boolean = false): Column = {
    val c = col(m.input)
    val e: Column = m.op match {
      case AggOp.Sum   => sum(c)
      case AggOp.Mean  => avg(c)
      // sample stddev (ddof=1): matches DuckDB STDDEV; see AggOp.Std
      case AggOp.Std   => stddev_samp(c)
      case AggOp.Count => count(c)
      case AggOp.CountNa =>
        if (countNaDuckdbCompat) count(c)
        else count(when(c.isNull, lit(1)))
      // exact, not approx — the reference is exact (SURVEY.md A6);
      // approx_count_distinct is exposed separately as an extension
      case AggOp.CountDistinct | AggOp.SortedCountDistinct =>
        count_distinct(c)
      case AggOp.Min   => min(c)
      case AggOp.Max   => max(c)
      // deterministic "pick any": MIN, like the reference's DuckDB
      // engine (aggregate_duckdb.py:316)
      case AggOp.One   => min(c)
    }
    e.alias(m.output)
  }

  def compileAll(ms: Seq[Measure],
                 countNaDuckdbCompat: Boolean = false): Seq[Column] =
    ms.map(compile(_, countNaDuckdbCompat))
}

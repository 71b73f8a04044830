package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * [[Filter]] → Catalyst [[Column]] compiler (SURVEY.md §2.2, P2–P8).
 *
 * Unlike the reference's DuckDB engine — which interpolates values into SQL
 * text raw and therefore breaks on strings (`parquery/aggregate_duckdb.py:385`,
 * SURVEY.md §2.2 "injection quirk") — `Column` expressions are typed and
 * parameterized, so string/bool/date filter values work and nothing is
 * injectable. Compiled predicates are plain Catalyst expressions, so they
 * participate in predicate pushdown to the Parquet scan (row-group pruning
 * via footer min/max stats) for free.
 */
object Filters {

  private def values(v: Any): Option[Seq[Any]] = v match {
    case s: Seq[_]   => Some(s)
    case a: Array[_] => Some(a.toSeq)
    case _           => None
  }

  /** Compile one predicate. */
  def compile(f: Filter): Column = {
    val c = col(f.column)
    f.op match {
      // non-list value degrades to ==/!= (aggregate_duckdb.py:373-384)
      case FilterOp.In    => values(f.value).map(vs => c.isin(vs: _*))
                               .getOrElse(c === lit(f.value))
      case FilterOp.NotIn => values(f.value).map(vs => !c.isin(vs: _*))
                               .getOrElse(c =!= lit(f.value))
      case FilterOp.Eq    => c === lit(f.value)
      case FilterOp.Ne    => c =!= lit(f.value)
      case FilterOp.Gt    => c > lit(f.value)
      case FilterOp.Ge    => c >= lit(f.value)
      case FilterOp.Lt    => c < lit(f.value)
      case FilterOp.Le    => c <= lit(f.value)
    }
  }

  /** All filters ANDed (`parquery/aggregate_duckdb.py:354`); None if empty. */
  def compileAll(fs: Seq[Filter]): Option[Column] =
    fs.map(compile).reduceOption(_ && _)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column profiling for corpus QA — the "what is in this 100 TB table"
 * first step of a training-data pipeline (row counts, null rates,
 * cardinalities, value ranges per column).
 *
 * Scale design: ONE distributed pass computes every column's statistics
 * in a single global aggregate (partial-aggregated map-side like any
 * Spark agg), then a driver-free `stack` unpivots the 1-row result into
 * one row per column. The naive per-column loop would scan the table
 * once per column.
 */
object Profile {

  /**
   * Numeric-column profile: one output row per column with
   * (n_rows, n_nonnull, n_distinct, min, max, avg). `n_distinct` is
   * exact by default; `exactDistinct = false` switches to the HLL sketch
   * (`approx_count_distinct`) — the scale path when columns hold
   * billions of distinct values: exact distinct forces an Expand (input
   * replicated once per distinct aggregate) plus per-value state, while
   * the sketch is a few KB per column and stays one pass.
   */
  def profileNumeric(df: DataFrame, cols: Seq[String],
                     exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val distinctOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (exactDistinct) count_distinct(_) else approx_count_distinct(_)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__${c}_nn"),
        distinctOf(col(c)).as(s"__${c}_nd"),
        min(col(c)).cast("double").as(s"__${c}_min"),
        max(col(c)).cast("double").as(s"__${c}_max"),
        avg(col(c)).cast("double").as(s"__${c}_avg"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __n, `__${c}_nn`, `__${c}_nd`, " +
        s"round(`__${c}_min`, 4), round(`__${c}_max`, 4), " +
        s"round(`__${c}_avg`, 4)"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) AS " +
        "(column, n_rows, n_nonnull, n_distinct, min_v, max_v, avg_v)"))
  }

  /**
   * Schema data-contract check: compare a frame's ACTUAL schema against
   * the `(name, simpleTypeString)` contract an ingestion boundary
   * declares, one row per column of the union with a status —
   * `ok` / `type_drift` / `missing` (contracted, absent) / `extra`
   * (present, uncontracted). The fail-fast front door for a 100 TB
   * pipeline: upstream schema drift is caught as a declared diff
   * BEFORE a scan burns cluster-hours or (worse) a widened/renamed
   * column silently nulls through the M-series gates. Pure METADATA —
   * the comparison reads the parquet footer schema only; the returned
   * single-partition literal frame runs zero jobs over the data.
   * Contract order is preserved for contracted columns; extras follow
   * in schema order. Names compare case-insensitively (Spark's default
   * resolution; the `unionEvolve` discipline) with an exact-name match
   * preferred; a contracted name matching SEVERAL actual columns that
   * differ only by case (legal under `spark.sql.caseSensitive=true`)
   * and none exactly reports `ambiguous` rather than picking one.
   * EVERY actual column not consumed by a contract row surfaces as
   * `extra` — including case-duplicates whose sibling satisfied the
   * contract — so a pathological schema yields a truthful diff, never
   * a collapsed one. Types compare by Catalyst `simpleString`
   * (`bigint`, `string`, `array<float>`, ...).
   */
  def schemaContract(df: DataFrame,
                     expected: Seq[(String, String)]): DataFrame = {
    require(expected.nonEmpty, "schemaContract needs a contract")
    val actual = df.schema.map(f =>
      f.name -> f.dataType.simpleString)
    val consumed = scala.collection.mutable.Set.empty[Int]
    // phase 1: EXACT name matches for every contract row first, so an
    // earlier row's case-insensitive fallback can never steal a column
    // a later row names exactly
    val exactPick: Map[Int, Int] = expected.indices.flatMap { e =>
      val name = expected(e)._1
      actual.indices.filter(i => !consumed(i) && actual(i)._1 == name)
        .headOption.map { i => consumed += i; e -> i }
    }.toMap
    val contractRows = expected.zipWithIndex.map {
      case ((name, want), e) =>
        val picked = exactPick.get(e).map(Seq(_)).getOrElse(
          actual.indices.filter(i =>
            !consumed(i) && actual(i)._1.equalsIgnoreCase(name)))
        picked match {
          case Seq(i) =>
            consumed += i
            val got = actual(i)._2
            (name, want, got, if (got == want) "ok" else "type_drift")
          case Seq() => (name, want, null: String, "missing")
          case _ => (name, want, null: String, "ambiguous")
        }
    }
    val rows = contractRows ++ actual.indices.collect {
      case i if !consumed(i) =>
        (actual(i)._1, null: String, actual(i)._2, "extra")
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("column", "expected_type", "actual_type", "status")
  }
}

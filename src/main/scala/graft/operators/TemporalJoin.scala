package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Temporal joins Spark has no native operator for: as-of (match each left
 * row to the newest right row at-or-before it) and range containment
 * (point BETWEEN start AND end). Extension beyond the reference surface
 * (parquery joins nothing — SURVEY.md §2.4); semantics follow the SQL
 * forms DuckDB executes natively (`ASOF JOIN`, `BETWEEN` join), which is
 * what the oracle checks against.
 *
 * Scale design: neither operator performs a cross product or an
 * equi-join-then-filter blowup.
 *  - [[asofJoin]] is the union-and-scan formulation: tag both inputs,
 *    union, ONE shuffle on the key, and a running `last(ignoreNulls)`
 *    window carries the newest right row forward onto each left row.
 *    Cost is one hash partitioning + one in-partition sort over
 *    |left| + |right| rows — versus the naive equi-join on key which
 *    pairs every left row with EVERY right row of that key before the
 *    argmax.
 *  - [[rangeJoin]] buckets time into fixed bins: a range explodes onto
 *    the bins it covers (bounded by rangeLength/binSeconds + 1), a point
 *    lands in exactly one bin, and the join runs per (key, bin) — pair
 *    candidates are only same-bin rows, and each true pair is emitted
 *    exactly once (the point's bin is unique). Pick `binSeconds` near
 *    the typical range length: bigger bins → fewer replicas per range
 *    but more false candidates filtered after the join.
 */
object TemporalJoin {

  /**
   * Backward as-of join: for each left row, the newest right row with
   * `rightTs <= leftTs` on the same key (ties at equal timestamps match,
   * like DuckDB `ASOF JOIN ... ON l.ts >= r.ts`). Left rows with no
   * earlier right row keep null payload (left-join semantics).
   *
   * The matched right row is carried as ONE struct, so a null field in
   * the matched row stays null — the window never mixes fields from
   * different right rows.
   *
   * If several right rows share the same (key, ts), which one wins is
   * tie-broken by nothing — pre-aggregate the right side to one row per
   * (key, ts) when determinism matters (the oracle queries do).
   *
   * @param payload      right columns to bring onto each left row; names
   *                     must not collide with left columns
   * @param toleranceSec optional max staleness in seconds (timestamp
   *                     columns only): matches older than this are
   *                     nulled, like pandas merge_asof tolerance
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               toleranceSec: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(payload.forall(right.columns.contains),
      "payload columns must exist on the right side")
    require(!payload.exists(left.columns.contains),
      "payload column names must not collide with left columns")

    val rrowType = StructType(payload.map(c => right.schema(c)))
    val lSide = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        struct(left.columns.toSeq.map(col): _*).as("__lrow"),
        lit(null).cast(rrowType).as("__rrow")): _*)
    val rSide = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        lit(null).cast(left.schema).as("__lrow"),
        struct(payload.map(col): _*).as("__rrow")): _*)

    // right rows sort BEFORE left rows at equal __ts → equal-ts matches
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = lSide.unionByName(rSide)
      .withColumn("__rmatch", last(col("__rrow"), ignoreNulls = true).over(w))
      .withColumn("__mts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true)
          .over(w))
      .where(col("__side") === 1)

    val kept: Column = toleranceSec match {
      case Some(tol) => when(
        unix_timestamp(col("__ts")) - unix_timestamp(col("__mts")) <= tol,
        col("__rmatch"))
      case None => col("__rmatch")
    }
    joined.withColumn("__rkeep", kept)
      .select(col("__lrow.*") +:
        payload.map(c => col("__rkeep." + c).as(c)): _*)
  }

  /**
   * Range-containment join: pairs each point row with every range row
   * whose `[startCol, endCol]` contains `pointTs` (both bounds
   * inclusive — SQL `BETWEEN`), optionally also matching on `keyCols`.
   * Ranges with `end < start` match nothing. Timestamp/date columns
   * (compared at epoch-second resolution).
   *
   * A range spanning L seconds replicates onto L/binSeconds + 1 bins —
   * a pathologically long range fans out wide, so bound your range
   * lengths or size `binSeconds` up accordingly; the fan-out is linear
   * and spread across partitions, never quadratic.
   *
   * Input frames must not share column names (the output carries both
   * sides' columns unprefixed).
   */
  def rangeJoin(points: DataFrame, ranges: DataFrame, pointTs: String,
                startCol: String, endCol: String, binSeconds: Long,
                keyCols: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val overlap = points.columns.toSet
      .intersect(ranges.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"points/ranges share non-key columns: ${overlap.mkString(", ")}")

    val sSec = unix_timestamp(col(startCol))
    val eSec = unix_timestamp(col(endCol))
    val binned = ranges.withColumn("__bin", explode(
      when(eSec >= sSec,
        sequence(floor(sSec / binSeconds), floor(eSec / binSeconds)))
        .otherwise(array().cast("array<bigint>"))))
    val p = points.withColumn("__bin",
      floor(unix_timestamp(col(pointTs)) / binSeconds))
    p.join(binned, (keyCols :+ "__bin").toSeq)
      .where(unix_timestamp(col(pointTs)).between(
        unix_timestamp(col(startCol)), unix_timestamp(col(endCol))))
      .drop("__bin")
  }
}

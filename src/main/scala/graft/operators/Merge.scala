package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multi-source consolidation: CDC-style upsert merge and
 * schema-evolution union. A training-data corpus is never written once
 * — crawls re-visit pages, labelers re-submit rows, sources re-publish
 * shards with added columns — so the ingestion layer needs MERGE
 * semantics (keep the newest version of every key, honor deletes) and
 * by-name union across drifted schemas. The reference is single-table
 * read-side OLAP (`parquery/README.md:4-8`, `aggregate.py:72-83`) with
 * no write-side consolidation surface; extension beyond it.
 *
 * Scale shape: [[compactLog]] / [[mergeUpsert]] is ONE aggregation on
 * the key columns — `max_by` with map-side partial aggregation, so each
 * executor first collapses its own shard of the change log and only
 * (key, winner) rows cross the wire; no window function, no driver
 * collect, minimum possible exchange volume for a merge over an
 * unsorted layout. The struct-typed payload buffer does force
 * SortAggregate (map-side sort CPU) instead of HashAggregate — the
 * alternative (pack the ordering into a long, hash-aggregate it, join
 * the winners back) trades that CPU for a SECOND full shuffle of the
 * log through the join, which loses at 100 TB where exchange volume,
 * not map CPU, is the bottleneck. AQE handles key skew as for any
 * aggregate. [[unionEvolve]] is pure plan surgery (projections +
 * UnionExec) — zero shuffle.
 */
object Merge {

  /**
   * Collapse a change log to its latest snapshot: one row per key — the
   * row with the highest `versionCol` — with rows whose `deleteCol` is
   * true acting as tombstones (the key disappears from the snapshot).
   *
   * Determinism: the winner is chosen by `max_by(row, (version,
   * ordinalCol*))`; callers must ensure (key, version) is unique per
   * source (true for any sane CDC feed — a version is an LSN / commit
   * timestamp / batch id). [[mergeUpsert]] adds a side ordinal so
   * base-vs-update ties at equal version resolve to the update,
   * deterministically.
   */
  def compactLog(log: DataFrame, keyCols: Seq[String], versionCol: String,
                 deleteCol: Option[String] = None,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val payload = log.columns.toSeq
    val ord = struct((versionCol +: tieBreak).map(col): _*)
    val winner = log.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ord).as("__w"))
      .select(payload.map(c => col(s"__w.$c").as(c)): _*)
    deleteCol match {
      case Some(d) => winner.where(!coalesce(col(d), lit(false))).drop(d)
      case None    => winner
    }
  }

  /**
   * MERGE INTO semantics over immutable parquet: apply `updates` to
   * `base`, keeping for every key the highest-version row, with updates
   * winning version ties (base rows are version 0 of their key unless
   * `base` carries `versionCol` itself). `deleteCol` (boolean, on the
   * updates side; absent columns are filled false/0) marks tombstones —
   * those keys are dropped from the result. Schemas may drift between
   * the two sides: columns are aligned by name via [[unionEvolve]].
   *
   * The result is the new snapshot — write it with
   * [[graft.sources.Writer]] to complete the merge; at 100 TB the
   * single key-hash aggregation is the minimum possible data movement
   * for a merge without a sorted/bucketed table layout (with one,
   * Spark's storage-partitioned join elides even that).
   */
  def mergeUpsert(base: DataFrame, updates: DataFrame,
                  keyCols: Seq[String], versionCol: String,
                  deleteCol: Option[String] = None): DataFrame = {
    val withVersion =
      if (base.columns.contains(versionCol)) base
      else base.withColumn(versionCol, lit(0L))
    // side ordinal: at equal version the update row wins, not a
    // scheduler-order coin flip
    val log = unionEvolve(Seq(
      withVersion.withColumn("__src", lit(0)),
      updates.withColumn("__src", lit(1))))
    compactLog(log, keyCols, versionCol, deleteCol,
      tieBreak = Seq("__src")).drop("__src")
  }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Widest common type for by-name union; None = incompatible. */
  private def widen(a: DataType, b: DataType): Option[DataType] =
    (a, b) match {
      case _ if a == b => Some(a)
      case (NullType, t) => Some(t)
      case (t, NullType) => Some(t)
      case (x, y) if integral(x) && integral(y) =>
        Some(if (x.defaultSize >= y.defaultSize) x else y)
      // decimals stay exact: widen to cover both (integer digits and
      // scale each take their max). At the 38-digit cap, SCALE gives
      // way, never integer digits — keeping the scale would shrink the
      // integer range and silently NULL in-range values on cast (ansi
      // off); losing fractional digits only rounds. Integer digits
      // that cannot fit at all fail fast like any incompatible pair.
      case (x: DecimalType, y: DecimalType) =>
        val scale = x.scale.max(y.scale)
        val intDigits = (x.precision - x.scale).max(y.precision - y.scale)
        if (intDigits > DecimalType.MAX_PRECISION) None
        else {
          val p = (intDigits + scale).min(DecimalType.MAX_PRECISION)
          Some(DecimalType(p, p - intDigits))
        }
      case (x: DecimalType, y) if integral(y) =>
        widen(x, DecimalType(20, 0)) // covers any 64-bit integral
      case (x, y: DecimalType) if integral(x) => widen(DecimalType(20, 0), y)
      case (_: NumericType, _: NumericType) => Some(DoubleType)
      case _ => None
    }

  /**
   * Union by column NAME across drifted schemas: columns missing from a
   * frame are null-filled, numeric types widen to the tightest common
   * type (integral→wider integral, any int/float mix→double), and the
   * output column order is first-appearance order across the inputs —
   * so `unionEvolve(Seq(old, new))` reads a table whose later shards
   * gained columns. Incompatibly-typed same-name columns (e.g. string
   * vs int) fail fast with both types named, rather than producing a
   * silently corrupted union.
   */
  def unionEvolve(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "unionEvolve needs at least one frame")
    // match names the way the session RESOLVES them: Spark is
    // case-insensitive by default, so "ID" and "id" are one logical
    // column — a case-sensitive fold would emit two output slots whose
    // selects both resolve to the same underlying column, yielding a
    // duplicated, contradictory pair instead of one merged column. The
    // output keeps the first-appearance spelling (Spark's own
    // unionByName convention).
    val caseSensitive = frames.head.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def keyOf(n: String): String =
      if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
    if (!caseSensitive) frames.foreach { df =>
      val dup = df.columns.groupBy(keyOf)
        .collect { case (_, v) if v.length > 1 => v.mkString("/") }
      require(dup.isEmpty, "unionEvolve: columns collide under the " +
        s"session's case-insensitive resolution: ${dup.mkString(", ")}")
    }
    val ordered = frames.flatMap(_.schema.fields).foldLeft(
        Vector.empty[(String, DataType)]) { case (acc, f) =>
      acc.indexWhere(p => keyOf(p._1) == keyOf(f.name)) match {
        case -1 => acc :+ (f.name -> f.dataType)
        case i =>
          val t = widen(acc(i)._2, f.dataType).getOrElse(throw
            new IllegalArgumentException(
              s"unionEvolve: column '${f.name}' has incompatible types " +
                s"${acc(i)._2.simpleString} vs ${f.dataType.simpleString}"))
          acc.updated(i, acc(i)._1 -> t)
      }
    }
    frames.map { df =>
      val have = df.columns.map(keyOf).toSet
      df.select(ordered.map { case (n, t) =>
        (if (have(keyOf(n))) col(n) else lit(null)).cast(t).as(n)
      }: _*)
    }.reduce(_.unionAll(_))
  }
}

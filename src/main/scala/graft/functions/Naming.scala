package graft.functions

import org.apache.spark.sql.DataFrame

/**
 * Column-name mangling — the reference's `df_to_natural_name` /
 * `df_to_original_name` (`parquery/tool.py:49-120`): `-` ↔ `_n_` so
 * non-identifier column names survive identifier-only layers.
 *
 * Spark mostly makes this unnecessary (backtick quoting handles any
 * name), but the mapping is part of the reference's public API surface
 * and its on-disk file contract, so it is preserved bidirectionally.
 */
object Naming {

  def naturalName(name: String): String = name.replace("-", "_n_")

  def originalName(name: String): String = name.replace("_n_", "-")

  /** Rename all columns `-` → `_n_` (`tool.py:49-83`). */
  def dfToNaturalName(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(naturalName).toIndexedSeq: _*)

  /** Inverse: `_n_` → `-` (`tool.py:86-120`). */
  def dfToOriginalName(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(originalName).toIndexedSeq: _*)
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Jupyter notebook (`.ipynb`) cell extraction — the code-corpus
 * format beside plain source files: every public code corpus carries
 * notebooks, and the standard pretraining recipe flattens them to
 * (cell_type, source) sequences (markdown prose + code cells;
 * outputs drop — they are derived artifacts, not authored content).
 * Written from the public nbformat 4 JSON structure
 * (https://nbformat.readthedocs.io/: top-level `cells` array, each
 * cell `{cell_type, source, …}`).
 *
 * The format's one real parsing trap is `source` POLYMORPHISM: the
 * spec says string, but writers overwhelmingly ship a list of lines
 * (nbformat's own serializer splits on newlines), and both shapes
 * are live in every real corpus. The read exploits `from_json`'s
 * StringType contract: a non-string JSON subtree under a StringType
 * schema field surfaces as its RAW JSON TEXT rather than null, so
 * one schema'd parse captures both shapes and a second `from_json`
 * over just that captured text (`array<string>` — cast-fails to
 * null for the plain-string shape) disambiguates. All codegen'd, no
 * UDF. Spark 4's VARIANT type is the designed-for tool here, but the
 * pinned Spark's variant string decode re-reads UTF-8 bytes
 * per-byte (probed: `é` → 2×U+FFFD through both
 * `try_variant_get(…, "string")` and `to_json(variant)`), so the
 * variant route corrupts non-ASCII corpora and is not used.
 * Documented boundary of the chosen route: a PLAIN-STRING source
 * whose entire text is itself a parseable JSON array of strings
 * (the literal `["…"]`) is indistinguishable from the list shape
 * and joins — adversarial-rare in real notebooks, and the failure
 * reshapes whitespace only.
 *
 * `parse_ok` is per-notebook cells-array health: malformed JSON, a
 * missing `cells` field, and a mis-typed `cells` all yield ONE
 * `parse_ok = false` row (counted, never silently dropped —
 * `from_json`'s PERMISSIVE mode nulls the field for all three, and
 * extraction treats them uniformly as "no usable cells").
 *
 * Scale shape: pure narrow projections; notebooks arrive through the
 * same shard surfaces as everything else ([[Zip.textShards]] /
 * [[Tar.textShards]] — one task per shard), and this layer is a
 * per-row transform over their text column.
 *
 * The reference engine (parquery) reads parquet only — this is a
 * training-data-pipeline extension (SURVEY §8).
 */
object Ipynb {

  /** The consumed subtree of nbformat JSON — `source` declared
    * StringType deliberately (raw-subtree capture; scaladoc above). */
  private val NbSchema = StructType(Seq(
    StructField("cells", ArrayType(StructType(Seq(
      StructField("cell_type", StringType),
      StructField("source", StringType)))))))

  /** A captured `source` under both live shapes: list-of-lines
    * concatenated verbatim (nbformat lines carry their own trailing
    * `\n`), or the plain string as-is. */
  private def sourceOf(src: Column): Column =
    coalesce(array_join(from_json(src, ArrayType(StringType)), ""), src)

  /**
   * One row per cell of every notebook in `nb` (any frame with an
   * `id` column to carry through and a `json` string column):
   * `(id, parse_ok, cell_idx, cell_type, source)`. A notebook
   * without a usable cells array (malformed JSON, missing or
   * mis-typed `cells`) yields ONE row with `parse_ok = false` and
   * null cells — counted, never silently dropped.
   */
  def cells(nb: DataFrame, idCol: String): DataFrame = {
    nb.select(col(idCol),
      from_json(col("json"), NbSchema).getField("cells").as("cells"))
      .select(col(idCol), col("cells").isNotNull.as("parse_ok"),
        posexplode_outer(col("cells")))
      .select(col(idCol), col("parse_ok"), col("pos").as("cell_idx"),
        col("col").getField("cell_type").as("cell_type"),
        sourceOf(col("col").getField("source")).as("source"))
  }

  // ---------------------------------------------------------------
  // fixture writer
  // ---------------------------------------------------------------

  /** nbformat-4-shaped notebook JSON. Each cell is `(cell_type,
    * Left(string source) | Right(list-of-lines source))` — the
    * fixture plants BOTH shapes so the polymorphic read is always
    * exercised; code cells carry the spec's extra fields the read
    * must ignore. */
  def buildIpynb(
      cells: Seq[(String, Either[String, Seq[String]])]): String = {
    val cellJson = cells.map { case (typ, src) =>
      val srcJson = src match {
        case Left(s) => "\"" + Wat.jsonEscape(s) + "\""
        case Right(lines) =>
          lines.map(l => "\"" + Wat.jsonEscape(l) + "\"")
            .mkString("[", ",", "]")
      }
      val extra =
        if (typ == "code") "\"execution_count\":1,\"outputs\":[],"
        else ""
      s"""{"cell_type":"${Wat.jsonEscape(typ)}",$extra""" +
        s""""metadata":{},"source":$srcJson}"""
    }.mkString("[", ",", "]")
    s"""{"cells":$cellJson,"metadata":{"kernelspec":""" +
      """{"name":"python3"}},"nbformat":4,"nbformat_minor":5}"""
  }
}

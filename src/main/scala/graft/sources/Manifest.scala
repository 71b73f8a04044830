package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shard-integrity manifest for corpus hand-off — the missing last
 * step of an export pipeline: when a curated corpus leaves this
 * system (to a tokenizer team, a vendor, another cluster), the
 * receiver needs to prove they got EXACTLY the bytes that were
 * published, and the publisher needs to detect a torn/partial copy
 * before training reads it. The industry convention (HF datasets,
 * Common Crawl, most vendor drops) is a per-shard checksum manifest;
 * this module writes and verifies one.
 *
 * `_MANIFEST.json` sits INSIDE the data directory (the underscore
 * prefix keeps every Spark scan blind to it) and carries one entry
 * per committed data file: name, byte size, SHA-256, and — for
 * formats Spark can count (`parquet`, line-oriented `text`) — the
 * row count. The manifest commits by write-temp + rename, so a
 * reader sees the complete old or complete new manifest, never a
 * torn one (the ChunkIndex/Bucketed pointer discipline).
 *
 * Scale shape: checksums ride Spark's `binaryFile` source — one task
 * per shard, `sha2(content, 256)` in whole-stage codegen, no shuffle,
 * no driver-side IO loop — and shard sizes are already bounded by the
 * export convention (`Writer`'s `maxRecordsPerFile`), so a task holds
 * one shard. Row counts group `input_file_name()` — again one narrow
 * pass. [[verify]] recomputes both and full-outer-joins against the
 * manifest, so missing files, extra files, size drift, checksum
 * mismatches and row-count drift each surface as their OWN named
 * status (degrade-don't-fail: verification REPORTS, the caller
 * decides).
 *
 * The reference engine has no export surface — this extends the
 * training-data-pipeline family (SURVEY §8).
 */
object Manifest {

  val FileName = "_MANIFEST.json"

  /** (name, bytes, sha256) for every data file, computed on executors. */
  private def checksums(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .load(new java.io.File(dir).getAbsolutePath)
      .where(!element_at(split(col("path"), "/"), -1).startsWith("_") &&
        !element_at(split(col("path"), "/"), -1).startsWith("."))
      .select(
        element_at(split(col("path"), "/"), -1).as("name"),
        col("length").as("bytes"),
        lower(sha2(col("content"), 256)).as("sha256"))

  /** (name, rows) per data file, or empty for unknown formats. */
  private def rowCounts(spark: SparkSession, dir: String,
                        format: String): DataFrame = {
    val reader = format match {
      case "parquet" => Some(spark.read.parquet(dir))
      case "text" | "jsonl" => Some(spark.read.text(dir))
      case _ => None
    }
    reader match {
      case Some(df) =>
        df.groupBy(element_at(split(input_file_name(), "/"), -1)
            .as("name"))
          .agg(count(lit(1)).as("rows"))
      case None =>
        spark.range(0).select(lit("").as("name"), lit(0L).as("rows"))
          .limit(0)
    }
  }

  /** JSON string escape (the Verify escape — control chars included). */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /**
   * Compute and atomically commit `_MANIFEST.json` for the data files
   * under `dir`. `format` controls row counting: `"parquet"`,
   * `"text"`/`"jsonl"` count rows; anything else records `-1`
   * (bytes + checksum still verify). Returns the number of files
   * manifested.
   */
  def write(spark: SparkSession, dir: String,
            format: String = "parquet"): Int = {
    val sums = checksums(spark, dir)
    val rows = rowCounts(spark, dir, format)
    val entries = sums.join(rows, Seq("name"), "left")
      .select(col("name"), col("bytes"), col("sha256"),
        coalesce(col("rows"), lit(-1L)).as("rows"))
      .orderBy("name")
      .collect() // one row per FILE — KB-scale at any corpus size
    val body = entries.map { r =>
      s"{${q("name")}: ${q(r.getString(0))}, ${q("bytes")}: ${r.getLong(1)}, " +
        s"${q("sha256")}: ${q(r.getString(2))}, ${q("rows")}: ${r.getLong(3)}}"
    }.mkString(",\n  ")
    val totalRows = entries.map(_.getLong(3)).filter(_ >= 0).sum
    val json =
      s"""{${q("format")}: ${q(format)},
  ${q("n_files")}: ${entries.length},
  ${q("total_bytes")}: ${entries.map(_.getLong(1)).sum},
  ${q("total_rows")}: $totalRows,
  ${q("files")}: [
  $body
]}
"""
    val target = new java.io.File(dir, FileName)
    val tmp = new java.io.File(dir, FileName + ".tmp")
    java.nio.file.Files.write(tmp.toPath, json.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, target.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    entries.length
  }

  /** Parsed manifest entries `(name, bytes, sha256, rows)`. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(dir, FileName)
    require(f.isFile, s"no $FileName under $dir")
    import spark.implicits._
    val raw = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    // the writer's own regular shape — one object per file entry
    val entry = ("\\{\"name\": \"([^\"]+)\", \"bytes\": (\\d+), " +
      "\"sha256\": \"([0-9a-f]+)\", \"rows\": (-?\\d+)\\}").r
    val rows = entry.findAllMatchIn(raw).map(m =>
      (m.group(1), m.group(2).toLong, m.group(3), m.group(4).toLong)).toSeq
    rows.toDF("name", "bytes", "sha256", "rows")
  }

  /**
   * Verify `dir` against its manifest: one row per file with
   * `status` ∈ `ok | missing | extra | bytes_mismatch |
   * checksum_mismatch | rows_mismatch`. `missing` = manifested but
   * absent on disk; `extra` = on disk but not manifested (a torn or
   * tampered copy shows up as one of these, never as silence).
   *
   * The checksum pass rides `binaryFile` and cannot be derailed by
   * shard CONTENT (corrupt bytes just hash to the wrong digest); the
   * row-count pass necessarily PARSES shards, so on a directory with
   * an unreadable shard it is skipped wholesale (a format reader
   * fails the whole scan) — every tampered file is still named by
   * size/checksum, and `rows_mismatch` remains the stale-manifest
   * detector on readable directories. Per-FILE result rows: KB-scale
   * at any corpus size (the distributed work is the hashing, one
   * task per shard).
   */
  def verify(spark: SparkSession, dir: String,
             format: String = "parquet"): DataFrame = {
    import spark.implicits._
    val manifest = read(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3)))).toMap
    val actualSums = checksums(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val actualRows: Map[String, Long] =
      scala.util.Try(rowCounts(spark, dir, format).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
        .getOrElse(Map.empty)
    val names = (manifest.keySet ++ actualSums.keySet).toSeq.sorted
    names.map { n =>
      val status = (manifest.get(n), actualSums.get(n)) match {
        case (Some(_), None) => "missing"
        case (None, Some(_)) => "extra"
        case (Some((mb, _, _)), Some((ab, _))) if mb != ab =>
          "bytes_mismatch"
        case (Some((_, ms, _)), Some((_, as))) if ms != as =>
          "checksum_mismatch"
        case (Some((_, _, mr)), Some(_))
          if mr >= 0 && actualRows.get(n).exists(_ != mr) =>
          "rows_mismatch"
        case _ => "ok"
      }
      (n, status)
    }.toDF("name", "status")
  }
}

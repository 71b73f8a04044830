package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Pure-JVM zstd for the TEXT-family sources (`.jsonl.zst`,
 * `.csv.zst`, `.txt.zst`) — the compression large public corpora
 * actually ship in (The Pile, RedPajama, Dolma-class drops are
 * zstd-compressed JSONL). Spark's shortname `zstd` for text sources
 * maps to Hadoop's `ZStandardCodec`, which requires the NATIVE
 * libhadoop zstd binding and throws where (as here, and on most
 * vanilla Spark images) only the plain Spark jars are present. But
 * the classpath already carries a pure-Java implementation:
 * aircompressor (a parquet dependency) ships
 * `io.airlift.compress.zstd.ZstdCodec`, a complete Hadoop
 * `CompressionCodec` adapter.
 *
 * [[register]] appends that codec to `io.compression.codecs` LAST —
 * Hadoop's `CompressionCodecFactory` resolves extensions by map
 * insertion order, so the pure-Java codec wins the `.zst` slot over
 * any native-dependent default — after which EVERY text-shaped read
 * in the session handles `.zst` files transparently: [[Jsonl.read]],
 * [[Csv]], [[Warc]]'s custom-lineSep WET splits, `spark.read.text`.
 * Writes name the codec class explicitly (Spark accepts a class name
 * wherever it accepts a compression shortname).
 *
 * Scale shape: zstd framing is NOT splittable — one `.zst` file =
 * one read task, exactly like the `.gz` corpora Spark pipelines
 * already ingest; corpus drops ship as many medium files (the
 * vendors' own convention) and parallelism comes from file count,
 * not intra-file splits. Write-side `maxRecordsPerFile` bounds shard
 * size for that reason.
 */
object Zstd {

  /** The pure-Java Hadoop codec on the existing classpath. */
  val CodecClass = "io.airlift.compress.zstd.ZstdCodec"

  /**
   * Magic-sniff a byte stream for gzip (`1F 8B`) or zstd
   * (`28 B5 2F FD`) framing and wrap the matching pure-Java
   * decompressor; plain bytes pass through. The binary-shard
   * families ([[Tar.textShards]], [[Warc.records]]) share this
   * sniff: extensions lie on renamed hand-offs, and `.tar.zst` /
   * `.warc.zst` (RedPajama-class corpus drops) are as routine as
   * their gzip twins.
   */
  def sniffWrap(raw: java.io.InputStream): java.io.InputStream = {
    val buf = new java.io.BufferedInputStream(raw, 1 << 16)
    buf.mark(4)
    val b0 = buf.read(); val b1 = buf.read()
    val b2 = buf.read(); val b3 = buf.read()
    buf.reset()
    if (b0 == 0x1F && b1 == 0x8B)
      new java.util.zip.GZIPInputStream(buf, 1 << 16)
    else if (b0 == 0x28 && b1 == 0xB5 && b2 == 0x2F && b3 == 0xFD)
      new io.airlift.compress.zstd.ZstdInputStream(buf)
    else buf
  }

  /** One whole-stream zstd frame around `bytes` — the fixture twin
    * of the shard builders' gzip wrap ([[Tar.buildShard]],
    * [[Warc.buildWarc]]). */
  def compress(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new io.airlift.compress.zstd.ZstdOutputStream(out)
    z.write(bytes); z.close()
    out.toByteArray
  }

  /** Idempotently register the codec for `.zst` reads in this
    * session's Hadoop configuration. */
  def register(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cur = Option(conf.get(key)).map(_.trim).filter(_.nonEmpty)
    // when unset, spell out Hadoop's compiled-in defaults so setting
    // the key does not UNregister gzip/bzip2 for the session
    val base = cur.getOrElse(
      "org.apache.hadoop.io.compress.DefaultCodec," +
        "org.apache.hadoop.io.compress.GzipCodec," +
        "org.apache.hadoop.io.compress.BZip2Codec")
    if (!base.split(",").map(_.trim).contains(CodecClass))
      conf.set(key, s"$base,$CodecClass")
  }

  /** [[Jsonl.write]] with pure-Java zstd shards (`part-*.jsonl.zst`
    * naming comes from the codec's default extension). */
  def writeJsonlZst(df: DataFrame, path: String,
                    maxRecordsPerFile: Long = 0L): Unit = {
    register(df.sparkSession)
    Jsonl.write(df, path, maxRecordsPerFile, compression = CodecClass)
  }

  /** [[Jsonl.read]] over `.zst` shards — same explicit-schema +
    * quarantine contract; the codec just unwraps the byte stream. */
  def readJsonlZst(spark: SparkSession, path: String,
                   schema: StructType): DataFrame = {
    register(spark)
    Jsonl.read(spark, path, schema)
  }
}

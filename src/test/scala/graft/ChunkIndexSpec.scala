package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.ChunkIndex

/**
 * Persisted CDC chunk-index lifecycle: create → probe → append →
 * re-probe, plus the chunk-granularity cut/rewrite pair. The
 * load-bearing contracts:
 *  - `cdcNoveltyAgainstIndex` ≡ inline `cdcNovelty` (the Bloom front
 *    has no false negatives; positives resolve exactly);
 *  - `append` is idempotent-by-content (already-indexed hashes never
 *    re-land) and flips appended content's novelty to 0;
 *  - the byte-splice rewrite conserves bytes exactly and round-trips
 *    cut-free documents byte-identically.
 */
class ChunkIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private val lorem = (1 to 40).map(i =>
    s"alpha$i beta$i gamma$i delta$i").mkString(" ")

  test("create + probe: inline and persisted novelty agree row-for-row") {
    val history = mkDocs((1L, lorem), (2L, lorem.reverse),
      (3L, "tiny"), (4L, lorem.toUpperCase))
    val chunks = Dedup.cdcChunkHashes(history, "doc_id", "text",
      16, 32, 256)
    val dir = tmpDir()
    ChunkIndex.create(chunks, dir, buckets = 4)
    val batch = mkDocs(
      (10L, lorem), // exact copy -> 0.0
      (11L, "prefix edit :: " + lorem), // partial
      (12L, "entirely new material never indexed at all zz"))
    val inline = Dedup.cdcNovelty(batch, "doc_id", "text", chunks,
      16, 32, 256).orderBy("doc_id").collect().toSeq
    val state = Dedup.cdcNoveltyAgainstIndex(batch, "doc_id", "text",
      dir, 16, 32, 256).orderBy("doc_id").collect().toSeq
    assert(inline == state)
    val byId = state.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(10L) == 0.0)
    assert(byId(11L) > 0.0 && byId(11L) < 1.0)
    assert(byId(12L) == 1.0)
  }

  test("append: novelty flips to 0, re-append adds no rows, sketch merges") {
    val history = mkDocs((1L, lorem))
    val dir = tmpDir()
    ChunkIndex.create(Dedup.cdcChunkHashes(history, "doc_id", "text",
      16, 32, 256), dir, buckets = 4)
    val batch = mkDocs((20L, "all new content block " + lorem.reverse))
    val before = Dedup.cdcNoveltyAgainstIndex(batch, "doc_id", "text",
      dir, 16, 32, 256).collect()(0)
    assert(before.getDouble(3) > 0.9)
    val batchChunks = Dedup.cdcChunkHashes(batch, "doc_id", "text",
      16, 32, 256)
    ChunkIndex.append(batchChunks, dir)
    val after = Dedup.cdcNoveltyAgainstIndex(batch, "doc_id", "text",
      dir, 16, 32, 256).collect()(0)
    assert(after.getDouble(3) == 0.0, s"novelty after append: $after")
    // idempotent by content: a second append of the same chunks must
    // not duplicate index rows
    val n1 = ChunkIndex.hashes(spark, dir).count()
    ChunkIndex.append(batchChunks, dir)
    assert(ChunkIndex.hashes(spark, dir).count() == n1)
    // and the index stays distinct overall
    assert(ChunkIndex.hashes(spark, dir).distinct().count() == n1)
  }

  test("meta round-trips; append uses the pinned sketch sizing") {
    val dir = tmpDir()
    ChunkIndex.create(Dedup.cdcChunkHashes(mkDocs((1L, lorem)),
      "doc_id", "text", 16, 32, 256), dir, buckets = 8,
      expectedItems = 5000L, numBits = 1L << 16)
    val m = ChunkIndex.readMeta(dir)
    assert(m == ChunkIndex.Meta(8, 5000L, 1L << 16))
    // merging a batch sketch built with the pinned sizing must work
    // (mergeInPlace rejects mismatched sizes — this would throw)
    ChunkIndex.append(Dedup.cdcChunkHashes(
      mkDocs((2L, lorem.reverse)), "doc_id", "text", 16, 32, 256), dir)
    assert(ChunkIndex.sketch(dir).isDefined)
  }

  test("chunk cuts: first occurrence survives, copies cut to empty, " +
      "bytes conserve, cut-free docs round-trip byte-identically") {
    val corpus = mkDocs(
      (1L, lorem),
      (2L, lorem), // exact copy of 1 -> fully cut
      (3L, "lead in text :: " + lorem), // shared suffix partially cut
      (4L, "completely disjoint material with its own words"))
    val cuts = Dedup.cdcDuplicateChunkCuts(corpus, "doc_id", "text",
      16, 32, 256)
    val rw = Dedup.rewriteWithoutChunkCuts(corpus, cuts,
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rw(1L) == lorem, "first occurrence must survive intact")
    assert(rw(2L) == "", "exact copy must cut to empty")
    assert(rw(3L).nonEmpty && rw(3L).length < lorem.length + 16,
      s"shared-suffix doc should keep ~its novel prefix, " +
        s"kept ${rw(3L).length}")
    assert(rw(4L) == corpus.where(col("doc_id") === 4L)
      .collect()(0).getString(1), "cut-free doc must round-trip")
    // conservation: kept + cut = original, per doc
    val cutBytes = cuts.groupBy("doc_id")
      .agg(sum(col("cut_end") - col("cut_start")).as("cb"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.collect().foreach { r =>
      val id = r.getLong(0)
      val orig = r.getString(1).getBytes("UTF-8").length
      val kept = rw(id).getBytes("UTF-8").length
      assert(kept == orig - cutBytes.getOrElse(id, 0L),
        s"doc $id: kept $kept orig $orig cut ${cutBytes.get(id)}")
    }
  }

  test("day-0 bootstrap: an empty-history index probes all-novel and accepts the first append") {
    val dir = tmpDir()
    ChunkIndex.create(
      Dedup.cdcChunkHashes(mkDocs(), "doc_id", "text", 16, 32, 256),
      dir, buckets = 4)
    // an empty create commits no sketch and no chunk data files; the
    // probe must read that as "everything novel", not crash on an
    // unreadable parquet directory
    val batch = mkDocs((1L, lorem))
    val first = Dedup.cdcNoveltyAgainstIndex(batch, "doc_id", "text",
      dir, 16, 32, 256).collect()(0)
    assert(first.getDouble(3) == 1.0, "day-0 content must be fully novel")
    ChunkIndex.append(
      Dedup.cdcChunkHashes(batch, "doc_id", "text", 16, 32, 256), dir)
    val second = Dedup.cdcNoveltyAgainstIndex(batch, "doc_id", "text",
      dir, 16, 32, 256).collect()(0)
    assert(second.getDouble(3) == 0.0, "appended content must score 0")
  }

  test("concurrent appends serialize: no sketch false negatives, no duplicate index rows") {
    // Without the per-index append lock, two racing appends both read
    // the pre-append sketch and the later writeSketch drops the
    // earlier batch's bits — those hashes become sketch FALSE
    // NEGATIVES (silently admitted duplicates, the one contract
    // violation), and the racing anti-join probes re-append duplicate
    // rows. 8 threads × disjoint batches, then every batch must score
    // novelty 0.0 and the index must hold exactly the distinct union.
    val dir = tmpDir()
    ChunkIndex.create(Dedup.cdcChunkHashes(mkDocs((1L, lorem)),
      "doc_id", "text", 16, 32, 256), dir, buckets = 4)
    val batches = (0 until 8).map { i =>
      mkDocs((100L + i, s"thread $i distinct corpus " +
        (1 to 30).map(j => s"w${i}_$j").mkString(" ")))
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = batches.map { b =>
        pool.submit(new Runnable {
          def run(): Unit = ChunkIndex.append(
            Dedup.cdcChunkHashes(b, "doc_id", "text", 16, 32, 256), dir)
        })
      }
      futs.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    batches.foreach { b =>
      val nov = Dedup.cdcNoveltyAgainstIndex(b, "doc_id", "text",
        dir, 16, 32, 256).collect()(0).getDouble(3)
      assert(nov == 0.0, s"appended batch scored novel ($nov): a " +
        "racing append dropped its sketch bits or index rows")
    }
    val all = ChunkIndex.hashes(spark, dir)
    assert(all.count() == all.distinct().count(),
      "racing appends duplicated index rows")
  }

  test("readers interleaved with appends: no torn sketch, no false " +
      "negatives on committed history, crashed-append leftovers ignored") {
    // The S4-class torn-read scenario, for the repo's own mutable
    // state: a probe concurrent with appends must never (a) crash on
    // a half-written sketch (writes are atomic-rename committed), or
    // (b) score ALREADY-COMMITTED content as novel (a false negative
    // — the one contract violation). It may transiently miss an
    // IN-FLIGHT append's content (read-committed, documented).
    val dir = tmpDir()
    val committed = mkDocs((1L, lorem), (2L, lorem.reverse))
    ChunkIndex.create(Dedup.cdcChunkHashes(committed, "doc_id", "text",
      16, 32, 256), dir, buckets = 4)
    // plant a crashed writer's leftover: a stale .tmp the atomic
    // rename never moved — readers and future appends must ignore it
    java.nio.file.Files.write(
      new java.io.File(dir, "sketch.tmp999").toPath,
      Array.fill[Byte](64)(0x5A))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writer = new Thread(() => {
      var i = 0
      while (!stop.get && i < 6) {
        ChunkIndex.append(Dedup.cdcChunkHashes(
          mkDocs((200L + i, s"appender wave $i " +
            (1 to 25).map(j => s"w${i}_$j").mkString(" "))),
          "doc_id", "text", 16, 32, 256), dir)
        i += 1
      }
    })
    writer.start()
    try {
      var probes = 0
      while (writer.isAlive && probes < 20) {
        val rows = Dedup.cdcNoveltyAgainstIndex(committed, "doc_id",
          "text", dir, 16, 32, 256).collect()
        rows.foreach { r =>
          if (r.getDouble(3) != 0.0)
            failures.add(s"committed doc ${r.getLong(0)} scored " +
              s"novel (${r.getDouble(3)}) during concurrent appends")
        }
        probes += 1
      }
    } finally { stop.set(true); writer.join(120000) }
    assert(failures.isEmpty, failures.toArray.mkString("; "))
    // the stale tmp is still there (never trusted), the live sketch
    // carries every append (no torn/partial state)
    assert(new java.io.File(dir, "sketch.tmp999").isFile)
    (0 until 6).foreach { i =>
      val nov = Dedup.cdcNoveltyAgainstIndex(
        mkDocs((900L + i, s"appender wave $i " +
          (1 to 25).map(j => s"w${i}_$j").mkString(" "))),
        "doc_id", "text", dir, 16, 32, 256).collect()(0).getDouble(3)
      assert(nov == 0.0, s"wave $i lost from the index ($nov)")
    }
  }

  test("compact: probe equivalence before/after, files merge to one " +
      "per bucket, a pinned reader survives the publish, and the GC " +
      "bound holds over repeated compacts") {
    val dir = tmpDir()
    ChunkIndex.create(Dedup.cdcChunkHashes(mkDocs((1L, lorem)),
      "doc_id", "text", 16, 32, 256), dir, buckets = 4)
    // accumulate append file sets
    (2 to 6).foreach { i =>
      ChunkIndex.append(Dedup.cdcChunkHashes(
        mkDocs((i.toLong, s"batch $i material " + lorem.drop(i * 7))),
        "doc_id", "text", 16, 32, 256), dir)
    }
    val probeBatch = mkDocs(
      (50L, lorem), // fully indexed
      (51L, "batch 4 material " + lorem.drop(28)), // appended content
      (52L, "never seen content qq zz " + lorem.reverse))
    val before = Dedup.cdcNoveltyAgainstIndex(probeBatch, "doc_id",
      "text", dir, 16, 32, 256).orderBy("doc_id").collect().toSeq
    val hashesBefore = ChunkIndex.hashes(spark, dir)
      .collect().map(_.getLong(0)).sorted.toSeq
    // pin a reader BEFORE the compact (force physical planning so the
    // file list resolves now)
    val pinned = ChunkIndex.hashes(spark, dir).groupBy()
      .agg(count(lit(1)).as("n"))
    pinned.queryExecution.executedPlan
    def dataFiles(d: java.io.File): Int =
      if (!d.isDirectory) 0
      else Option(d.listFiles).map(_.map(f =>
        if (f.isDirectory) dataFiles(f)
        else if (f.getName.endsWith(".parquet")) 1 else 0).sum)
        .getOrElse(0)
    def chunkDirs() = Option(new java.io.File(dir).listFiles).get
      .filter(f => f.isDirectory && f.getName.startsWith("chunks"))
    val filesBefore = chunkDirs().map(dataFiles).sum
    assert(filesBefore > 4, s"appends must accumulate files ($filesBefore)")
    ChunkIndex.compact(spark, dir)
    // the retired layout survives one cycle: the pinned reader works
    assert(pinned.collect()(0).getLong(0) == hashesBefore.length)
    // probe equivalence: same rows, same novelty after the compact
    val after = Dedup.cdcNoveltyAgainstIndex(probeBatch, "doc_id",
      "text", dir, 16, 32, 256).orderBy("doc_id").collect().toSeq
    assert(after == before, "novelty probe must be unchanged by compact")
    assert(ChunkIndex.hashes(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == hashesBefore, "the hash set is invariant")
    // one file per bucket in the live version
    val live = chunkDirs().filter(_.getName != "chunks")
      .maxBy(_.getName.drop(8).toInt)
    assert(dataFiles(live) <= 4,
      s"compact must leave ~one file per bucket (${dataFiles(live)})")
    // GC bound: repeated compacts keep at most current + grace
    ChunkIndex.compact(spark, dir)
    ChunkIndex.compact(spark, dir)
    assert(chunkDirs().length <= 2,
      s"grace GC must bound versions: ${chunkDirs().map(_.getName).toSeq}")
    assert(Dedup.cdcNoveltyAgainstIndex(probeBatch, "doc_id", "text",
      dir, 16, 32, 256).orderBy("doc_id").collect().toSeq == before)
    // an append AFTER compacts lands in the live version and probes
    ChunkIndex.append(Dedup.cdcChunkHashes(
      mkDocs((52L, "never seen content qq zz " + lorem.reverse)),
      "doc_id", "text", 16, 32, 256), dir)
    val post = Dedup.cdcNoveltyAgainstIndex(probeBatch, "doc_id",
      "text", dir, 16, 32, 256).orderBy("doc_id").collect()
    assert(post.find(_.getLong(0) == 52L).get.getDouble(3) == 0.0,
      "content appended after a compact must probe as seen")
  }

  test("within-document repeats cut after their first occurrence") {
    val rep = lorem + " " + lorem // doc repeating its own content
    val corpus = mkDocs((1L, rep))
    val rw = Dedup.rewriteWithoutChunkCuts(corpus,
      Dedup.cdcDuplicateChunkCuts(corpus, "doc_id", "text", 16, 32, 256),
      "doc_id", "text").collect()(0).getString(1)
    // the second half re-synchronizes to the first half's chunks, so
    // most of it cuts; the survivor keeps roughly one copy
    assert(rw.length < rep.length * 3 / 4,
      s"within-doc repeat not cut: kept ${rw.length} of ${rep.length}")
    assert(rw.startsWith(lorem.take(32)), "prefix must survive")
  }
}

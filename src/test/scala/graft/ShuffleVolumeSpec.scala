package graft

import graft.plans.ShuffleAudit
import org.scalatest.funsuite.AnyFunSuite

/**
 * Shuffle-VOLUME gate: the plan-shape pins (GoldenPlanSpec) catch a
 * lost broadcast or an extra exchange; this catches the quieter
 * regression where the exchange count is UNCHANGED but a wide column
 * (document text, media bytes, embeddings) starts riding a shuffle
 * that used to carry keys. Budgets are measured at sf0.01
 * (ShuffleAuditDump) with ~2x headroom — generous enough for
 * partition-count jitter, far below the 10-100x a text column costs.
 */
class ShuffleVolumeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.01"

  test("every audited query has a budget and vice versa") {
    assert(ShuffleVolumeSpec.audited.toSet ==
      ShuffleVolumeSpec.budgets.keySet)
  }

  ShuffleVolumeSpec.budgets.foreach { case (name, (maxBytes, maxAvgRow)) =>
    test(s"$name stays inside its shuffle-volume budget") {
      val v = ShuffleAudit.audit(
        SparkEntry.queries(name)(TestSpark.spark, sfDir))
      assert(v.totalBytes <= maxBytes,
        s"$name shuffled ${v.totalBytes} bytes (budget $maxBytes) — " +
          "a wide column is riding an exchange that used to carry keys. " +
          "If the change is deliberate, regenerate with ShuffleAuditDump " +
          "in the same commit with the reason in the message.")
      assert(v.maxAvgRowBytes <= maxAvgRow,
        f"$name's widest exchange averages ${v.maxAvgRowBytes}%.1f " +
          f"bytes/row (budget $maxAvgRow%.1f) — rows grew wider, not " +
          "just more numerous. Offending exchanges: " +
          v.exchanges.filter(_.avgRowBytes > maxAvgRow)
            .map(e => f"${e.bytes}B/${e.records}rows=" +
              f"${e.avgRowBytes}%.1f").mkString(", ") +
          ". Same contract: deliberate changes regenerate the table " +
          "in-commit.")
    }
  }
}

object ShuffleVolumeSpec {
  /** The audited set: the dedup/admission/retrieval families whose
    * scale posture RESTS on key-only exchanges, plus the two CDC
    * chunk operators (chunk hashes, never chunk bytes). */
  val audited: Seq[String] = Seq(
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_survivors",
    "q_dedup_semantic",
    "q_ingest_admission",
    "q_cdc_chunk_dedup",
    "q_cdc_novelty",
    "q_bm25_search",
    "q_hybrid_search_ivf",
    "q_ann_ivfpq",
    // round 14: the remaining steady-state/incremental families —
    // their contract is BATCH-sized shuffles independent of history
    "q_ingest_admission_state",
    "q_dedup_incremental_minhash",
    "q_dedup_incremental_semantic",
    "q_video_sequence_incremental",
    "q_cdc_novelty_state",
    // round 15: the sketch-log set-op family — exchanges carry keys
    // and <=(2^lgK*8B) sketch binaries, never documents
    "q_theta_overlap",
    // round 16: the persisted-log twin (exact legs + two log probes —
    // same saturation semantics as q_theta_overlap) and the bucketed
    // documents join (the join itself exchange-FREE; the only shuffle
    // is the final per-source agg, key+counters rows)
    "q_contamination_theta_state",
    "q_bucketed_doc_join")

  /** query -> (max total shuffle bytes, max per-exchange avg bytes/row)
    * — measured by ShuffleAuditDump at sf0.01, ~2x headroom (more for
    * the tiny-volume queries where fixed per-partition framing
    * dominates). q_ingest_admission's 1600 B/row allowance is the ONE
    * deliberate text-bearing exchange in the audited set: the
    * admission batch's text flows ONCE to the banded exact-verify
    * join (batch-sized by definition — measured 38 rows × 798 B at
    * sf0.01); every other exchange in the family is key-only
    * (8-20 B/row). */
  val budgets: Map[String, (Long, Double)] = Map(
    "q_dedup_exact" -> (60000L, 100.0), // measured 20265B, 40.5 B/row
    "q_dedup_minhash" -> (400000L, 150.0), // 165343B, 70.0
    "q_dedup_survivors" -> (20000L, 60.0), // 1753B, 15.1
    "q_dedup_semantic" -> (20000L, 60.0), // 1753B, 15.1
    "q_ingest_admission" -> (120000L, 1600.0), // 50808B, 798.1 (see above)
    "q_cdc_chunk_dedup" -> (40000L, 130.0), // 11563B, 59.0
    "q_cdc_novelty" -> (60000L, 160.0), // 22333B, 73.0
    "q_bm25_search" -> (800000L, 160.0), // 386879B, 72.0
    "q_hybrid_search_ivf" -> (500000L, 160.0), // 229741B, 73.0
    "q_ann_ivfpq" -> (30000L, 100.0), // 9248B, 44.4
    // round 14 — the steady-state/incremental five: all flat in TOTAL
    // bytes across the sf0.01→sf0.1 step (shuffle_evidence/), which is
    // the batch-fixed contract; the two ~750-850 B/row entries are the
    // admission-style batch-text exact-verify exchange (batch-sized by
    // definition), same as q_ingest_admission's documented allowance
    "q_ingest_admission_state" -> (120000L, 1600.0), // 50808B, 798.1
    "q_dedup_incremental_minhash" -> (120000L, 1600.0), // 50371B, 739.6
    "q_dedup_incremental_semantic" -> (10000L, 60.0), // 1009B, 20.0
    "q_video_sequence_incremental" -> (10000L, 150.0), // 2221B, 64.6
    "q_cdc_novelty_state" -> (20000L, 160.0), // 5408B, 73.0
    // round 15 — theta set-op gate. NOT a flat-budget family: its
    // exchanges carry sketch PARTIALS of min(distinct, 2^lgK)·8B
    // each, so volume grows with distinct keys until it SATURATES at
    // 2^lgK (the exact-mode leg pins exactness at gated SFs with
    // lgK=20; production estimation-mode sketches at lgK≤12 are
    // ≤32KB per partial regardless of data volume). Budget = ~2x the
    // sf0.01 measurement; the row-avg allowance is the wide sketch
    // rows themselves — there is still no document text on any
    // exchange (the keys are 8-byte hashes).
    "q_theta_overlap" -> (1700000L, 310000.0), // 826780B, 150748.0
    // round 16 — the persisted-log twin: volume is the gate's EXACT
    // verification legs (8-byte shingle keys) plus two KB-scale log
    // probes; the wide row-avg is the sketch partials, same
    // saturation argument as q_theta_overlap. The bucketed doc join's
    // ONE exchange is the final per-source agg — the join itself
    // shuffles nothing at any scale (that's the pinned plan).
    "q_contamination_theta_state" -> (1200000L, 150000.0), // 574407B, 69833.5
    "q_bucketed_doc_join" -> (16000L, 100.0)) // 7099B, 46.1
}

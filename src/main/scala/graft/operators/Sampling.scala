package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable sampling for training-data pipelines.
 * Extension beyond the reference surface (SURVEY.md §2 — parquery has no
 * sampling operator).
 *
 * Why not `df.sample(fraction)`: Spark's sampler draws per-partition from
 * a seeded RNG, so membership depends on partitioning — re-running after
 * a repartition (or in another engine) yields a different sample. Pipelines
 * need the SAME sample on every run and every engine so downstream shards,
 * eval splits and dedup decisions are reproducible. Hashing a stable key
 * gives that: membership is a pure function of (key, salt, fraction).
 *
 * Scale shape: one codegen'd projection + filter per row — no shuffle, no
 * RNG state, pushdown-friendly (the md5 filter doesn't reach parquet, but
 * partition pruning on other predicates is unaffected).
 */
object Sampling {

  /**
   * Keep rows whose `md5(salt || key)` 4-hex-digit prefix falls below
   * `fraction` of the 16^4 space. Deterministic across runs, partitionings
   * and engines (the same predicate is expressible in any SQL dialect with
   * `md5`; hex-string comparison orders like the number it encodes).
   * Resolution is 1/65536 ≈ 0.0015 of a fraction step.
   */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = ""): DataFrame = {
    df.where(hashSamplePredicate(col(keyCol), fraction, salt))
  }

  /** The membership predicate itself, for composition into other plans. */
  def hashSamplePredicate(key: Column, fraction: Double,
                          salt: String = ""): Column = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 4) <
      lit(hexThreshold(fraction))
  }

  /** 4-hex-digit lower-case threshold: floor(fraction * 16^4). Fraction
    * 1.0 returns "g" — lexically after every hex prefix — so keep-all
    * really keeps ALL (a "ffff" cap would silently drop the ~1/65536 of
    * keys whose prefix is exactly ffff). */
  def hexThreshold(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else f"${math.min((fraction * 65536).toLong, 65535L)}%04x"

  /**
   * Deterministic per-group sample: keep at most `k` rows per group, the
   * rows whose `md5(salt || key)` sorts lowest (a uniform random-but-
   * stable order). The window shuffles once on the group key — the same
   * shape as any per-group top-k; no RNG, no reservoir state.
   */
  def hashSamplePerGroup(df: DataFrame, keyCol: String,
                         groupCols: Seq[String], k: Int,
                         salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(md5(concat(lit(salt), col(keyCol).cast("string"))),
        col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
  }

  /**
   * Per-row weighted keep: row survives iff its hash lands below its own
   * `weightCol` (clamped to [0,1]) — e.g. quality scores as sampling
   * weights, so high-quality documents are kept proportionally more
   * often. Deterministic like [[hashSample]]; the per-row threshold is
   * rendered to a 4-hex-digit string (`format_string("%04x", ...)`), so
   * the same predicate runs in any SQL engine with `md5` + `printf`.
   * Weight 1.0 renders the `"g"` sentinel like [[hexThreshold]] — a
   * "ffff" cap would silently drop the ~1/65536 of keys whose md5
   * prefix is exactly ffff despite an explicit keep-all weight.
   */
  def hashSampleWeighted(df: DataFrame, keyCol: String, weightCol: String,
                         salt: String = ""): DataFrame = {
    val clamped = greatest(lit(0.0), least(lit(1.0),
      col(weightCol).cast("double")))
    val threshold = when(clamped >= 1.0, lit("g"))
      .otherwise(format_string("%04x",
        least(floor(clamped * 65536), lit(65535.0)).cast("int")))
    df.where(
      substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 4) <
        threshold)
  }

  /**
   * Deterministic train/val/test-style split assignment: hash the key into
   * [0,1) and bucket by cumulative fractions. Returns the input plus a
   * `split` column. `fractions` must sum to ~1 (last split absorbs
   * rounding).
   */
  def splitAssign(df: DataFrame, keyCol: String,
                  fractions: Seq[(String, Double)],
                  salt: String = ""): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-6,
      s"split fractions must sum to 1, got $total")
    val hexPrefix =
      substring(md5(concat(lit(salt), col(keyCol).cast("string"))), 1, 4)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // last bucket is the otherwise-branch: absorbs the 65535/65536 edge
    val assigned = fractions.init.zip(cum.init).foldRight(
      lit(fractions.last._1)) { case (((name, _), upper), acc) =>
      when(hexPrefix < lit(hexThreshold(upper)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /**
   * Leakage-free train/val/test assignment: members of the same
   * duplicate cluster MUST land in the same split, or eval splits leak
   * (near-)copies of training text — the standard decontamination
   * requirement for held-out sets. Splits are assigned by hashing the
   * CLUSTER label instead of the document id; documents in no cluster
   * (never candidates) hash their own id, which is identical to
   * [[splitAssign]] for them.
   *
   * `labels` is any (id, cluster) frame — `Dedup.duplicateClusters`
   * output for near-dup families, or an exact-dup labeling
   * (min-id-per-text-hash) for exact families.
   *
   * Scale shape: one broadcast-or-hash LEFT join (the label frame is
   * cluster-membership-sized, usually tiny next to the corpus) feeding
   * the same zero-shuffle codegen'd hash-bucket projection as
   * [[splitAssign]].
   */
  def leakageSafeSplitAssign(df: DataFrame, labels: DataFrame,
                             idCol: String,
                             fractions: Seq[(String, Double)],
                             salt: String = ""): DataFrame = {
    // internal name for the joined label: a caller's own `cluster`
    // column must neither collide (ambiguous reference) nor be dropped
    val keyed = df.join(
      labels.select(col("id").as(idCol),
        col("cluster").as("__lk_cluster")), Seq(idCol), "left")
      .withColumn("__skey", coalesce(col("__lk_cluster"), col(idCol)))
    splitAssign(keyed, "__skey", fractions, salt)
      .drop("__lk_cluster", "__skey")
  }

  /**
   * Deterministic stratified sample: per-stratum keep fractions (corpus
   * rebalancing — downsample dominant languages, keep rare ones whole),
   * with membership a pure function of (key, salt, stratum fraction) —
   * the same md5-prefix predicate as [[hashSample]], thresholded per
   * stratum through one CASE. Unlike `df.stat.sampleBy` (per-partition
   * seeded RNG: membership changes under repartitioning and differs
   * across engines), this sample is reproducible anywhere `md5` exists,
   * so it is oracle-comparable and replay-stable. Strata absent from
   * `fractions` fall back to `defaultFraction` (0 = drop). A null key
   * hashes a fixed sentinel instead of propagating null (md5(null) is
   * null and `< threshold` would silently drop the row even in a
   * fraction-1.0 "keep ALL" stratum); note this makes all null-key rows
   * ONE equivalence class — in a fractional stratum they are kept or
   * dropped together, like any other repeated key value. Use a non-null
   * unique key for per-row sampling semantics. Zero shuffles — one
   * codegen'd filter.
   */
  def stratifiedHashSample(df: DataFrame, keyCol: String,
                           stratumCol: String,
                           fractions: Map[String, Double],
                           salt: String = "",
                           defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fraction must be in [0,1], got $f"))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(hexThreshold(defaultFraction))) {
        case (acc, (stratum, f)) =>
          when(col(stratumCol) === stratum, lit(hexThreshold(f)))
            .otherwise(acc)
      }
    df.where(substring(
      md5(concat(lit(salt),
        coalesce(col(keyCol).cast("string"), lit("__graft_null__")))),
      1, 4) < threshold)
  }

  /**
   * Deterministic per-group cap (RefinedWeb-style "at most N documents
   * per domain/source"): keep the `cap` rows of each group that rank
   * first by `(md5(salt + key), key)` — a reproducible uniform choice
   * within the group, not head-of-file bias (file order is an accident
   * of layout; the hash order is a property of the data). The window
   * partitions by group — never global — and the `row_number <= cap`
   * filter plans as WindowGroupLimit, so each task discards beyond-cap
   * rows during the sort instead of ranking whole groups. One key
   * shuffle; survivors are a pure function of (group, key, salt, cap)
   * PROVIDED `keyCol` is unique within each group — rows sharing a key
   * (all null keys collapse to one sentinel class) tie on both the
   * hash and the tiebreak, and which physical row survives a tie is
   * partition-order dependent. Use a unique key (doc id) for
   * reproducible survivors.
   */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  cap: Int, salt: String = ""): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt),
          coalesce(col(keyCol).cast("string"), lit("__graft_null__")))),
        col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /**
   * Deterministic training-order shuffle: every training run needs the
   * corpus in a uniform-random order that is REPRODUCIBLE (checkpoint
   * resume, ablation reruns, bug bisection) — a `rand()`-keyed sort is
   * partition-layout-dependent and unrerunnable. Here the order is a
   * pure function of (key, salt): rows are sharded by the first hex
   * digit of `md5(salt || key)` and positioned within their shard by
   * the full hash (key tiebreak for hash collisions), yielding
   * `(shard, pos)` — shard-major traversal IS the shuffled order, and
   * changing `salt` is a fresh epoch-level reshuffle with zero state.
   *
   * Scale shape: one hash shuffle on the shard key + a per-shard sort
   * — NEVER a global total-order sort (a range exchange over 100 TB);
   * shard-major order makes the global position unnecessary, and each
   * shard is written/consumed as its own file set. `shards` must
   * divide 16 (shard = hex digit mod shards) so the digit → shard map
   * is uniform and replayable by any engine with `md5` + `strpos`.
   */
  def deterministicShuffle(df: DataFrame, keyCol: String,
                           shards: Int = 16,
                           salt: String = ""): DataFrame = {
    require(shards >= 1 && 16 % shards == 0,
      s"shards must divide 16 (uniform hex-digit map), got $shards")
    // fail loudly instead of silently replacing caller data: the
    // output claims these two names
    Seq("pos", "shard").foreach(c => require(!df.columns.contains(c),
      s"deterministicShuffle emits a '$c' column; input already has one"))
    // null keys hash as a sentinel class (same convention as
    // hashSample/capPerGroup) — not first-by-null-ordering
    val h = md5(concat(lit(salt),
      coalesce(col(keyCol).cast("string"), lit("__graft_null__"))))
    val shard = pmod(instr(lit("0123456789abcdef"), substring(h, 1, 1)) - 1,
      lit(shards))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard"))
      .orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h).withColumn("__shard", shard)
      .withColumn("pos", row_number().over(w))
      .withColumn("shard", col("__shard"))
      .drop("__h", "__shard")
  }

  /**
   * Deterministic fixed-size uniform sample: exactly `n` rows (fewer
   * only if the input is smaller), the ones ranking first by
   * `(md5(salt || key), key)` — the fixed-COUNT counterpart of
   * [[hashSample]]'s fixed-RATE keep, for "give me exactly 10k docs
   * for the eval set" requests where a fraction under- or overshoots.
   * Same determinism contract: membership is a pure function of
   * (key, salt, n), stable across runs, partitionings, and engines.
   * Plans as TakeOrderedAndProject (per-partition top-n, n-row driver
   * merge) — no global sort, no reservoir state, unlike
   * `df.sample`'s partition-seeded RNG or RDD `takeSample`'s
   * driver-side reservoir.
   */
  def hashSampleN(df: DataFrame, keyCol: String, n: Int,
                  salt: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // null keys rank by the sentinel's hash like everywhere else in
    // this family — without the coalesce, md5(null) = null sorts FIRST
    // under asc and null-keyed rows would always win membership
    df.orderBy(md5(concat(lit(salt),
        coalesce(col(keyCol).cast("string"), lit("__graft_null__")))),
        col(keyCol))
      .limit(n)
  }

  /**
   * Round-robin source interleave: position each row within its source
   * by the [[deterministicShuffle]] hash order, so `batch = pos` takes
   * the b-th document of EVERY source together — the standard
   * source-balanced data order for multi-corpus training (each batch
   * sees all sources; within a source the order is a reproducible
   * shuffle). Sources of different sizes exhaust at different batch
   * indices — downstream either truncates at the smallest source
   * (strict balance) or lets survivors continue (natural mixing);
   * both are filters on the emitted `batch`. One shuffle on the
   * source key; the window is per-source, never global.
   */
  def interleaveBySource(df: DataFrame, sourceCol: String,
                         keyCol: String, salt: String = ""): DataFrame = {
    require(!df.columns.contains("batch"),
      "interleaveBySource emits a 'batch' column; input already has one")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit(salt),
          coalesce(col(keyCol).cast("string"), lit("__graft_null__")))),
        col(keyCol))
    df.withColumn("batch", row_number().over(w) - 1)
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SparkEntry._

/** Round-3 extensions: substring-span dedup, C4 quality filter,
  * fuzzy join, embedding transforms, event analytics, unpivot. */
private[graft] object RegistryRound3 {

  val entries: Seq[Q] = Seq(
    // substring-level duplicate spans (Lee et al. 2022 style). The corpus
    // has no natural 10-gram repeats, so the query plants them via
    // spanAugmented (shared with the round-6 span-cut queries): every
    // doc gets the first 12 words of donor doc (doc_id % 10) appended —
    // the 3 windows inside that suffix duplicate corpus-wide
    Q("q_dup_spans",
      (s, d) => graft.operators.Dedup.duplicateSpans(
        spanAugmented(s, d), "doc_id", "text", spanWords = 10),
      Some(spanStatsOracle)),

    Q("q_quality_c4",
      (s, d) => graft.functions.TextAnalysis.c4Signals(
        s.read.parquet(pq(d, "documents")), "doc_id", "text")
        .withColumn("n_words", col("n_words").cast("long")),
      // empty/whitespace docs: Spark's tokens() yields an EMPTY array
      // (n_words 0, mean_word_len 0.0) where a bare string_split_regex
      // would yield [''] (n_words 1) — the CASEs keep the engines aligned
      Some("""WITH t AS (SELECT doc_id, text,
                CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END AS toks
                FROM documents),
              s AS (SELECT doc_id, len(toks) AS n_words,
                CASE WHEN len(toks) = 0 THEN 0.0
                  ELSE ROUND(list_aggregate(list_transform(toks,
                    w -> length(w)),
                  'sum') / CAST(len(toks) AS DOUBLE), 4) END
                  AS mean_word_len,
                CASE WHEN regexp_matches(text, '[.!?]\s*$') THEN 1 ELSE 0
                  END AS ends_punct,
                CASE WHEN contains(text, '{') THEN 1 ELSE 0 END AS has_brace,
                CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1
                  ELSE 0 END AS has_lorem FROM t)
              SELECT doc_id, n_words, mean_word_len, ends_punct, has_brace,
                has_lorem,
                CASE WHEN n_words BETWEEN 50 AND 100000
                  AND mean_word_len BETWEEN 3.0 AND 10.0
                  AND has_brace = 0 AND has_lorem = 0
                  THEN 1 ELSE 0 END AS keep
              FROM s""")),

    // blocked fuzzy join: part names vs a typo'd copy (last char dropped)
    Q("q_fuzzy_join",
      (s, d) => {
        val names = s.read.parquet(pq(d, "part"))
          .groupBy(col("p_name")).agg(min(col("p_partkey")).as("id"))
        val typos = names.select((col("id") + 1000000L).as("id"),
          expr("substring(p_name, 1, length(p_name) - 1)").as("p_name"))
        graft.operators.FuzzyJoin.levenshteinJoin(
          names, "id", "p_name", typos, "id", "p_name",
          maxDist = 2, prefixLen = 2, bandWidth = 8)
      },
      Some("""WITH nm AS (SELECT p_name, MIN(p_partkey) AS id FROM part
                GROUP BY p_name),
              ty AS (SELECT id + 1000000 AS id_r,
                substr(p_name, 1, length(p_name) - 1) AS text_r FROM nm),
              l AS (SELECT id AS id_l, p_name AS text_l FROM nm)
              SELECT id_l, id_r, text_l, text_r,
                CAST(levenshtein(text_l, text_r) AS INTEGER) AS dist
              FROM l JOIN ty ON substr(text_l, 1, 2) = substr(text_r, 1, 2)
                AND abs(floor(length(text_l) / 8) -
                  floor(length(text_r) / 8)) <= 1
                AND levenshtein(text_l, text_r) <= 2""")),

    // embedding transforms: scalar digests keep the oracle comparison off
    // array cells (norm fold is a deterministic left-fold in BOTH engines)
    Q("q_emb_normalize",
      (s, d) => {
        import graft.operators.Embeddings
        Embeddings.l2Normalize(s.read.parquet(pq(d, "embeddings")), "embedding")
          .select(col("vec_id"),
            size(col("embedding")).as("dim"),
            round(Embeddings.l2Norm(col("embedding")), 4).as("norm"),
            round(element_at(col("unit_vec"), 1), 4).as("u0"))
      },
      // CASE nsq = 0 mirrors l2Normalize's zero-vector pass-through —
      // without it a zero vector yields NULL/NaN here vs 0.0 in Spark
      Some("""WITH s AS (SELECT vec_id, embedding,
                list_aggregate(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS nsq
                FROM embeddings)
              SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
              ROUND(sqrt(nsq), 4) AS norm,
              ROUND(CASE WHEN nsq = 0 THEN CAST(embedding[1] AS DOUBLE)
                ELSE CAST(embedding[1] AS DOUBLE) / sqrt(nsq) END, 4)
                AS u0
              FROM s""")),

    Q("q_emb_quantize",
      (s, d) => graft.operators.Embeddings.quantizeInt8(
        s.read.parquet(pq(d, "embeddings")), "embedding")
        .select(col("vec_id"),
          round(col("q_scale"), 6).as("q_scale"),
          aggregate(col("q_vec"), lit(0L), (a, x) => a + x).as("q_sum"),
          array_max(col("q_vec")).as("q_max")),
      Some("""WITH s AS (SELECT vec_id, embedding,
                list_aggregate(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale
                FROM embeddings),
              q AS (SELECT vec_id, scale, list_transform(embedding,
                x -> CASE WHEN scale = 0 THEN 0
                  ELSE CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER)
                  END) AS qv FROM s)
              SELECT vec_id, ROUND(scale, 6) AS q_scale,
                CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
                CAST(list_aggregate(qv, 'max') AS INTEGER) AS q_max
              FROM q""")),

    // ---- event analytics -------------------------------------------------
    Q("q_funnel",
      (s, d) => graft.operators.Analytics.funnel(events(s, d),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase")),
      Some("""WITH t1 AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
                FROM events WHERE event_type = 'view' GROUP BY user_id),
              t2 AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
                FROM events e JOIN t1 ON e.user_id = t1.user_id
                WHERE e.event_type = 'click'
                  AND CAST(e.ts AS TIMESTAMP) > t1.t1 GROUP BY e.user_id),
              t3 AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
                FROM events e JOIN t2 ON e.user_id = t2.user_id
                WHERE e.event_type = 'purchase'
                  AND CAST(e.ts AS TIMESTAMP) > t2.t2 GROUP BY e.user_id)
              SELECT 'view' AS step, 1 AS step_idx, COUNT(*) AS n_users
                FROM t1
              UNION ALL SELECT 'click', 2, COUNT(*) FROM t2
              UNION ALL SELECT 'purchase', 3, COUNT(*) FROM t3""")),

    Q("q_cohort",
      (s, d) => graft.operators.Analytics.cohortRetention(events(s, d),
        "user_id", "ts"),
      Some("""WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort
                FROM events GROUP BY user_id),
              a AS (SELECT e.user_id, f.cohort,
                CAST(floor(date_diff('day', f.cohort, CAST(e.ts AS DATE))
                  / 7.0) AS BIGINT) AS age_weeks
                FROM events e JOIN f ON e.user_id = f.user_id)
              SELECT strftime(cohort, '%Y-%m-%d') AS cohort_date, age_weeks,
                COUNT(DISTINCT user_id) AS n_users
              FROM a GROUP BY 1, 2""")),

    Q("q_histogram",
      (s, d) => graft.operators.Analytics.histogram(
        s.read.parquet(pq(d, "lineitem")), "l_extendedprice", 5000.0),
      Some("""SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) *
                CAST(5000.0 AS DOUBLE) AS bin_lo, COUNT(*) AS n
              FROM lineitem WHERE l_extendedprice IS NOT NULL
              GROUP BY 1""")),

    // snapshot drift: price distribution of even- vs odd-orderkey halves
    // (a deterministic split standing in for two ingestion rounds);
    // per-bin probabilities + total-variation distance
    Q("q_drift",
      (s, d) => {
        val li = s.read.parquet(pq(d, "lineitem"))
        graft.operators.Analytics.distributionDrift(
          li.where(col("l_orderkey") % 2 === 0),
          li.where(col("l_orderkey") % 2 === 1),
          "l_extendedprice", 10000.0)
      },
      Some("""WITH b AS (SELECT CAST(floor(l_extendedprice / 10000.0)
                  AS BIGINT) AS bin, COUNT(*) AS nb
                FROM lineitem WHERE l_orderkey % 2 = 0
                  AND l_extendedprice IS NOT NULL GROUP BY 1),
              a AS (SELECT CAST(floor(l_extendedprice / 10000.0)
                  AS BIGINT) AS bin, COUNT(*) AS na
                FROM lineitem WHERE l_orderkey % 2 = 1
                  AND l_extendedprice IS NOT NULL GROUP BY 1),
              j AS (SELECT COALESCE(b.bin, a.bin) AS bin,
                  COALESCE(nb, 0) AS nb, COALESCE(na, 0) AS na
                FROM b FULL OUTER JOIN a ON b.bin = a.bin),
              t AS (SELECT CAST(SUM(nb) AS BIGINT) AS tb,
                  CAST(SUM(na) AS BIGINT) AS ta FROM j),
              p AS (SELECT bin * CAST(10000.0 AS DOUBLE) AS bin_lo,
                  CAST(nb AS DOUBLE) / tb AS pb,
                  CAST(na AS DOUBLE) / ta AS pa
                FROM j CROSS JOIN t),
              tv AS (SELECT CAST(SUM(CAST(abs(round(pb, 6) - round(pa, 6))
                  AS DECIMAL(18,6))) / 2 AS DOUBLE) AS tvd FROM p)
              SELECT bin_lo, round(pb, 6) AS p_before,
                round(pa, 6) AS p_after, round(tvd, 6) AS tv_distance
              FROM p CROSS JOIN tv""")),

    Q("q_zscore_outlier",
      (s, d) => graft.operators.Analytics.zscoreOutliers(events(s, d),
        "event_type", "value", zThreshold = 3.0),
      Some("""WITH m AS (SELECT event_type, AVG(value) AS mu,
                STDDEV_SAMP(value) AS sd FROM events GROUP BY event_type)
              SELECT e.event_type, COUNT(*) AS n,
                CAST(SUM(CASE WHEN sd > 0 AND abs(value - mu) / sd > 3.0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              FROM events e JOIN m ON e.event_type = m.event_type
              GROUP BY e.event_type""")),

    // per-source percentile-rank normalization: exact percent_rank
    // semantics computed from the DISTINCT-value CDF (the window's
    // per-task data is distinct scores per source, never a whole
    // source), replayed by the oracle's real PERCENT_RANK window
    Q("q_score_normalize",
      (s, d) => graft.operators.Analytics.rankNormalize(
          s.read.parquet(pq(d, "documents"))
            .select(col("doc_id"), col("source"), col("n_chars")),
          "source", "n_chars")
        .select(col("doc_id"), col("source"),
          round(col("pct_rank"), 4).as("pct_rank")),
      Some("""SELECT doc_id, source, ROUND(PERCENT_RANK() OVER (
                PARTITION BY source ORDER BY n_chars), 4) AS pct_rank
              FROM documents""")),

    // sketch-quantile variant (approx cut points; per-group state
    // O(buckets) at any score cardinality). Bounded-error gate: the
    // bucketed rank counts cut points ≤ score, whose exact analogue is
    // CUME_DIST (fraction of rows ≤ score — same tie semantics), so the
    // per-ROW verdict |approx − cume_dist| ≤ 1/buckets + sketch slack
    // holds by construction when the sketch is healthy and breaks when
    // it is not. The window is partitioned by source, never global.
    Q("q_score_normalize_approx",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("source"), col("n_chars"))
        graft.operators.Analytics
          .rankNormalizeApprox(docs, "source", "n_chars", buckets = 20)
          .withColumn("__cume", cume_dist().over(
            Window.partitionBy(col("source")).orderBy(col("n_chars"))))
          .select(col("doc_id"), col("source"),
            (abs(col("pct_rank") - col("__cume")) <= lit(0.075))
              .as("within_bound"))
      },
      Some("""SELECT doc_id, source, CAST(1 AS BOOLEAN) AS within_bound
              FROM documents""")),

    // wide-to-long reshape (Spark Dataset.unpivot; SURVEY §2.6 family)
    Q("q_unpivot",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .where(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .withColumn("val", round(col("val"), 4)),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
                ROUND(CAST(l_quantity AS DOUBLE), 4) AS val
              FROM lineitem WHERE l_orderkey < 100
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                ROUND(CAST(l_extendedprice AS DOUBLE), 4)
              FROM lineitem WHERE l_orderkey < 100
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount',
                ROUND(CAST(l_discount AS DOUBLE), 4)
              FROM lineitem WHERE l_orderkey < 100""")))

  // =========================================================================
}

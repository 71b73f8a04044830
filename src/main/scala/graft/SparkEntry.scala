package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2, each paired (where SQL-expressible) with DuckDB oracle SQL
 * over the same parquet tables.
 *
 * Conventions shared by every query/oracle pair:
 *  - every computed column is aliased identically on both sides (the
 *    driver's compare sorts columns by name before hashing);
 *  - order-dependent double aggregates (sum/avg/stddev over doubles) are
 *    rounded to 4 decimals on BOTH sides, since Spark and DuckDB may sum
 *    partitions in different orders (min/max/count need no rounding —
 *    they are exact);
 *  - no query relies on row order (the driver sorts before hashing);
 *    explicitly ordered queries (top-k) use unique tie-breakers.
 */
object SparkEntry {

  /** One registered query: name, Spark impl, optional DuckDB oracle SQL. */
  private final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def pq(dir: String, table: String) = s"$dir/$table.parquet"

  /** One oracle for BOTH q_merge_upsert and q_cdc_snapshot — the two
    * queries are documented to produce the identical final state, so
    * they must share one literal (two copies would let the gates
    * silently test different oracles if the change set evolves). */
  private val mergeUpsertOracleSql =
    """WITH base AS (SELECT o_orderkey, o_totalprice,
                o_orderstatus, 0 AS version, FALSE AS is_delete, 0 AS src
                FROM orders),
              upd AS (
                SELECT o_orderkey, CAST(o_orderkey AS DOUBLE)
                    AS o_totalprice, 'U' AS o_orderstatus, 1 AS version,
                  FALSE AS is_delete, 1 AS src
                FROM orders WHERE o_orderkey % 10 < 3
                UNION ALL
                SELECT o_orderkey, NULL, NULL, 1, TRUE, 1
                FROM orders WHERE o_orderkey % 10 = 3
                UNION ALL
                SELECT -o_orderkey, CAST(o_orderkey AS DOUBLE), 'N', 1,
                  FALSE, 1
                FROM orders WHERE o_orderkey % 10 = 4),
              log AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
              win AS (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY o_orderkey
                  ORDER BY version DESC, src DESC) AS rk FROM log)
              SELECT o_orderkey, o_totalprice, o_orderstatus
              FROM win WHERE rk = 1 AND NOT is_delete"""

  /** One exact-profile oracle shared by q_profile (verbatim) and
    * q_profile_approx (wrapped with the constant verdict column) — the
    * sketch gate and the exact gate must replay the SAME arithmetic, so
    * they share one literal. */
  private val profileExactOracleSql =
    """SELECT 'l_quantity' AS "column", COUNT(*) AS n_rows,
                COUNT(l_quantity) AS n_nonnull,
                COUNT(DISTINCT l_quantity) AS n_distinct,
                ROUND(CAST(MIN(l_quantity) AS DOUBLE), 4) AS min_v,
                ROUND(CAST(MAX(l_quantity) AS DOUBLE), 4) AS max_v,
                ROUND(CAST(AVG(l_quantity) AS DOUBLE), 4) AS avg_v
              FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', COUNT(*),
                COUNT(l_extendedprice), COUNT(DISTINCT l_extendedprice),
                ROUND(CAST(MIN(l_extendedprice) AS DOUBLE), 4),
                ROUND(CAST(MAX(l_extendedprice) AS DOUBLE), 4),
                ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 4)
              FROM lineitem
              UNION ALL
              SELECT 'l_discount', COUNT(*),
                COUNT(l_discount), COUNT(DISTINCT l_discount),
                ROUND(CAST(MIN(l_discount) AS DOUBLE), 4),
                ROUND(CAST(MAX(l_discount) AS DOUBLE), 4),
                ROUND(CAST(AVG(l_discount) AS DOUBLE), 4)
              FROM lineitem"""


  /** Oracle for q_bpe_encode, generated from [[graft.functions.Bpe
    * .demoMerges]] so the SQL replay and the shipped merge list cannot
    * drift. Each symbol carries its OWN boundary spaces (symbols
    * joined by two spaces), under which nested REPLACE is exactly the
    * greedy merge semantics of [[graft.plans.BpeCodec]] — see
    * BpeSpec's property test. */
  private val bpeEncodeOracleSql: String = {
    // NB: `oracleSql` collapses ALL whitespace runs (including inside
    // string literals), so the double-space symbol delimiter is built
    // with repeat(' ', 2) expressions, never a two-space literal
    val chain = graft.functions.Bpe.demoMerges.foldLeft(
      "' ' || array_to_string(string_split(w, ''), repeat(' ', 2))" +
        " || ' '") {
      case (acc, (a, b)) =>
        s"REPLACE($acc, ' ' || '$a' || repeat(' ', 2) || '$b' || ' '," +
          s" ' ' || '$a$b' || ' ')"
    }
    raw"""WITH e AS (SELECT doc_id, array_to_string(list_transform(
            list_filter(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$$', '', 'g')), '\s+'),
              w -> w <> ''),
            w -> REPLACE(trim($chain), repeat(' ', 2), ' ')), ' ')
              AS enc
          FROM documents)
        SELECT doc_id,
          CASE WHEN enc = '' THEN 0
            ELSE len(string_split(enc, ' ')) END AS n_subwords,
          enc
        FROM e"""
  }

  /** SQL-escape a single-quoted literal's body. */
  private def sqlEsc(s: String): String = s.replace("'", "''")

  /** The shared `e` CTE replaying the byte-level demo encode: the
    * REPLACE-chain generated from demoByteMerges (single quotes
    * SQL-escaped — the merge list contains the contraction
    * apostrophe); the pre-token list is the GPT-2 regex grounded out
    * BY HAND on the synthesized text — letters/punct map to
    * themselves under bytes_to_unicode, the pre-token's leading space
    * to 'Ġ' — so the oracle replays pre-tokenization, byte mapping,
    * and merges without needing lookahead regex support in DuckDB. */
  private val bpeBytesEncCte: String = {
    val chain = graft.functions.Bpe.demoByteMerges.foldLeft(
      "' ' || array_to_string(string_split(w, ''), repeat(' ', 2))" +
        " || ' '") {
      case (acc, (a, b)) =>
        s"REPLACE($acc, ' ' || '${sqlEsc(a)}' || repeat(' ', 2) || " +
          s"'${sqlEsc(b)}' || ' ', ' ' || '${sqlEsc(a + b)}' || ' ')"
    }
    raw"""e AS (SELECT doc_id, array_to_string(list_transform(
            ['hello', 'Ġworld', ',', 'Ġit', chr(39) || 's', 'Ġrank',
             'Ġ' || CAST(doc_id AS VARCHAR)],
            w -> REPLACE(trim($chain), repeat(' ', 2), ' ')), ' ')
              AS enc
          FROM documents WHERE doc_id < 200)"""
  }

  private val bpeEncodeBytesOracleSql: String =
    raw"""WITH $bpeBytesEncCte
        SELECT doc_id,
          CASE WHEN enc = '' THEN 0
            ELSE len(string_split(enc, ' ')) END AS n_subwords,
          enc
        FROM e"""

  /** Token-id replay: the vocabulary [[graft.functions.Bpe.vocabBytes]]
    * induces for demoByteMerges, inlined as a generated CASE — ids on
    * both sides come from the same deterministic assignment, so drift
    * is impossible. */
  private val bpeTokenIdsOracleSql: String = {
    val vocabCase = graft.functions.Bpe
      .vocabBytes(graft.functions.Bpe.demoByteMerges)
      .map { case (t, i) => s"WHEN '${sqlEsc(t)}' THEN $i" }
      .mkString(" ")
    raw"""WITH $bpeBytesEncCte
        SELECT doc_id, array_to_string(list_transform(
            string_split(enc, ' '),
            t -> CAST(CASE t $vocabCase END AS VARCHAR)), ',') AS ids
        FROM e"""
  }

  /** Round an order-dependent double aggregate for oracle stability. */
  private def r4(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), 4)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference README's own example — `aggregate_pq(file, ['f0'],
    * ['f2'])` (`/root/reference/README.md:83-97`) — on lineitem. */
  def entry(spark: SparkSession): DataFrame =
    AggregateEngine.aggregatePq(spark,
      "/root/testdata/sf0.001/lineitem.parquet",
      groupbyCols = Seq("l_returnflag"),
      measureCols = Seq(Seq("l_quantity", "sum", "sum_qty")))

  // =========================================================================
  // Parity queries: the reference's own surface, via AggregateEngine
  // =========================================================================

  private def ae(
      dims: Seq[String],
      measures: Seq[Seq[String]],
      filters: Seq[Filter] = Nil,
      table: String = "lineitem",
      aggregate: Boolean = true)(s: SparkSession, dir: String): DataFrame =
    AggregateEngine.aggregatePq(s, pq(dir, table), dims, measures,
      dataFilter = filters, aggregate = aggregate)

  private val parity: Seq[Q] = Seq(
    Q("q_agg_sum",
      (s, d) => r4(ae(Seq("l_returnflag", "l_linestatus"),
        Seq(Seq("l_quantity", "sum", "sum_qty")))(s, d), "sum_qty"),
      Some("""SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 4) AS sum_qty
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q_agg_mean",
      (s, d) => r4(ae(Seq("l_returnflag"),
        Seq(Seq("l_extendedprice", "mean", "avg_price")))(s, d), "avg_price"),
      Some("""SELECT l_returnflag, ROUND(AVG(l_extendedprice), 4) AS avg_price
              FROM lineitem GROUP BY l_returnflag""")),

    Q("q_agg_std",
      (s, d) => r4(ae(Seq("l_linestatus"),
        Seq(Seq("l_quantity", "std", "std_qty")))(s, d), "std_qty"),
      Some("""SELECT l_linestatus, ROUND(STDDEV(l_quantity), 4) AS std_qty
              FROM lineitem GROUP BY l_linestatus""")),

    Q("q_agg_count",
      ae(Seq("l_returnflag", "l_linestatus"),
        Seq(Seq("l_orderkey", "count", "n"))),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(l_orderkey) AS n
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q_agg_count_na",
      ae(Seq("l_returnflag"), Seq(Seq("l_quantity", "count_na", "n_null"))),
      Some("""SELECT l_returnflag,
              COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS n_null
              FROM lineitem GROUP BY l_returnflag""")),

    Q("q_agg_count_distinct",
      ae(Seq("l_returnflag"),
        Seq(Seq("l_partkey", "count_distinct", "n_parts"))),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
              FROM lineitem GROUP BY l_returnflag""")),

    Q("q_agg_min_max",
      ae(Seq("l_returnflag"), Seq(
        Seq("l_extendedprice", "min", "min_price"),
        Seq("l_extendedprice", "max", "max_price"),
        Seq("l_partkey", "min", "min_part"))),
      Some("""SELECT l_returnflag, MIN(l_extendedprice) AS min_price,
              MAX(l_extendedprice) AS max_price, MIN(l_partkey) AS min_part
              FROM lineitem GROUP BY l_returnflag""")),

    Q("q_agg_one",
      ae(Seq("l_returnflag", "l_linestatus"),
        Seq(Seq("l_linenumber", "one", "any_ln"))),
      Some("""SELECT l_returnflag, l_linestatus, MIN(l_linenumber) AS any_ln
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("q_agg_global",
      (s, d) => r4(ae(Nil, Seq(
        Seq("l_quantity", "sum", "sum_qty"),
        Seq("l_orderkey", "count", "n"),
        Seq("l_discount", "min", "min_disc"),
        Seq("l_tax", "max", "max_tax")))(s, d), "sum_qty"),
      Some("""SELECT ROUND(SUM(l_quantity), 4) AS sum_qty,
              COUNT(l_orderkey) AS n, MIN(l_discount) AS min_disc,
              MAX(l_tax) AS max_tax FROM lineitem""")),

    Q("q_agg_multi_same_col",
      (s, d) => r4(ae(Seq("l_linestatus"), Seq(
        Seq("l_quantity", "sum", "qty_sum"),
        Seq("l_quantity", "mean", "qty_mean"),
        Seq("l_quantity", "min", "qty_min")))(s, d), "qty_sum", "qty_mean"),
      Some("""SELECT l_linestatus, ROUND(SUM(l_quantity), 4) AS qty_sum,
              ROUND(AVG(l_quantity), 4) AS qty_mean, MIN(l_quantity) AS qty_min
              FROM lineitem GROUP BY l_linestatus""")),

    Q("q_noagg",
      ae(Seq("l_returnflag"), Seq(Seq("l_orderkey"), Seq("l_quantity")),
        filters = Seq(Filter("l_orderkey", "<=", 100L)), aggregate = false),
      Some("""SELECT l_orderkey, l_quantity, l_returnflag
              FROM lineitem WHERE l_orderkey <= 100""")),

    // ---- filter operators (P2-P8) ----------------------------------------
    Q("q_filter_in",
      (s, d) => r4(ae(Seq("l_linestatus"),
        Seq(Seq("l_quantity", "sum", "sum_qty")),
        filters = Seq(Filter("l_returnflag", "in", Seq("A", "R"))))(s, d),
        "sum_qty"),
      Some("""SELECT l_linestatus, ROUND(SUM(l_quantity), 4) AS sum_qty
              FROM lineitem WHERE l_returnflag IN ('A', 'R')
              GROUP BY l_linestatus""")),

    Q("q_filter_nin",
      ae(Seq("l_returnflag"), Seq(Seq("l_orderkey", "count", "n")),
        filters = Seq(Filter("l_linestatus", "not in", Seq("F")))),
      Some("""SELECT l_returnflag, COUNT(l_orderkey) AS n
              FROM lineitem WHERE l_linestatus NOT IN ('F')
              GROUP BY l_returnflag""")),

    Q("q_filter_range",
      ae(Seq("l_returnflag"), Seq(Seq("l_orderkey", "count", "n")),
        filters = Seq(
          Filter("l_quantity", ">", 10.0),
          Filter("l_quantity", "<=", 40.0),
          Filter("l_partkey", ">=", 100L),
          Filter("l_partkey", "<", 1500L))),
      Some("""SELECT l_returnflag, COUNT(l_orderkey) AS n FROM lineitem
              WHERE l_quantity > 10 AND l_quantity <= 40
                AND l_partkey >= 100 AND l_partkey < 1500
              GROUP BY l_returnflag""")),

    Q("q_filter_eq_ne",
      ae(Seq("l_linenumber"), Seq(Seq("l_orderkey", "count", "n")),
        filters = Seq(
          Filter("l_returnflag", "==", "N"),
          Filter("l_linestatus", "!=", "F"))),
      Some("""SELECT l_linenumber, COUNT(l_orderkey) AS n FROM lineitem
              WHERE l_returnflag = 'N' AND l_linestatus <> 'F'
              GROUP BY l_linenumber""")),

    Q("q_filter_in_scalar_degrade",
      ae(Seq("l_returnflag"), Seq(Seq("l_orderkey", "count", "n")),
        filters = Seq(Filter("l_linenumber", "in", 5))),
      Some("""SELECT l_returnflag, COUNT(l_orderkey) AS n FROM lineitem
              WHERE l_linenumber = 5 GROUP BY l_returnflag""")),

    Q("q_filter_timestamp",
      (s, d) => r4(ae(Seq("l_returnflag"),
        Seq(Seq("l_quantity", "sum", "sum_qty"),
          Seq("l_orderkey", "count", "n")),
        filters = Seq(Filter("l_shipdate", ">=",
          java.sql.Timestamp.valueOf("1995-06-01 00:00:00")),
          Filter("l_shipdate", "<",
            java.sql.Timestamp.valueOf("1996-06-01 00:00:00"))))(s, d),
        "sum_qty"),
      Some("""SELECT l_returnflag, ROUND(SUM(l_quantity), 4) AS sum_qty,
              COUNT(l_orderkey) AS n FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
              GROUP BY l_returnflag""")),

    // ---- schema-drift contract (M1-M4) -----------------------------------
    Q("q_missing_file",
      (s, d) => AggregateEngine.aggregatePq(s, s"$d/does_not_exist.parquet",
        Seq("g_dim"), Seq(Seq("m_val", "sum", "m_sum"))),
      Some("""SELECT CAST(NULL AS BIGINT) AS g_dim,
              CAST(NULL AS DOUBLE) AS m_sum WHERE 1 = 0""")),

    Q("q_missing_cols_all",
      ae(Seq("ghost_a"), Seq(Seq("ghost_b"))),
      Some("""SELECT CAST(NULL AS BIGINT) AS ghost_a,
              CAST(NULL AS DOUBLE) AS ghost_b WHERE 1 = 0""")),

    Q("q_missing_cols_some",
      (s, d) => r4(ae(Seq("l_returnflag", "l_ghostdim"), Seq(
        Seq("l_quantity", "sum", "sum_qty"),
        Seq("l_ghostmeasure", "sum", "ghost_m")))(s, d), "sum_qty"),
      Some("""SELECT l_returnflag, CAST(-1 AS BIGINT) AS l_ghostdim,
              ROUND(SUM(l_quantity), 4) AS sum_qty,
              CAST(0.0 AS DOUBLE) AS ghost_m
              FROM lineitem GROUP BY l_returnflag""")),

    Q("q_filter_missing_col",
      (s, d) => r4(ae(Seq("l_returnflag"),
        Seq(Seq("l_quantity", "sum", "sum_qty")),
        filters = Seq(Filter("l_ghost", ">", 5L)))(s, d), "sum_qty"),
      Some("""SELECT l_returnflag, ROUND(SUM(l_quantity), 4) AS sum_qty
              FROM lineitem WHERE 1 = 0 GROUP BY l_returnflag""")))

  // =========================================================================
  // Extensions: joins / windows / sorts / set ops / scalar functions —
  // absent from the reference (SURVEY.md §2.4-2.8), first-class here.
  // =========================================================================

  private val extensions: Seq[Q] = Seq(
    // Star-schema join: fact lineitem ⋈ broadcast dims. At 100 TB the dims
    // stay broadcast-able (region/nation/customer are small); the single
    // shuffle is the lineitem↔orders equi-join.
    Q("q_join_star",
      (s, d) => {
        val li = s.read.parquet(pq(d, "lineitem"))
        val o = s.read.parquet(pq(d, "orders"))
        val c = s.read.parquet(pq(d, "customer"))
        val n = s.read.parquet(pq(d, "nation"))
        val r = s.read.parquet(pq(d, "region"))
        // revenue summed as DECIMAL: a double sum of 10^5+ terms at 1e9+
        // magnitude depends on partial-sum order (Spark partials vs the
        // oracle's sequential scan diverged in the 4th decimal at
        // sf0.1). The per-row product is computed in double identically
        // by both engines, then cast to decimal — exact, order-free
        // addition — and only the final value returns to double.
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(round(sum((col("l_extendedprice") *
              (lit(1.0) - col("l_discount"))).cast("decimal(20,6)"))
              .cast("double"), 4)
            .as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT r_name,
              ROUND(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                AS DECIMAL(20,6))) AS DOUBLE), 4) AS revenue,
              COUNT(*) AS n_rows
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name""")),

    Q("q_join_left",
      (s, d) => {
        val o = s.read.parquet(pq(d, "orders"))
        val c = s.read.parquet(pq(d, "customer"))
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
          .groupBy(col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            round(sum(col("o_totalprice")), 4).as("total"))
      },
      Some("""SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders,
              ROUND(SUM(o_totalprice), 4) AS total
              FROM orders LEFT JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment""")),

    Q("q_join_semi",
      (s, d) => {
        val o = s.read.parquet(pq(d, "orders"))
        val li = s.read.parquet(pq(d, "lineitem"))
          .where(col("l_quantity") > 45).select(col("l_orderkey"))
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
              WHERE o_orderkey IN
                (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
              GROUP BY o_orderstatus""")),

    Q("q_join_anti",
      (s, d) => {
        val o = s.read.parquet(pq(d, "orders"))
        val li = s.read.parquet(pq(d, "lineitem"))
          .where(col("l_quantity") > 45).select(col("l_orderkey"))
        o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
              WHERE o_orderkey NOT IN
                (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
              GROUP BY o_orderstatus""")),

    // as-of join (operator Spark lacks; see operators.TemporalJoin):
    // latest 'view' value at-or-before each 'click', per user. Both
    // sides truncated to seconds (events carry nanosecond timestamps —
    // DuckDB compares at ns, Spark at µs; sub-second ordering would
    // diverge) and views pre-aggregated to one row per (user, second)
    // so the matched value is deterministic in both engines.
    Q("q_asof_join",
      (s, d) => {
        val ev = events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("user_id"), col("event_id"),
            date_trunc("second", col("ts")).as("cts"))
        val views = ev.where(col("event_type") === "view")
          .groupBy(col("user_id"),
            date_trunc("second", col("ts")).as("vts"))
          .agg(max(col("value")).as("view_value"))
        graft.operators.TemporalJoin.asofJoin(clicks, views,
          Seq("user_id"), "cts", "vts", Seq("view_value"))
          .select(col("user_id"), col("event_id"),
            date_format(col("cts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
            round(col("view_value"), 4).as("view_value"))
      },
      Some("""SELECT l.user_id, l.event_id,
              strftime(l.cts, '%Y-%m-%d %H:%M:%S') AS ts_str,
              ROUND(r.view_value, 4) AS view_value
              FROM (SELECT user_id, event_id,
                      date_trunc('second', ts) AS cts
                    FROM events WHERE event_type = 'click') l
              ASOF LEFT JOIN
                   (SELECT user_id, date_trunc('second', ts) AS vts,
                           MAX(value) AS view_value
                    FROM events WHERE event_type = 'view'
                    GROUP BY 1, 2) r
              ON l.user_id = r.user_id AND l.cts >= r.vts""")),

    // range-containment join (bin-bucketed, no cartesian): distinct ship
    // days falling inside each order's [orderdate, orderdate + k] window
    Q("q_range_join",
      (s, d) => {
        val shipDays = s.read.parquet(pq(d, "lineitem"))
          .select(col("l_shipdate")).distinct()
        val ranges = s.read.parquet(pq(d, "orders"))
          .where(col("o_orderkey") < 500)
          .select(col("o_orderkey"), col("o_orderdate"),
            date_add(col("o_orderdate").cast("date"),
              (col("o_orderkey") % 30 + 1).cast("int")).as("r_end"))
        graft.operators.TemporalJoin.rangeJoin(shipDays, ranges,
          "l_shipdate", "o_orderdate", "r_end", binSeconds = 86400L * 16)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_ship_days"))
      },
      Some("""SELECT o.o_orderkey, COUNT(*) AS n_ship_days
              FROM (SELECT DISTINCT l_shipdate FROM lineitem) p
              JOIN (SELECT o_orderkey, o_orderdate,
                      o_orderdate::DATE
                        + CAST((o_orderkey % 30) + 1 AS INTEGER) AS r_end
                    FROM orders WHERE o_orderkey < 500) o
              ON p.l_shipdate BETWEEN o.o_orderdate AND o.r_end
              GROUP BY o.o_orderkey""")),

    // ---- window functions ------------------------------------------------
    Q("q_window_rank",
      (s, d) => {
        val o = s.read.parquet(pq(d, "orders"))
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice"), col("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders) t WHERE rn <= 3""")),

    Q("q_window_running_sum",
      (s, d) => {
        val o = s.read.parquet(pq(d, "orders"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 4).as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
              ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                AS running_total
              FROM orders""")),

    Q("q_window_lag_lead",
      (s, d) => {
        val o = s.read.parquet(pq(d, "orders"))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        o.select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
              LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey) AS prev_price,
              LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey
                ORDER BY o_orderkey) AS next_price
              FROM orders""")),

    // ---- sorts / limits / top-k ------------------------------------------
    Q("q_sort_limit",
      (s, d) => s.read.parquet(pq(d, "orders"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    Q("q_topk_agg",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .groupBy(col("l_partkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(10),
      Some("""SELECT l_partkey,
              ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
              FROM lineitem GROUP BY l_partkey
              ORDER BY revenue DESC, l_partkey LIMIT 10""")),

    // ---- set operations --------------------------------------------------
    Q("q_union",
      (s, d) => {
        val c = s.read.parquet(pq(d, "customer"))
          .select(col("c_nationkey").as("nk"))
        val su = s.read.parquet(pq(d, "supplier"))
          .select(col("s_nationkey").as("nk"))
        c.union(su).distinct()
      },
      Some("""SELECT c_nationkey AS nk FROM customer
              UNION SELECT s_nationkey AS nk FROM supplier""")),

    Q("q_intersect",
      (s, d) => {
        val c = s.read.parquet(pq(d, "customer"))
          .select(col("c_nationkey").as("nk"))
        val su = s.read.parquet(pq(d, "supplier"))
          .select(col("s_nationkey").as("nk"))
        c.intersect(su)
      },
      Some("""SELECT c_nationkey AS nk FROM customer
              INTERSECT SELECT s_nationkey AS nk FROM supplier""")),

    Q("q_except",
      (s, d) => {
        val c = s.read.parquet(pq(d, "customer"))
          .select(col("c_nationkey").as("nk"))
        val su = s.read.parquet(pq(d, "supplier"))
          .select(col("s_nationkey").as("nk"))
        c.except(su)
      },
      Some("""SELECT c_nationkey AS nk FROM customer
              EXCEPT SELECT s_nationkey AS nk FROM supplier""")),

    Q("q_distinct",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""")),

    // by-name union across drifted schemas: the second shard gained
    // n_chars and narrowed doc_id to int; lang is null-filled there,
    // n_chars on the first, and doc_id widens back to bigint
    Q("q_union_evolve",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        graft.operators.Merge.unionEvolve(Seq(
          docs.where(col("doc_id") < 100)
            .select(col("doc_id"), col("source"), col("lang")),
          docs.where(col("doc_id") >= 400)
            .select(col("doc_id").cast("int").as("doc_id"), col("source"),
              length(col("text")).cast("bigint").as("n_chars"))))
      },
      Some("""SELECT doc_id, source, lang, NULL AS n_chars
              FROM documents WHERE doc_id < 100
              UNION ALL
              SELECT doc_id, source, NULL AS lang, length(text) AS n_chars
              FROM documents WHERE doc_id >= 400""")),

    // CDC merge to latest snapshot: updates (version 1) overwrite the
    // base rows, tombstones drop keys, unseen keys insert — the kept
    // row per key is a pure function of (key, version, side), replayed
    // by the oracle's window. Update payloads are exact values (a cast
    // key), so no FP arithmetic rides the gate.
    Q("q_merge_upsert",
      (s, d) => {
        val (base, updates) = ordersChangeSet(s, d)
        graft.operators.Merge.mergeUpsert(base, updates,
            Seq("o_orderkey"), "version", deleteCol = Some("is_delete"))
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
      },
      Some(mergeUpsertOracleSql)),

    // the SAME merge driven through CdcPipeline's log-structured
    // epoch/bucket snapshot (two applied epochs, prebuilt fixture):
    // readSnapshot serves every bucket from its newest committed epoch
    // — identical final state to the one-shot merge, same oracle shape
    Q("q_cdc_snapshot",
      (s, d) => graft.streaming.CdcPipeline
        .readSnapshot(s, cdcSnapshotFixture(s, d))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus")),
      Some(mergeUpsertOracleSql)),

    // time travel over the same fixture: as-of epoch 0 must reproduce
    // the pre-update state exactly (the base change set — unique keys,
    // no deletes — so the oracle is the base projection itself)
    Q("q_cdc_time_travel",
      (s, d) => graft.streaming.CdcPipeline
        .readSnapshotAsOf(s, cdcSnapshotFixture(s, d), epoch = 0L)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus")),
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
              FROM orders""")),

    // the retention end-state: same epochs, then compactSnapshot and
    // DELETION of the old epoch dirs — the compacted epoch alone must
    // reproduce the identical snapshot (tombstoned-empty buckets
    // included, via the atomically-committed sentinels), same oracle
    Q("q_cdc_compacted",
      (s, d) => graft.streaming.CdcPipeline
        .readSnapshot(s, cdcCompactedFixture(s, d))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus")),
      Some(mergeUpsertOracleSql)),

    // ---- grouping sets ---------------------------------------------------
    Q("q_rollup",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    Q("q_cube",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // ---- scalar functions ------------------------------------------------
    Q("q_scalar_string",
      (s, d) => s.read.parquet(pq(d, "part"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          length(col("p_type")).as("type_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type")),
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u,
              SUBSTRING(p_name, 1, 5) AS name_pfx,
              CAST(LENGTH(p_type) AS INT) AS type_len,
              p_brand || '#' || p_type AS brand_type FROM part""")),

    Q("q_scalar_date",
      (s, d) => s.read.parquet(pq(d, "orders"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 4).as("total")),
      Some("""SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
              EXTRACT(MONTH FROM o_orderdate) AS mo, COUNT(*) AS n,
              ROUND(SUM(o_totalprice), 4) AS total
              FROM orders GROUP BY 1, 2""")),

    Q("q_scalar_math",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .where(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - lit(25.0)).as("qty_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_discount") * lit(100.0)).as("disc_pct"),
          sqrt(col("l_quantity")).as("qty_sqrt")),
      Some("""SELECT l_orderkey, l_linenumber,
              ABS(l_quantity - 25.0) AS qty_dev,
              CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
              CAST(CEIL(l_discount * 100.0) AS BIGINT) AS disc_pct,
              SQRT(l_quantity) AS qty_sqrt
              FROM lineitem WHERE l_orderkey <= 500""")),

    Q("q_case_when",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .select(when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("qty_band"))
        .groupBy(col("qty_band")).agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
              COUNT(*) AS n FROM lineitem GROUP BY 1""")),

    // JSON scalar functions (§2.8) over the events.props JSON column;
    // oracle SUM(BIGINT) CAST to BIGINT (DuckDB surfaces it as hugeint)
    Q("q_scalar_json",
      (s, d) => events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum")),
      Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
                AS k_mod, COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
              FROM events GROUP BY 1""")),

    // pivot (wide aggregation); coalesce because Spark yields null for an
    // empty (group, pivot-value) cell where SQL FILTER counts give 0
    Q("q_pivot",
      (s, d) => {
        val p = events(s, d)
          .groupBy((col("user_id") % 10).as("user_mod"))
          .pivot("event_type", Seq("click", "view", "purchase"))
          .agg(count(lit(1)))
        p.select(col("user_mod"),
          coalesce(col("click"), lit(0L)).as("click"),
          coalesce(col("view"), lit(0L)).as("view"),
          coalesce(col("purchase"), lit(0L)).as("purchase"))
      },
      Some("""SELECT user_id % 10 AS user_mod,
              COUNT(*) FILTER (WHERE event_type = 'click') AS click,
              COUNT(*) FILTER (WHERE event_type = 'view') AS view,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
              FROM events GROUP BY 1""")),

    // array scalar functions (§2.8) over the embeddings vector column:
    // fold in declared order on both engines (element order preserved)
    Q("q_scalar_array",
      (s, d) => s.read.parquet(pq(d, "embeddings"))
        .where(col("vec_id") < 100)
        .select(col("vec_id"),
          size(col("embedding")).cast("bigint").as("dim"),
          round(aggregate(col("embedding").cast("array<double>"),
            lit(0.0), (acc, x) => acc + x), 4).as("vec_sum"),
          round(array_max(col("embedding")).cast("double"), 4)
            .as("vec_max")),
      Some("""SELECT vec_id, len(embedding) AS dim,
              ROUND(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
              ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS vec_max
              FROM embeddings WHERE vec_id < 100""")))

  // =========================================================================
  // Training-data pipeline operators: dedup / text analysis / similarity /
  // events / multimodal / transport. LSH- and hash-family-specific outputs
  // have no SQL-expressible oracle → rows-only check (driver contract).
  // =========================================================================

  private def events(s: SparkSession, d: String): DataFrame = {
    // driver testdata has stored ts as timestamp[ns] (Spark reads nanos
    // only as a long, via this legacy conf) or timestamp[us] (read
    // natively as TIMESTAMP_NTZ, no annotation). Accept either physical
    // layout and normalize to session-zone TimestampType micros so every
    // downstream events query sees one ts type.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(pq(d, "events"))
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  private val pipelines: Seq[Q] = Seq(
    // ---- deduplication ---------------------------------------------------
    Q("q_dedup_exact",
      (s, d) => graft.operators.Dedup.exactSummary(
        s.read.parquet(pq(d, "documents")), "text", "doc_id"),
      Some("""SELECT md5(text) AS text_hash, COUNT(*) AS n_copies,
              MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)""")),

    Q("q_dedup_exact_keep",
      (s, d) => graft.operators.Dedup.exact(
        s.read.parquet(pq(d, "documents")).select(col("doc_id"), col("text")),
        Seq("text"), "doc_id").select(col("doc_id")),
      Some("""SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text""")),

    // natural-corpus run at the production-shaped threshold 0.5,
    // promoted from rows-only to a planted-recall gate: 50 exact copies
    // are planted at +100000 and the output is reduced to three
    // driver-checkable invariants — every planted pair surfaced (LSH
    // candidate generation has no false negative on identical
    // signatures, even among the natural buckets this threshold's
    // banding creates), every emitted pair's TRUE jaccard respects the
    // threshold (verify-stage contract), and no pair is emitted twice
    // (band dedup works). The pair VALUES stay hash-family-specific;
    // the invariants are not.
    Q("q_dedup_minhash",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        graft.operators.Dedup.minhashDuplicates(docs.unionByName(planted),
            "doc_id", "text", minJaccard = 0.5)
          .agg(
            sum(when(col("id_b") - col("id_a") === 100000L &&
              col("id_a") < 50, 1L).otherwise(0L)).as("n_planted_found"),
            sum(when(col("jaccard") < 0.5, 1L).otherwise(0L))
              .as("n_below_threshold"),
            (count(lit(1)) - count_distinct(col("id_a"), col("id_b")))
              .as("n_dup_pairs"))
      },
      Some("""SELECT (SELECT COUNT(*) FROM documents WHERE doc_id < 50)
                AS n_planted_found,
              CAST(0 AS BIGINT) AS n_below_threshold,
              CAST(0 AS BIGINT) AS n_dup_pairs""")),

    // repartition first: the fingerprint+key-explode chain is narrow, so
    // its parallelism is the input's (one parquet file here = 1-2 tasks);
    // at cluster scale the source arrives partitioned and this is a no-op
    // in spirit (same pattern as q_dup_spans). Same planted-recall
    // promotion as q_dedup_minhash: copies collide at hamming 0 in every
    // Manku chunk arrangement, so recall of the planted set is exact.
    Q("q_dedup_simhash",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        graft.operators.Dedup.simhashDuplicates(
            docs.unionByName(planted)
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", "text", maxHamming = 8)
          .agg(
            sum(when(col("id_b") - col("id_a") === 100000L &&
              col("id_a") < 50 && col("hamming") === 0, 1L).otherwise(0L))
              .as("n_planted_found"),
            sum(when(col("hamming") > 8, 1L).otherwise(0L))
              .as("n_over_threshold"),
            (count(lit(1)) - count_distinct(col("id_a"), col("id_b")))
              .as("n_dup_pairs"))
      },
      Some("""SELECT (SELECT COUNT(*) FROM documents WHERE doc_id < 50)
                AS n_planted_found,
              CAST(0 AS BIGINT) AS n_over_threshold,
              CAST(0 AS BIGINT) AS n_dup_pairs""")),

    // threshold 0.3 (not the production 0.95): driver embeddings are
    // random, so a realistic near-dup cutoff matches nothing — this
    // exercises the bucket-join + cosine-verify path with live rows.
    // Same planted-recall promotion: identical vectors share every
    // hyperplane sign, so bucket collision (and cosine 1.0 up to float
    // rounding) is guaranteed, not probabilistic.
    Q("q_dedup_embedding",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .select(col("vec_id"), col("embedding"))
        val planted = emb.where(col("vec_id") < 50)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        graft.operators.Dedup.embeddingDuplicates(emb.unionByName(planted),
            "vec_id", "embedding", planes = 6, minCosine = 0.3)
          .agg(
            sum(when(col("id_b") - col("id_a") === 100000L &&
              col("id_a") < 50 && col("cosine") > 0.999, 1L).otherwise(0L))
              .as("n_planted_found"),
            sum(when(col("cosine") < 0.3, 1L).otherwise(0L))
              .as("n_below_threshold"),
            (count(lit(1)) - count_distinct(col("id_a"), col("id_b")))
              .as("n_dup_pairs"))
      },
      Some("""SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 50)
                AS n_planted_found,
              CAST(0 AS BIGINT) AS n_below_threshold,
              CAST(0 AS BIGINT) AS n_dup_pairs""")),

    // ---- planted-duplicate oracles --------------------------------------
    // The natural-corpus dedup queries above are hash-family-specific
    // (rows-only). These variants plant exact copies at doc_id+100000 and
    // assert the pipelines find EVERY planted pair at jaccard 1.0 /
    // hamming 0 / cosine 1.0 — an expected set that IS SQL-expressible,
    // so the LSH candidate generation + verification paths get a real
    // DuckDB oracle. (A copy's signature is identical, so bucket
    // collision is guaranteed, not probabilistic; the id_b-id_a filter
    // projects out incidental natural near-dup pairs.)
    Q("q_dedup_minhash_planted",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        graft.operators.Dedup.minhashDuplicates(docs.unionByName(planted),
          "doc_id", "text", minJaccard = 0.99)
          .where(col("id_b") - col("id_a") === 100000L && col("id_a") < 50)
      },
      Some("""SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
              CAST(1.0 AS DOUBLE) AS jaccard
              FROM documents WHERE doc_id < 50""")),

    Q("q_dedup_simhash_planted",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val planted = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        graft.operators.Dedup.simhashDuplicates(docs.unionByName(planted),
          "doc_id", "text", maxHamming = 3)
          .where(col("id_b") - col("id_a") === 100000L && col("id_a") < 50)
      },
      Some("""SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 0 AS hamming
              FROM documents WHERE doc_id < 50""")),

    // cluster formation over planted triangles: copies at +100k/+200k
    // give each source doc a 3-member dup family whose pair graph is a
    // triangle; connected components must label all three with the
    // source id. The pmod filter keeps exactly the family pairs (a
    // natural pair's id distance is never a multiple of 100000).
    Q("q_dedup_clusters",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val fam = docs.where(col("doc_id") < 30)
        val planted = fam
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
          .unionByName(fam
            .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
        val pairs = graft.operators.Dedup.minhashDuplicates(
          docs.unionByName(planted), "doc_id", "text", minJaccard = 0.99)
          .where(pmod(col("id_b") - col("id_a"), lit(100000L)) === 0 &&
            pmod(col("id_a"), lit(100000L)) < 30)
        graft.operators.Dedup
          .duplicateClusters(pairs.select(col("id_a"), col("id_b")))
          .select(col("id").as("doc_id"), col("cluster"))
      },
      Some("""SELECT doc_id + off AS doc_id, doc_id AS cluster
              FROM documents
              CROSS JOIN (VALUES (0), (100000), (200000)) t(off)
              WHERE doc_id < 30""")),

    // the full near-dup pipeline closed end-to-end: planted 3-member
    // families → LSH candidate pairs → connected components → SURVIVOR
    // SELECTION. Survivors within the planted universe must be exactly
    // the source docs (min id per family); every copy must be dropped.
    // Same planted/filter discipline as q_dedup_clusters.
    Q("q_dedup_survivors",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val fam = docs.where(col("doc_id") < 30)
        val all = docs
          .unionByName(fam.select((col("doc_id") + 100000L).as("doc_id"),
            col("text")))
          .unionByName(fam.select((col("doc_id") + 200000L).as("doc_id"),
            col("text")))
        val pairs = graft.operators.Dedup.minhashDuplicates(
          all, "doc_id", "text", minJaccard = 0.99)
          .where(pmod(col("id_b") - col("id_a"), lit(100000L)) === 0 &&
            pmod(col("id_a"), lit(100000L)) < 30)
        val labels = graft.operators.Dedup
          .duplicateClusters(pairs.select(col("id_a"), col("id_b")))
        graft.operators.Dedup.selectSurvivors(all, labels, "doc_id")
          .where(pmod(col("doc_id"), lit(100000L)) < 30)
          .select(col("doc_id"))
      },
      Some("""SELECT doc_id FROM documents WHERE doc_id < 30""")),

    // corpus-level term weighting: top-3 TF-IDF terms per document —
    // deterministic across engines (rank on the raw double score with a
    // term tiebreak; round only in the final projection)
    Q("q_tfidf",
      (s, d) => graft.functions.TextAnalysis.tfidfTopTerms(
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 100),
        "doc_id", "text", k = 3),
      Some("""WITH base AS (SELECT doc_id, text FROM documents
                WHERE doc_id < 100),
              toks AS (SELECT doc_id,
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS term
                FROM base WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM toks GROUP BY 1, 2),
              dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
              n AS (SELECT COUNT(*) AS n FROM base),
              scored AS (SELECT tf.doc_id, tf.term,
                  tf.tf * LN((n.n + 1.0) / (dfreq.df + 1.0)) AS raw
                FROM tf JOIN dfreq USING (term) CROSS JOIN n)
              SELECT doc_id, term, ROUND(raw, 4) AS score FROM (
                SELECT doc_id, term, raw, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY raw DESC, term) AS rn
                FROM scored)
              WHERE rn <= 3""")),

    Q("q_dedup_embedding_planted",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .select(col("vec_id"), col("embedding"))
        val planted = emb.where(col("vec_id") < 50)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        graft.operators.Dedup.embeddingDuplicates(emb.unionByName(planted),
          "vec_id", "embedding", planes = 6, minCosine = 0.999)
          .where(col("id_b") - col("id_a") === 100000L && col("id_a") < 50)
      },
      Some("""SELECT vec_id AS id_a, vec_id + 100000 AS id_b,
              CAST(1.0 AS DOUBLE) AS cosine
              FROM embeddings WHERE vec_id < 50""")),

    // join-free Bloom membership pre-filter: re-ingested copies MUST be
    // flagged (Bloom admits no false negatives), so the flagged planted
    // slice is an exact expected set; novel probes (+200000, text
    // prefixed per-doc) exercise the false-positive path but are
    // excluded from the output so the sketch's FP noise can't touch
    // the oracle
    Q("q_dedup_bloom",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val copies = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        val novel = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(lit("novel "), col("doc_id").cast("string"),
              lit(" "), col("text")).as("text"))
        graft.operators.Dedup.bloomSeenFlags(
          copies.unionByName(novel), docs, "doc_id", "text")
          .where(col("maybe_seen") && col("doc_id") < 200000L)
          .select(col("doc_id"))
      },
      Some("""SELECT doc_id + 100000 AS doc_id FROM documents
              WHERE doc_id < 50""")),

    // source-mixture rebalance: target 50/30/20 blend of three sources
    // by n_chars mass. The oracle replays the fraction plan in SQL —
    // same double arithmetic in the same order (T = min mass/share,
    // f = share*T/mass), same md5-prefix membership — so kept sets
    // match exactly. The per-source mass collect is source-vocabulary-
    // sized driver data, like the IVF centroid table.
    Q("q_mixture_rebalance",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("source").isin("src0", "src1", "src2"))
        graft.operators.Mixture.rebalance(docs, "doc_id", "source",
          "n_chars", Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"))
      },
      Some("""WITH m AS (SELECT source, SUM(n_chars) AS mass
                FROM documents WHERE source IN ('src0','src1','src2')
                GROUP BY source),
              w AS (SELECT * FROM (VALUES ('src0', CAST(0.5 AS DOUBLE)),
                ('src1', CAST(0.3 AS DOUBLE)), ('src2', CAST(0.2 AS DOUBLE)))
                t(source, share)),
              f AS (SELECT m.source,
                LEAST(1.0, w.share * (SELECT MIN(m2.mass / w2.share)
                  FROM m m2 JOIN w w2 USING (source)) / m.mass) AS frac
                FROM m JOIN w USING (source)),
              thr AS (SELECT source, CASE WHEN frac >= 1.0 - 1e-12 THEN 'g'
                ELSE printf('%04x',
                CAST(LEAST(floor(frac * 65536), 65535) AS INTEGER)) END
                AS th FROM f)
              SELECT d.source, COUNT(*) AS n_kept,
                CAST(SUM(d.n_chars) AS BIGINT) AS chars_kept
              FROM documents d JOIN thr ON d.source = thr.source
              WHERE substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 4)
                < thr.th
              GROUP BY d.source""")),

    // near-dup ingestion against the existing corpus via its banded
    // index: planted copies (batch = docs 0-49 re-ingested under new
    // ids) MUST match their source at jaccard 1.0; the id-distance
    // filter projects out incidental natural near-dup matches, exactly
    // like q_dedup_minhash_planted
    Q("q_dedup_incremental_minhash",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val batch = docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        graft.operators.Dedup.incrementalMinhash(batch, docs,
          "doc_id", "text", minJaccard = 0.99)
          .where(col("new_id") - col("seen_id") === 100000L)
      },
      Some("""SELECT doc_id + 100000 AS new_id, doc_id AS seen_id,
              CAST(1.0 AS DOUBLE) AS jaccard
              FROM documents WHERE doc_id < 50""")),

    // full ingestion-admission pipeline, end-to-end (the ingestion
    // analog of q_pipeline_e2e): bloom gate → exact anti-join → banded
    // near-dup gate. history = docs 0-399; batch = exact re-ingests of
    // 0-49 (bloom-flagged, exact-rejected), one-token edits of 50-79
    // (the edit changes the exact hash so bloom passes them — ONLY the
    // minhash gate can reject them, at jaccard S/(S+1) ≈ 0.98), and
    // novel docs 400-449 (admitted except those with a natural
    // ≥0.95-jaccard twin in history). The admitted set is exact SQL:
    // bloom has no false negatives (FPs drain through the exact join),
    // and every LSH candidate is verified with exact jaccard — the
    // oracle replays the same true-jaccard predicate over 3-word
    // shingles (natural jaccard at this SF tops out at 0.989, well
    // clear of both sides of the 0.95 gate).
    Q("q_ingest_admission",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val history = docs.where(col("doc_id") < 400)
        val batch = docs.where(col("doc_id") < 50)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
          .unionAll(docs.where(col("doc_id").between(50, 79))
            .select((col("doc_id") + 100000L).as("doc_id"),
              concat(col("text"), lit(" graftmarker")).as("text")))
          .unionAll(docs.where(col("doc_id").between(400, 449))
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        // sketch sized to the history (the production practice): the
        // probe embeds the sketch bytes in the plan, so an oversized
        // default would ship 1 MB of literal for a 400-doc history
        graft.operators.Dedup.ingestAdmission(batch, history,
          "doc_id", "text", expectedItems = 10000L, numBits = 1L << 17,
          minJaccard = 0.95)
          .select(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, text FROM documents
                WHERE doc_id < 400),
              b AS (SELECT doc_id + 100000 AS doc_id, text
                  FROM documents WHERE doc_id < 50
                UNION ALL
                SELECT doc_id + 100000, text || ' graftmarker'
                  FROM documents WHERE doc_id BETWEEN 50 AND 79
                UNION ALL
                SELECT doc_id + 100000, text
                  FROM documents WHERE doc_id BETWEEN 400 AND 449),
              hs AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(toks) - 3, 0)),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
                FROM (SELECT doc_id,
                  string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM h)),
              bs AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(toks) - 3, 0)),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
                FROM (SELECT doc_id,
                  string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM b)),
              near AS (SELECT DISTINCT bs.doc_id FROM bs JOIN hs ON
                CAST(len(list_intersect(bs.sh, hs.sh)) AS DOUBLE) /
                  (len(bs.sh) + len(hs.sh) -
                    len(list_intersect(bs.sh, hs.sh))) >= 0.95)
              SELECT b.doc_id FROM b
              WHERE NOT EXISTS (SELECT 1 FROM h WHERE h.text = b.text)
                AND NOT EXISTS (SELECT 1 FROM b b2
                  WHERE b2.text = b.text AND b2.doc_id < b.doc_id)
                AND b.doc_id NOT IN (SELECT doc_id FROM near)""")),

    // dedup-aware eval split: members of one duplicate family must land
    // in the SAME split, or val/test leaks (near-)copies of training
    // text. Families here are planted exact copies, so the cluster
    // label (min id per text) and the split hash are both
    // SQL-expressible; at scale the same operator takes
    // duplicateClusters labels for NEAR-dup families
    Q("q_split_leakage_safe",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val all = docs.unionAll(docs.where(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        val labels = all
          .select(col("doc_id").as("id"),
            md5(col("text").cast("binary")).as("__h"))
          .join(graft.operators.Dedup.exactSummary(all, "text", "doc_id")
            .select(col("text_hash").as("__h"), col("keep_id").as("cluster")),
            "__h")
          .select(col("id"), col("cluster"))
        graft.operators.Sampling.leakageSafeSplitAssign(all, labels,
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          salt = "lk")
          .select(col("doc_id"), col("split"))
      },
      // cccc/e666 = hexThreshold(0.8)/(0.9): floor(f*65536) in hex
      Some("""WITH a AS (SELECT doc_id, text FROM documents
                UNION ALL SELECT doc_id + 100000, text FROM documents
                WHERE doc_id < 50),
              c AS (SELECT doc_id,
                (SELECT MIN(a2.doc_id) FROM a a2 WHERE a2.text = a.text)
                  AS cluster FROM a)
              SELECT doc_id,
                CASE WHEN substr(md5('lk' || CAST(cluster AS VARCHAR)),
                    1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5('lk' || CAST(cluster AS VARCHAR)),
                    1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
              FROM c""")),

    // corpus rebalancing: per-language stratified subsample. Hash-based
    // membership is a pure function of (doc_id, salt, stratum fraction)
    // — reproducible across engines, so the sample is oracle-exact
    // (unlike df.stat.sampleBy's partition-seeded RNG, exercised in
    // SamplingSpec instead).
    Q("q_sample_stratified",
      (s, d) => graft.operators.Sampling.stratifiedHashSample(
        s.read.parquet(pq(d, "documents")), "doc_id", "lang",
        Map("en" -> 0.5, "de" -> 0.5, "fr" -> 0.25, "es" -> 0.25,
          "zh" -> 1.0), salt = "strat")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled")),
      // 'g' sorts after every hex prefix: fraction 1.0 keeps ALL zh
      // docs (a 'ffff' cap would drop keys hashing to exactly ffff)
      Some("""SELECT lang, COUNT(*) AS n_sampled FROM documents
              WHERE substr(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 4) <
                CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN '8000'
                  WHEN 'fr' THEN '4000' WHEN 'es' THEN '4000'
                  WHEN 'zh' THEN 'g' ELSE '0000' END
              GROUP BY lang""")),

    // ---- text analysis ---------------------------------------------------
    Q("q_text_stats",
      (s, d) => s.read.parquet(pq(d, "documents"))
        .select(col("doc_id"),
          graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok"),
          length(col("text")).cast("long").as("n_char")),
      // CASE mirrors Spark tokens(): empty/whitespace-only text is 0
      // tokens, where a bare split yields [''] (len 1)
      Some("""SELECT doc_id,
              CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                ELSE CAST(len(regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
                  AS INT) END AS n_tok,
              LENGTH(text) AS n_char FROM documents""")),

    // CPU-bound featurization over a FEW parquet files: Spark assigns one
    // task per file split, so a small-file corpus serializes onto one
    // core while 31 idle. repartition to the cluster's parallelism first
    // — the narrow shuffle is pennies next to the per-row expression
    // work. (At 100 TB the corpus has thousands of splits and this
    // repartition becomes unnecessary, not wrong.)
    // full SQL replication of the composite quality score + stopword
    // language ID (same term order and double arithmetic; corpus is
    // ASCII so \p{L} / [[:punct:]] agree across engines; zh profile
    // omitted from the oracle — its hits are always 0 on ASCII text)
    Q("q_text_quality",
      (s, d) => s.read.parquet(pq(d, "documents"))
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"),
          graft.functions.TextAnalysis.langId(col("text")).as("lang_pred")),
      // empty/whitespace-doc guards mirror the Spark terms exactly:
      // tokens() → 0 tokens (not ['']), zero-length text → 0.0 ratios
      Some("""WITH t AS (
                SELECT doc_id, text,
                  CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+') END
                    AS ltoks,
                  CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN []::VARCHAR[]
                    ELSE string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') END AS toks
                FROM documents
              ), f AS (
                SELECT doc_id,
                  CAST(len(toks) AS DOUBLE) AS ntok,
                  CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(length(regexp_replace(text, '[^\p{L}]', '',
                      'g')) AS DOUBLE) / length(text) END AS alpha_r,
                  CASE WHEN length(text) = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(length(regexp_replace(text, '[^[:punct:]]',
                      '', 'g')) AS DOUBLE) / length(text) END AS punct_r,
                  CASE WHEN len(toks) = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(list_sum(list_transform(toks,
                      x -> length(x))) AS DOUBLE) / len(toks) END AS mtl,
                  CASE WHEN len(ltoks) = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE CAST(len(list_filter(ltoks, x -> list_contains(
                    ['the','of','and','to','a','in','is','it','that',
                     'was','for','on','with','as','at','by','this','are',
                     'be'], x))) AS DOUBLE) / len(ltoks) END AS stop_r,
                  len(list_intersect(list_distinct(ltoks),
                    ['the','of','and','to','a','in','is','it','that',
                     'was','for','on','with','as','at','by','this','are',
                     'be'])) AS h_en,
                  len(list_intersect(list_distinct(ltoks),
                    ['der','die','das','und','ist','ein','eine','zu',
                     'den','von','mit','auf','für','im','nicht','sich',
                     'auch'])) AS h_de,
                  len(list_intersect(list_distinct(ltoks),
                    ['le','la','les','de','des','et','est','un','une',
                     'du','dans','que','qui','pour','pas','sur','au',
                     'avec'])) AS h_fr,
                  len(list_intersect(list_distinct(ltoks),
                    ['el','la','los','las','de','y','es','un','una',
                     'del','en','que','no','por','con','para','se',
                     'su'])) AS h_es
                FROM t
              )
              SELECT doc_id,
                ROUND(least(ntok / 50.0, CAST(1.0 AS DOUBLE)) * 0.25
                  + alpha_r * 0.25
                  + greatest(CAST(0.0 AS DOUBLE),
                      1.0 - punct_r * 5.0) * 0.2
                  + (CASE WHEN mtl BETWEEN 2.0 AND 12.0
                      THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.2 AS DOUBLE) END) * 0.15
                  + least(stop_r * 5.0, CAST(1.0 AS DOUBLE)) * 0.15, 4)
                  AS quality,
                CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                  ELSE (SELECT l FROM (VALUES ('en', h_en), ('de', h_de),
                    ('fr', h_fr), ('es', h_es)) v(l, h)
                    ORDER BY h DESC, l DESC LIMIT 1)
                END AS lang_pred
              FROM f""")),

    // planted oracle (the q_dedup_minhash_planted pattern): winnowing
    // fingerprint sets and canonical-text hashes are computed for the
    // WHOLE corpus plus exact copies of docs 0-49 under shifted ids; a
    // copy's fingerprint SET and canonical hash must be IDENTICAL to its
    // source's, so the agreement relation is exactly the 50 planted
    // pairs — SQL-expressible even though the xxhash64 values are not.
    // Falsifiable, not tautological: each pair must ALSO be non-empty
    // and DIFFER from ring-neighbor doc (i+1)%50's set — a degenerate
    // implementation emitting a constant or empty set for every doc
    // agrees with its neighbor too and produces 0 rows, failing the
    // oracle
    Q("q_text_fingerprint",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("text"))
        val all = docs.unionAll(
          docs.where(col("doc_id") < 50)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        val sets = graft.functions.TextAnalysis
          .winnowingFingerprints(all, "text")
          .select(col("doc_id"), col("fingerprints"),
            graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"))
        val orig = sets.where(col("doc_id") < 50)
        val copies = sets.where(col("doc_id") >= 100000L)
          .select((col("doc_id") - 100000L).as("doc_id"),
            col("fingerprints").as("fps_copy"), col("fp").as("fp_copy"))
        val neighbor = orig.select(
          ((col("doc_id") + 1) % 50).as("doc_id"),
          col("fingerprints").as("fps_nb"))
        orig.join(copies, "doc_id").join(neighbor, "doc_id")
          .where(col("fingerprints") === col("fps_copy") &&
            col("fp") === col("fp_copy") &&
            col("fingerprints") =!= col("fps_nb") &&
            size(col("fingerprints")) > 0)
          .select(col("doc_id"), (col("doc_id") + 100000L).as("copy_id"))
      },
      Some("""SELECT i AS doc_id, i + 100000 AS copy_id
              FROM generate_series(0, 49) t(i)""")),

    // unicode canonicalization (native codegen'd expression over JDK
    // Normalizer): composed and decomposed forms of the same glyph must
    // agree before any hash-based dedup; corpus is ASCII so the query
    // injects a decomposed "cafe" + COMBINING ACUTE per row — the
    // oracle's nfc_normalize must produce the identical composed string
    Q("q_text_normalize",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"),
            graft.plans.NativeFunctions.unicodeNormalize(
              concat(substring(col("text"), 1, 20), lit(" cafe\u0301")),
              "NFC").as("norm"))
          .withColumn("norm_len", length(col("norm")).cast("long"))
      },
      Some("""SELECT doc_id,
              nfc_normalize(substr(text, 1, 20) || ' cafe' || chr(769))
                AS norm,
              CAST(length(nfc_normalize(substr(text, 1, 20) || ' cafe' ||
                chr(769))) AS BIGINT) AS norm_len
              FROM documents""")),

    // Gopher-style repetition signals; bigram histogram computed
    // distributed (explode + groupBy), not per-row O(n^2) HOFs
    Q("q_text_repetition",
      (s, d) => graft.functions.TextAnalysis.repetitionStats(
        s.read.parquet(pq(d, "documents"))
          .repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text"),
      Some("""WITH t AS (SELECT doc_id,
                string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM documents),
              b AS (SELECT doc_id, len(toks) AS n,
                len(list_distinct(toks)) AS nd,
                list_transform(generate_series(1, len(toks)-1),
                  i -> toks[i] || ' ' || toks[i+1]) AS bgs FROM t),
              e AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
              c AS (SELECT doc_id, bg, count(*) AS c FROM e
                GROUP BY doc_id, bg),
              m AS (SELECT doc_id, max(c) AS mx,
                CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY doc_id)
              SELECT b.doc_id AS doc_id,
                ROUND(CAST(1.0 AS DOUBLE) - CAST(nd AS DOUBLE)/n, 4)
                  AS dup_word_frac,
                COALESCE(ROUND(CAST(mx AS DOUBLE)/tot, 4),
                  CAST(0.0 AS DOUBLE)) AS top_bigram_frac
              FROM b LEFT JOIN m ON b.doc_id = m.doc_id""")),

    // PII scrub: corpus has no PII, so inject a deterministic email/
    // phone/IP per doc in the query body, then redact — the expected
    // output is fully SQL-expressible
    Q("q_text_redact",
      (s, d) => {
        import graft.functions.TextAnalysis
        val injected = concat(substring(col("text"), 1, 40),
          lit(" mail user"), col("doc_id").cast("string"),
          lit("@example.com call 1-555-123-4567 ip 10.0.0."),
          (col("doc_id") % 256).cast("string"))
        s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), injected.as("__t"))
          .select(col("doc_id"),
            TextAnalysis.redactPii(col("__t")).as("redacted"),
            TextAnalysis.piiCount(col("__t")).cast("long").as("pii_n"))
      },
      Some("""WITH p AS (SELECT doc_id, substr(text, 1, 40) || ' mail user' ||
                CAST(doc_id AS VARCHAR) ||
                '@example.com call 1-555-123-4567 ip 10.0.0.' ||
                CAST(doc_id % 256 AS VARCHAR) AS t FROM documents)
              SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                  '(?:\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}',
                  '<PHONE>', 'g'),
                  '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')
                  AS redacted,
                CAST(len(regexp_extract_all(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                + len(regexp_extract_all(t,
                  '(?:\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}'))
                + len(regexp_extract_all(t,
                  '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS pii_n
              FROM p""")),

    // crawl-HTML -> text extraction: the corpus has no HTML, so the
    // query synthesizes a document wrapper (head/style/script with an
    // embedded '<', entities, a comment, block tags) deterministically
    // in BOTH engines, then runs the identical RE2-portable
    // regexp_replace chain — script/style payload gone, blocks become
    // newlines, entities decoded (&amp; last)
    Q("q_html_extract",
      (s, d) => {
        val html = concat(
          lit("<html><head><title>T</title><style>p{color:red}</style>" +
            "<script>var x = 1 < 2;</script></head><body><h1>"),
          col("source"), lit("</h1>\n<p>"), col("text"),
          lit(" &amp; A &lt; B</p><!-- hidden --><div>tail</div>" +
            "</body></html>"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.TextAnalysis.extractHtmlText(html)
              .as("extracted"))
      },
      Some("""WITH h AS (SELECT doc_id,
                '<html><head><title>T</title><style>p{color:red}</style><script>var x = 1 < 2;</script></head><body><h1>' ||
                source || '</h1>' || chr(10) || '<p>' || text ||
                ' &amp; A &lt; B</p><!-- hidden --><div>tail</div></body></html>'
                AS html FROM documents WHERE doc_id < 200),
              s1 AS (SELECT doc_id, regexp_replace(html,
                '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g') AS t FROM h),
              s2 AS (SELECT doc_id, regexp_replace(t,
                '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g') AS t FROM s1),
              s3 AS (SELECT doc_id, regexp_replace(t,
                '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
              s4 AS (SELECT doc_id, regexp_replace(t,
                '(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|blockquote|pre)\b[^>]*>',
                chr(10), 'g') AS t FROM s3),
              s5 AS (SELECT doc_id, regexp_replace(t,
                '(?s)<[^>]*>', ' ', 'g') AS t FROM s4),
              s6 AS (SELECT doc_id, regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(t,
                '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
                '&quot;', '"', 'g'), '&#39;|&apos;', '''', 'g'),
                '&amp;', '&', 'g') AS t FROM s5),
              s7 AS (SELECT doc_id, regexp_replace(t,
                '[ \t\x0B\f\r]+', ' ', 'g') AS t FROM s6),
              s8 AS (SELECT doc_id, regexp_replace(regexp_replace(t,
                ' ?\n ?', chr(10), 'g'), '\n{2,}', chr(10), 'g') AS t
                FROM s7)
              SELECT doc_id, regexp_replace(t, '^\s+|\s+$', '', 'g')
                AS extracted FROM s8""")),

    // URL canonicalization: synthesized crawl URLs exercise the tricky
    // cases — LEADING tracking param (seam repair must re-anchor the
    // query to '?'), trailing tracking param, fragment, default port,
    // mixed-case scheme/host vs case-preserved path — and the oracle
    // replays the identical regex chain (DuckDB \1 replacement syntax
    // for Spark's $1)
    Q("q_url_normalize",
      (s, d) => {
        val u = concat(lit("HTTPS://WWW."), col("source"),
          lit(".Example.COM:443/Path/"), col("doc_id").cast("string"),
          lit("?utm_source=news&id="), col("doc_id").cast("string"),
          lit("&fbclid=x#frag"))
        graft.plans.NativeFunctions.register(s) // urlCanonicalize pct pass
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.Urls.urlHost(u).as("host"),
            graft.functions.Urls.urlDomain(u).as("domain"),
            graft.functions.Urls.urlPath(u).as("path"),
            graft.functions.Urls.urlCanonicalize(u).as("canonical"))
      },
      Some("""WITH u AS (SELECT doc_id,
                'HTTPS://WWW.' || source || '.Example.COM:443/Path/' ||
                CAST(doc_id AS VARCHAR) || '?utm_source=news&id=' ||
                CAST(doc_id AS VARCHAR) || '&fbclid=x#frag' AS url
                FROM documents WHERE doc_id < 200),
              h AS (SELECT doc_id, url,
                lower(regexp_replace(regexp_replace(regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1),
                  '^[^@]*@', ''), ':[0-9]*$', '')) AS host FROM u),
              nf AS (SELECT doc_id, url, host,
                regexp_replace(url, '#.*', '', 'g') AS s FROM h),
              nt AS (SELECT doc_id, url, host, regexp_replace(s,
                '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref_src)=[^&]*',
                '\1', 'g') AS s FROM nf),
              sm AS (SELECT doc_id, url, host,
                regexp_replace(regexp_replace(regexp_replace(s,
                  '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '', 'g')
                AS s FROM nt),
              np AS (SELECT doc_id, url, host, regexp_replace(s,
                '^([A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?[^/:?#]*):(?:80|443)([/?#]|$)',
                '\1\2', 'g') AS s FROM sm)
              SELECT doc_id, host,
                regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
                regexp_extract(url,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
                  AS path,
                lower(regexp_extract(s,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) ||
                substr(s, length(regexp_extract(s,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1)
                  AS canonical
              FROM np""")),

    // PSL registrable domains: planted hosts exercise every rule class
    // — multi-label registries (co.uk/com.au), the Japanese city
    // wildcard+exception pair, wildcard-only zones (*.bd, *.ck with
    // !www.ck), and the default rule. The engine matches its full PSL
    // snapshot; the oracle replays longest-suffix match against the
    // EFFECTIVE suffixes of the planted hosts (wildcards expanded,
    // exceptions omitted — how a PSL rule set grounds out on concrete
    // hosts), so both sides compute the answer independently. Two
    // hosts sit beyond the curated fallback snapshot (co.bw, the
    // private-section github.io) and are green only with the full
    // bundled publicsuffix.org list loaded.
    Q("q_url_domain",
      (s, d) => {
        val hosts = array(
          lit("www.shop.example.co.uk"), lit("news.example.com.au"),
          lit("sub.city.kobe.jp"), lit("shop.foo.kobe.jp"),
          lit("x.y.foo.bd"), lit("a.www.ck"),
          lit("deep.a.b.ck"), lit("WWW.Example.COM"),
          // beyond the curated fallback snapshot — green only when the
          // FULL bundled list is loaded: an ICANN registry absent from
          // the fallback and a PRIVATE-section suffix
          lit("shop.example.co.bw"), lit("blog.demo.github.io"))
        val u = concat(lit("https://"),
          element_at(hosts, (col("doc_id") % 10 + 1).cast("int")),
          lit("/p"))
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.Urls.urlHost(u).as("host"),
            graft.functions.Urls.urlDomain(u, psl = true)
              .as("domain_psl"),
            graft.functions.Urls.urlDomain(u).as("domain_naive"))
      },
      Some("""WITH hosts AS (SELECT doc_id, lower(CASE CAST(doc_id % 10 AS INT)
                  WHEN 0 THEN 'www.shop.example.co.uk'
                  WHEN 1 THEN 'news.example.com.au'
                  WHEN 2 THEN 'sub.city.kobe.jp'
                  WHEN 3 THEN 'shop.foo.kobe.jp'
                  WHEN 4 THEN 'x.y.foo.bd'
                  WHEN 5 THEN 'a.www.ck'
                  WHEN 6 THEN 'deep.a.b.ck'
                  WHEN 7 THEN 'WWW.Example.COM'
                  WHEN 8 THEN 'shop.example.co.bw'
                  ELSE 'blog.demo.github.io' END) AS host
                FROM documents WHERE doc_id < 200),
              sfx AS (SELECT * FROM (VALUES ('co.uk'), ('com.au'),
                  ('kobe.jp'), ('foo.kobe.jp'), ('foo.bd'), ('b.ck'),
                  ('co.bw'), ('github.io'))
                  t(s)),
              m AS (SELECT h.doc_id, h.host, MAX(length(s.s)) AS sl
                FROM hosts h LEFT JOIN sfx s
                  ON (h.host = s.s OR h.host LIKE '%.' || s.s)
                GROUP BY 1, 2)
              SELECT doc_id, host,
                CASE WHEN sl IS NULL THEN
                    regexp_extract(host, '([^.]+\.[^.]+)$', 1)
                  WHEN length(host) = sl THEN host
                  ELSE regexp_extract(
                      substr(host, 1, length(host) - sl - 1),
                      '([^.]+)$', 1) || '.' ||
                    substr(host, length(host) - sl + 1) END AS domain_psl,
                regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain_naive
              FROM m""")),

    // percent-encoding normalization: planted %-escapes cover decode
    // (unreserved %61/%41/%7e -> a/A/~), canonical-uppercase of kept
    // escapes (%2f -> %2F), and malformed passthrough (%zz); the
    // oracle replays the same spellings as literal replaces, and the
    // canonical column proves the pass rides urlCanonicalize ahead of
    // the fragment/lowercase steps
    Q("q_url_pct",
      (s, d) => {
        val u = concat(lit("HTTPS://Example.COM/P%61th/"),
          col("doc_id").cast("string"),
          lit("?q=%2fv%41l%7e&x=%4d%zz#f"))
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.Urls.urlPctNormalize(u).as("normalized"),
            graft.functions.Urls.urlCanonicalize(u).as("canonical"))
      },
      Some("""WITH u AS (SELECT doc_id,
                'HTTPS://Example.COM/P%61th/' || CAST(doc_id AS VARCHAR) ||
                '?q=%2fv%41l%7e&x=%4d%zz#f' AS url
                FROM documents WHERE doc_id < 200),
              n AS (SELECT doc_id, replace(replace(replace(replace(
                replace(url, '%61', 'a'), '%41', 'A'), '%7e', '~'),
                '%2f', '%2F'), '%4d', 'M') AS normalized FROM u),
              c AS (SELECT doc_id, normalized,
                regexp_replace(normalized, '#.*', '', 'g') AS s FROM n)
              SELECT doc_id, normalized,
                lower(regexp_extract(s,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) ||
                substr(s, length(regexp_extract(s,
                  '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1)
                  AS canonical
              FROM c""")),

    // IDN/punycode host normalization: planted ACE and plain hosts
    // (the q_url_domain planted pattern); host_unicode decodes xn--
    // labels through the JDK's RFC 3490 codec, host_ascii is the
    // encode direction (identity on already-ACE/plain input). The
    // oracle's expected decodings are literal and independently
    // documented (bücher/münchen/中国/рф/españa are the standard IDN
    // examples); the Unicode→ACE round trip is property-tested in
    // NativeExprSpec.
    Q("q_url_idn",
      (s, d) => {
        val hosts = array(
          lit("xn--bcher-kva.example"), lit("XN--MNCHEN-3YA.de"),
          lit("www.xn--fiqs8s"), lit("shop.xn--p1ai"),
          lit("xn--espaa-rta.com"), lit("plain.example.co.uk"),
          lit("münchen.de"), lit("www.中国"))
        val u = concat(lit("https://"),
          element_at(hosts, (col("doc_id") % 8 + 1).cast("int")),
          lit("/p"))
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.Urls.urlHost(u).as("host"),
            graft.functions.Urls.urlIdnHost(u).as("host_unicode"),
            graft.functions.Urls.urlIdnHost(u, ascii = true)
              .as("host_ascii"))
      },
      Some("""WITH h AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS k,
                lower(CASE CAST(doc_id % 8 AS INT)
                  WHEN 0 THEN 'xn--bcher-kva.example'
                  WHEN 1 THEN 'XN--MNCHEN-3YA.de'
                  WHEN 2 THEN 'www.xn--fiqs8s'
                  WHEN 3 THEN 'shop.xn--p1ai'
                  WHEN 4 THEN 'xn--espaa-rta.com'
                  WHEN 5 THEN 'plain.example.co.uk'
                  WHEN 6 THEN 'münchen.de'
                  ELSE 'www.中国' END) AS host
                FROM documents WHERE doc_id < 200)
              SELECT doc_id, host,
                CASE k WHEN 0 THEN 'bücher.example'
                  WHEN 1 THEN 'münchen.de'
                  WHEN 2 THEN 'www.中国'
                  WHEN 3 THEN 'shop.рф'
                  WHEN 4 THEN 'españa.com'
                  WHEN 5 THEN 'plain.example.co.uk'
                  WHEN 6 THEN 'münchen.de'
                  ELSE 'www.中国' END AS host_unicode,
                CASE k WHEN 0 THEN 'xn--bcher-kva.example'
                  WHEN 1 THEN 'xn--mnchen-3ya.de'
                  WHEN 2 THEN 'www.xn--fiqs8s'
                  WHEN 3 THEN 'shop.xn--p1ai'
                  WHEN 4 THEN 'xn--espaa-rta.com'
                  WHEN 5 THEN 'plain.example.co.uk'
                  WHEN 6 THEN 'xn--mnchen-3ya.de'
                  ELSE 'www.xn--fiqs8s' END AS host_ascii
              FROM h""")),

    // BPE merge-pair statistics (Sennrich et al. 2016): top-20
    // adjacent-symbol pairs at merge step 0, counted over distinct
    // word types weighted by frequency — the corpus touches ONE
    // counting aggregation; pairs come off the vocabulary-scale type
    // table. Deterministic through ties (cnt desc, pair asc).
    Q("q_bpe_pairs",
      (s, d) => graft.functions.Bpe.topPairs(
        s.read.parquet(pq(d, "documents")), "text", 20),
      Some("""WITH words AS (SELECT
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS w
                FROM documents),
              wf AS (SELECT w, COUNT(*) AS wf FROM words
                WHERE w <> '' GROUP BY 1),
              p AS (SELECT unnest(list_transform(range(1, len(c)),
                    i -> c[i] || ' ' || c[i + 1])) AS pair, wf
                FROM (SELECT string_split(w, '') AS c, wf FROM wf))
              SELECT pair, CAST(SUM(wf) AS BIGINT) AS cnt FROM p
              GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""")),

    // Greedy BPE encode under a fixed literal merge list (including a
    // same-symbol merge, the run-adjacency edge case). The oracle
    // replays the encoder EXACTLY via nested REPLACE over a sequence
    // whose symbols each carry their own boundary spaces — with
    // per-symbol boundaries, SQL REPLACE's continue-after-replacement
    // scan IS the paper's merge semantics (property-checked against
    // the native expression in BpeSpec); the REPLACE chain is
    // generated from the same demoMerges list the query ships, so the
    // two sides cannot drift.
    Q("q_bpe_encode",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"),
            graft.functions.Bpe.encode(lower(trim(col("text"))),
              graft.functions.Bpe.demoMerges).as("sub"))
          .select(col("doc_id"),
            size(col("sub")).cast("long").as("n_subwords"),
            concat_ws(" ", col("sub")).as("enc"))
      },
      Some(bpeEncodeOracleSql)),

    // byte-level (GPT-2-style) BPE on RAW synthesized text: the
    // engine runs the real regex pre-tokenizer + bytes_to_unicode
    // alphabet + merge list; the oracle replays the same pipeline
    // with the pre-tokens grounded out analytically (the text is
    // built from literals chosen to exercise contractions,
    // punctuation, space-carrying 'Ġ' tokens, and a per-doc digit
    // run that stays unmerged)
    Q("q_bpe_encode_bytes",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        val t = concat(lit("hello world, it's rank "),
          col("doc_id").cast("string"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.Bpe.encodeBytes(t,
              graft.functions.Bpe.demoByteMerges).as("sub"))
          .select(col("doc_id"),
            size(col("sub")).cast("long").as("n_subwords"),
            concat_ws(" ", col("sub")).as("enc"))
      },
      Some(bpeEncodeBytesOracleSql)),

    // text → token IDS, the form a trainer consumes: encodeBytesToIds
    // rides the vocabulary as one map literal; ids on both sides come
    // from the same deterministic vocabBytes assignment (the oracle's
    // CASE is GENERATED from it), so the check pins the id layout —
    // GPT-2's base-byte ids then rank-ordered merge products
    Q("q_bpe_token_ids",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        val t = concat(lit("hello world, it's rank "),
          col("doc_id").cast("string"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            concat_ws(",", graft.functions.Bpe.encodeBytesToIds(t,
                graft.functions.Bpe.demoByteMerges)
              .cast("array<string>")).as("ids"))
      },
      Some(bpeTokenIdsOracleSql)),

    // byte-level losslessness, proven over REAL corpus text (not a
    // synthesized fixture): decode(encode(text)) must equal text for
    // every document — the property that makes byte-level the right
    // alphabet for training data (no OOV, no normalization loss). The
    // oracle is the analytic constant the property asserts; any
    // pre-tokenizer character drop or byte-map error breaks the hash.
    Q("q_bpe_roundtrip_bytes",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        val enc = graft.functions.Bpe.encodeBytes(col("text"),
          graft.functions.Bpe.demoByteMerges)
        s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"),
            (graft.functions.Bpe.decodeBytes(enc) === col("text"))
              .as("lossless"))
      },
      Some("""SELECT doc_id, CAST(TRUE AS BOOLEAN) AS lossless
              FROM documents""")),

    // one full BPE TRAINING iteration under the driver gate: find the
    // best step-0 pair (cnt desc, pair asc — the trainer's tiebreak),
    // apply it to every word type, recount. The oracle computes the
    // best pair itself and replays the application via the wrapped-
    // symbol REPLACE (symbols keep owning their boundary spaces after
    // a merge, so post-merge symbols are exactly the double-space
    // split), proving the iterative loop's core — count/pick/apply —
    // in SQL, not just its step-0 statistics.
    Q("q_bpe_train_step",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        graft.plans.NativeFunctions.register(s)
        val best = graft.functions.Bpe.topPairs(docs, "text", 1)
          .collect()(0).getString(0).split(" ", 2)
        graft.functions.Bpe.pairCountsWithMerges(
            docs, "text", Seq(best(0) -> best(1)))
          .orderBy(col("cnt").desc, col("pair").asc).limit(20)
      },
      Some("""WITH words AS (SELECT
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS w
                FROM documents),
              wf AS (SELECT w, COUNT(*) AS wf FROM words
                WHERE w <> '' GROUP BY 1),
              p0 AS (SELECT unnest(list_transform(range(1, len(c)),
                    i -> c[i] || ' ' || c[i + 1])) AS pair, wf
                FROM (SELECT string_split(w, '') AS c, wf FROM wf)),
              best AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS cnt FROM p0
                GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 1),
              applied AS (SELECT REPLACE(
                  ' ' || array_to_string(string_split(w, ''),
                    repeat(' ', 2)) || ' ',
                  ' ' || split_part(best.pair, ' ', 1) ||
                    repeat(' ', 2) ||
                    split_part(best.pair, ' ', 2) || ' ',
                  ' ' || replace(best.pair, ' ', '') || ' ') AS s, wf
                FROM wf CROSS JOIN best),
              rc AS (SELECT unnest(list_transform(range(1, len(sy)),
                    i -> sy[i] || ' ' || sy[i + 1])) AS pair, wf
                FROM (SELECT string_split(trim(s), repeat(' ', 2))
                    AS sy, wf
                  FROM applied))
              SELECT pair, CAST(SUM(wf) AS BIGINT) AS cnt FROM rc
              GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 20""")),

    // text-density boilerplate removal: the synthesized page wraps the
    // document text with a nav bar, a too-short block, a link-heavy
    // "related" strip and a linky footer — only content-length,
    // link-sparse blocks survive. Lengths are counted pre-decode and
    // the density threshold is integer percent, so the keep decision is
    // exact in both engines; the oracle replays the identical
    // block-split + lambda scoring (COALESCE on the anchor join:
    // DuckDB's array_to_string of an empty list is NULL where Spark's
    // concat_ws is '')
    Q("q_html_boilerplate",
      (s, d) => {
        val html = concat(
          lit("<html><head><script>nav()</script></head><body>" +
            "<div><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
            "<a href=\"/c\">Contact</a></div><p>"),
          col("text"),
          lit("</p><div>This is the main article body, long enough " +
            "to keep.</div><div>Related: <a href=\"/x\">"),
          col("source"),
          lit(" article one</a></div><footer><a href=\"/p\">Privacy " +
            "policy</a> &amp; Example</footer></body></html>"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.TextAnalysis.removeBoilerplate(html)
              .as("content"))
      },
      Some("""WITH h AS (SELECT doc_id,
                '<html><head><script>nav()</script></head><body><div><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div><p>' ||
                text ||
                '</p><div>This is the main article body, long enough to keep.</div><div>Related: <a href="/x">' ||
                source ||
                ' article one</a></div><footer><a href="/p">Privacy policy</a> &amp; Example</footer></body></html>'
                AS html FROM documents WHERE doc_id < 200),
              s1 AS (SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(html,
                  '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
                  '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
                  '(?s)<!--.*?-->', ' ', 'g') AS t FROM h),
              b AS (SELECT doc_id, string_split_regex(t,
                '(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|blockquote|pre)\b[^>]*>')
                AS blocks FROM s1),
              sc AS (SELECT doc_id, list_transform(blocks,
                x -> struct_pack(
                  t := trim(regexp_replace(regexp_replace(x,
                    '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
                  l := trim(regexp_replace(regexp_replace(
                    COALESCE(array_to_string(regexp_extract_all(x,
                      '(?is)<a\b[^>]*>(.*?)</a\s*>', 1), ' '), ''),
                    '(?s)<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))))
                AS bs FROM b),
              k AS (SELECT doc_id, list_filter(bs,
                s -> length(s.t) >= 25
                  AND length(s.l) * 100 <= length(s.t) * 40) AS ks
                FROM sc)
              SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(
                  array_to_string(list_transform(ks, s -> s.t), chr(10)),
                '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'),
                '&gt;', '>', 'g'), '&quot;', '"', 'g'),
                '&#39;|&apos;', '''', 'g'), '&amp;', '&', 'g')
                AS content
              FROM k""")),

    // Unicode-script letter ratios: the corpus is ASCII-Latin, so the
    // query plants a fixed mixed-script suffix (Cyrillic + Han +
    // Arabic) — counts and fractions are deterministic in both
    // engines' regex implementations (Java \p{IsX} ≡ RE2 \p{X})
    Q("q_text_script",
      (s, d) => {
        val t = concat(col("text"),
          lit(" Привет мир 你好世界 مرحبا بالعالم"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.functions.TextAnalysis.letterCount(t).as("n_letters"),
            graft.functions.TextAnalysis.scriptLetterCount(t, "Latin")
              .as("latin"),
            graft.functions.TextAnalysis.scriptLetterCount(t, "Cyrillic")
              .as("cyrillic"),
            graft.functions.TextAnalysis.scriptLetterCount(t, "Han")
              .as("han"),
            graft.functions.TextAnalysis.scriptLetterCount(t, "Arabic")
              .as("arabic"))
          .withColumn("latin_frac",
            round(col("latin").cast("double") / col("n_letters"), 4))
      },
      Some("""WITH t AS (SELECT doc_id,
                text || ' Привет мир 你好世界 مرحبا بالعالم' AS tt
                FROM documents WHERE doc_id < 200)
              SELECT doc_id,
                len(regexp_extract_all(lt, '\p{L}')) AS n_letters,
                len(regexp_extract_all(lt, '\p{Latin}')) AS latin,
                len(regexp_extract_all(lt, '\p{Cyrillic}')) AS cyrillic,
                len(regexp_extract_all(lt, '\p{Han}')) AS han,
                len(regexp_extract_all(lt, '\p{Arabic}')) AS arabic,
                ROUND(CAST(len(regexp_extract_all(lt, '\p{Latin}'))
                    AS DOUBLE)
                  / len(regexp_extract_all(lt, '\p{L}')), 4) AS latin_frac
              FROM (SELECT doc_id,
                regexp_replace(tt, '[^\p{L}]', '', 'g') AS lt FROM t)""")),

    // numeric + named character-reference decode via the native
    // expression (no engine-portable SQL form exists for codepoint
    // emission, so the oracle CONSTRUCTS the expected decode of the
    // planted references: A/B by decimal/hex, curly quote + emoji by
    // chr(), single-pass &amp;lt; semantics, unknown and surrogate
    // references verbatim). Corpus text is &-free (checked), so the
    // planted suffix is the only decode site.
    Q("q_html_entities",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.plans.NativeFunctions.htmlEntitiesNative(concat(
              col("text"),
              lit(" &#65;&#x42; &rsquo;&#128077; &amp;lt; &bogus; &#xD800;")))
              .as("decoded"))
      },
      Some("""SELECT doc_id, text || ' AB ' || chr(8217) || chr(128077) ||
                ' &lt; &bogus; &#xD800;' AS decoded
              FROM documents WHERE doc_id < 200""")),

    // benchmark decontamination: distinct 5-gram overlap of each doc
    // against the held-out set (source = src0); finds the planted
    // near-dups whose source differs
    Q("q_contamination",
      (s, d) => {
        // repartition: the CPU-bound shingle pass would otherwise run in
        // as few tasks as the corpus has file splits (one, at test SF)
        val docs = s.read.parquet(pq(d, "documents"))
          .repartition(s.sparkContext.defaultParallelism)
        graft.operators.Dedup.contaminationScore(
          docs.where(col("source") =!= "src0"),
          docs.where(col("source") === "src0"),
          "doc_id", "text", shingleWords = 5)
      },
      Some("""WITH t AS (SELECT doc_id, source,
                string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM documents),
              s AS (SELECT doc_id, source,
                unnest(list_distinct(list_transform(
                  generate_series(0, greatest(len(toks)-5, 0)),
                  i -> array_to_string(toks[i+1:i+5], ' ')))) AS sh FROM t),
              bench AS (SELECT DISTINCT sh FROM s WHERE source = 'src0'),
              d AS (SELECT doc_id, s.sh,
                CASE WHEN bench.sh IS NULL THEN 0 ELSE 1 END AS hit
                FROM s LEFT JOIN bench ON s.sh = bench.sh
                WHERE s.source <> 'src0')
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                CAST(sum(hit) AS BIGINT) AS n_contaminated,
                ROUND(CAST(sum(hit) AS DOUBLE)/count(*), 4) AS contamination
              FROM d GROUP BY doc_id""")),

    // decontamination against MANY benchmarks in one pass: src0 and
    // src1 act as two held-out sets; output is only the (doc,
    // benchmark) pairs with >= 1 shared 5-gram — hits-sized, never
    // |docs| x |benchmarks|
    Q("q_contamination_multi",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .repartition(s.sparkContext.defaultParallelism)
        graft.operators.Dedup.contaminationScoreMulti(
          docs.where(!col("source").isin("src0", "src1")),
          docs.where(col("source").isin("src0", "src1"))
            .select(col("source").as("benchmark"), col("text")),
          "doc_id", "text", "benchmark", shingleWords = 5)
      },
      Some("""WITH t AS (SELECT doc_id, source,
                string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM documents),
              sh AS (SELECT doc_id, source,
                unnest(list_distinct(list_transform(
                  generate_series(0, greatest(len(toks)-5, 0)),
                  i -> array_to_string(toks[i+1:i+5], ' ')))) AS sh FROM t),
              bench AS (SELECT DISTINCT source AS benchmark, sh
                FROM sh WHERE source IN ('src0', 'src1')),
              d AS (SELECT doc_id, sh FROM sh
                WHERE source NOT IN ('src0', 'src1')),
              tot AS (SELECT doc_id, CAST(count(*) AS BIGINT)
                  AS n_shingles FROM d GROUP BY 1),
              hits AS (SELECT doc_id, benchmark,
                  CAST(count(*) AS BIGINT) AS n_contaminated
                FROM d JOIN bench USING (sh) GROUP BY 1, 2)
              SELECT hits.doc_id, benchmark, n_shingles, n_contaminated,
                ROUND(CAST(n_contaminated AS DOUBLE) / n_shingles, 4)
                  AS contamination
              FROM hits JOIN tot ON hits.doc_id = tot.doc_id""")),

    // CCNet-style cross-document line dedup; the corpus has no newlines,
    // so the query body synthesizes 10-word lines first (deterministic,
    // mirrored in the oracle), then drops every line's repeat occurrences
    // corpus-wide and reassembles docs
    Q("q_line_dedup",
      (s, d) => {
        val toks = graft.functions.TextAnalysis.tokens(col("text"))
        val lined = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), array_join(transform(
            sequence(lit(0), greatest(
              floor((size(toks) - 1) / lit(10.0)), lit(0)).cast("int")),
            i => concat_ws(" ", slice(toks, i * 10 + 1, lit(10)))), "\n")
            .as("text_ln"))
        graft.operators.Dedup.lineDedup(lined, "doc_id", "text_ln", "\n")
      },
      Some("""WITH t AS (SELECT doc_id,
                string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM documents),
              l AS (SELECT doc_id, list_transform(generate_series(0,
                  CAST(greatest(floor((len(toks)-1)/10.0), 0) AS BIGINT)),
                i -> array_to_string(toks[i*10+1:i*10+10], ' ')) AS lns
                FROM t),
              e AS (SELECT doc_id, unnest(lns) AS line,
                unnest(generate_series(1, len(lns))) AS pos FROM l),
              f AS (SELECT * FROM e WHERE length(trim(line)) > 0),
              k AS (SELECT doc_id, line, pos, row_number() OVER
                (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM f)
              SELECT doc_id,
                string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
                CAST(count(*) AS BIGINT) AS n_lines_kept
              FROM k WHERE rn = 1 GROUP BY doc_id""")),

    // deterministic hash sampling: membership is a pure function of
    // (key, salt, fraction) — same sample every run, every partitioning,
    // every engine (unlike df.sample, whose RNG is partition-dependent)
    Q("q_sample_hash",
      (s, d) => graft.operators.Sampling.hashSample(
        s.read.parquet(pq(d, "documents")).select(col("doc_id"), col("lang")),
        "doc_id", 0.15, salt = "graft"),
      Some("""SELECT doc_id, lang FROM documents
              WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 4)
                < '2666'""")),

    // deterministic per-group sample: k docs per language, chosen by
    // stable hash order (one shuffle on the group key)
    Q("q_sample_per_group",
      (s, d) => graft.operators.Sampling.hashSamplePerGroup(
        s.read.parquet(pq(d, "documents")).select(col("doc_id"), col("lang")),
        "doc_id", Seq("lang"), k = 3, salt = "g"),
      Some("""SELECT doc_id, lang FROM (
                SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
                  ORDER BY md5('g' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
                FROM documents) WHERE rn <= 3""")),

    // per-row weighted keep (longer docs kept proportionally more often);
    // deterministic, engine-portable via printf-rendered threshold
    Q("q_sample_weighted",
      (s, d) => graft.operators.Sampling.hashSampleWeighted(
        s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("n_chars"),
            (col("n_chars") / lit(500.0)).as("w")),
        "doc_id", "w", salt = "w").drop("w"),
      // weight >= 1.0 → 'g' (keep ALL), mirroring hashSampleWeighted's
      // sentinel — a 'ffff' cap would drop prefix-ffff keys on both sides
      Some("""SELECT doc_id, n_chars FROM documents
              WHERE substr(md5('w' || CAST(doc_id AS VARCHAR)), 1, 4) <
                CASE WHEN CAST(n_chars AS DOUBLE)/500 >= 1.0 THEN 'g'
                ELSE printf('%04x', CAST(least(floor(least(greatest(
                  CAST(n_chars AS DOUBLE)/500, 0.0), 1.0)*65536), 65535)
                  AS INT)) END""")),

    // incremental ingestion dedup: a synthesized batch (every 5th doc an
    // exact repeat of history, every 7th collapsed to one shared body,
    // rest genuinely new) anti-joined against the already-seen corpus —
    // history is touched only as a hash projection
    Q("q_dedup_incremental",
      (s, d) => {
        val seen = s.read.parquet(pq(d, "documents"))
        val batch = seen.select((col("doc_id") + 10000).as("doc_id"),
          when(col("doc_id") % 7 === 3, lit("shared new document body"))
            .when(col("doc_id") % 5 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v2"))).as("text"))
        graft.operators.Dedup.incrementalExact(batch, seen,
          "doc_id", "text")
      },
      Some("""WITH batch AS (SELECT doc_id + 10000 AS doc_id,
                CASE WHEN doc_id % 7 = 3 THEN 'shared new document body'
                     WHEN doc_id % 5 = 0 THEN text
                     ELSE text || ' v2' END AS text FROM documents),
              seen AS (SELECT DISTINCT md5(text) AS h FROM documents),
              b AS (SELECT doc_id, text, md5(text) AS h FROM batch),
              a AS (SELECT b.doc_id, b.text, b.h FROM b
                LEFT JOIN seen ON b.h = seen.h WHERE seen.h IS NULL),
              k AS (SELECT doc_id, text, row_number() OVER
                (PARTITION BY h ORDER BY doc_id) AS rn FROM a)
              SELECT doc_id, text FROM k WHERE rn = 1""")),

    // END-TO-END pipeline composition: quality-score + language-gate ->
    // exact dedup -> deterministic split assignment, in ONE declarative
    // plan (Catalyst fuses the scalar stages into the scan projection;
    // the only shuffles are the dedup window and nothing else — split
    // assignment is a pure predicate). The oracle replays every stage in
    // SQL, so the COMPOSITION is hash-verified, not just the parts.
    Q("q_pipeline_e2e",
      (s, d) => {
        import graft.functions.TextAnalysis
        val scored = s.read.parquet(pq(d, "documents"))
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"), col("text"),
            TextAnalysis.qualityScore(col("text")).as("quality"),
            TextAnalysis.langId(col("text")).as("lang_pred"))
          .where(col("quality") >= 0.5 && col("lang_pred") === "en")
        val deduped = graft.operators.Dedup.exact(
          scored, Seq("text"), "doc_id")
        graft.operators.Sampling.splitAssign(deduped, "doc_id",
          Seq("train" -> 0.9, "val" -> 0.1), salt = "e2e")
          .select(col("doc_id"), col("quality"), col("split"))
      },
      Some("""WITH t AS (
                SELECT doc_id, text,
                  string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+') AS ltoks,
                  string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
                FROM documents
              ), f AS (
                SELECT doc_id, text,
                  CAST(len(toks) AS DOUBLE) AS ntok,
                  CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g'))
                    AS DOUBLE) / length(text) AS alpha_r,
                  CAST(length(regexp_replace(text, '[^[:punct:]]', '',
                    'g')) AS DOUBLE) / length(text) AS punct_r,
                  CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS DOUBLE) / len(toks) AS mtl,
                  CAST(len(list_filter(ltoks, x -> list_contains(
                    ['the','of','and','to','a','in','is','it','that',
                     'was','for','on','with','as','at','by','this','are',
                     'be'], x))) AS DOUBLE) / len(ltoks) AS stop_r,
                  len(list_intersect(list_distinct(ltoks),
                    ['the','of','and','to','a','in','is','it','that',
                     'was','for','on','with','as','at','by','this','are',
                     'be'])) AS h_en,
                  len(list_intersect(list_distinct(ltoks),
                    ['der','die','das','und','ist','ein','eine','zu',
                     'den','von','mit','auf','für','im','nicht','sich',
                     'auch'])) AS h_de,
                  len(list_intersect(list_distinct(ltoks),
                    ['le','la','les','de','des','et','est','un','une',
                     'du','dans','que','qui','pour','pas','sur','au',
                     'avec'])) AS h_fr,
                  len(list_intersect(list_distinct(ltoks),
                    ['el','la','los','las','de','y','es','un','una',
                     'del','en','que','no','por','con','para','se',
                     'su'])) AS h_es
                FROM t
              ), q AS (
                SELECT doc_id, text,
                  ROUND(least(ntok / 50.0, CAST(1.0 AS DOUBLE)) * 0.25
                    + alpha_r * 0.25
                    + greatest(CAST(0.0 AS DOUBLE),
                        1.0 - punct_r * 5.0) * 0.2
                    + (CASE WHEN mtl BETWEEN 2.0 AND 12.0
                        THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.2 AS DOUBLE) END) * 0.15
                    + least(stop_r * 5.0, CAST(1.0 AS DOUBLE)) * 0.15, 4)
                    AS quality,
                  CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                    ELSE (SELECT l FROM (VALUES ('en', h_en), ('de', h_de),
                      ('fr', h_fr), ('es', h_es)) v(l, h)
                      ORDER BY h DESC, l DESC LIMIT 1)
                  END AS lang_pred
                FROM f
              ), flt AS (
                SELECT doc_id, text, quality FROM q
                WHERE quality >= 0.5 AND lang_pred = 'en'
              ), ddp AS (
                SELECT doc_id, quality, row_number() OVER
                  (PARTITION BY text ORDER BY doc_id) AS rn FROM flt
              )
              SELECT doc_id, quality,
                CASE WHEN substr(md5('e2e' || CAST(doc_id AS VARCHAR)),
                  1, 4) < 'e666' THEN 'train' ELSE 'val' END AS split
              FROM ddp WHERE rn = 1""")),

    // stable contiguous 0..N-1 ids in key order WITHOUT a single-task
    // global window: range partition + parallel per-partition windows +
    // broadcast cumulative offsets (driver traffic = numPartitions rows)
    Q("q_assign_ids",
      (s, d) => graft.operators.Ids.stableOrdinals(
        s.read.parquet(pq(d, "documents")).select(col("doc_id")),
        "doc_id", "ordinal"),
      Some("""SELECT doc_id,
              CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
                AS ordinal FROM documents""")),

    // sequence packing: assign docs (in id order) to fixed-budget
    // training sequences via DISTRIBUTED prefix sum — range partition +
    // parallel per-partition cumsums + broadcast offsets; never the
    // single-task global window the naive OVER (ORDER BY) plans
    Q("q_pack_sequences",
      (s, d) => graft.operators.Pack.packSequences(
        s.read.parquet(pq(d, "documents")).select(col("doc_id"),
          col("n_chars")),
        "doc_id", "n_chars", maxTokens = 2000L)
        .select(col("doc_id"), col("seq_id"), col("seq_offset")),
      Some("""WITH c AS (SELECT doc_id, n_chars,
                CAST(COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS ex FROM documents)
              SELECT doc_id, CAST(floor(ex / 2000.0) AS BIGINT) AS seq_id,
                ex - CAST(floor(ex / 2000.0) AS BIGINT) * 2000
                  AS seq_offset FROM c""")),

    // token-budget selection: best-first prefix under a global budget
    Q("q_token_budget",
      (s, d) => graft.operators.Pack.takeTokenBudget(
        s.read.parquet(pq(d, "documents")).select(col("doc_id"),
          col("n_chars")),
        "doc_id", "n_chars", budget = 50000L),
      Some("""WITH c AS (SELECT doc_id, n_chars,
                CAST(SUM(n_chars) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum FROM documents)
              SELECT doc_id, n_chars FROM c WHERE cum <= 50000""")),

    // RAG-style token-window chunking: 64-token windows, stride 48
    // (16-token overlap); the oracle replays the window arithmetic and
    // the slice text exactly
    Q("q_chunk_tokens",
      (s, d) => graft.functions.TextAnalysis.chunkByTokens(
          s.read.parquet(pq(d, "documents"))
            .select(col("doc_id"), col("text")),
          "text", chunkSize = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx").cast("bigint"),
          col("chunk_start").cast("bigint"),
          col("chunk_tokens").cast("bigint"), col("chunk_text")),
      Some("""WITH t AS (SELECT doc_id,
                  string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks
                FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
              c AS (SELECT doc_id, toks, unnest(generate_series(0,
                  CAST(floor((greatest(len(toks) - 64, 0) + 47) / 48)
                    AS BIGINT))) AS chunk_idx FROM t)
              SELECT doc_id, chunk_idx, chunk_idx * 48 AS chunk_start,
                least(64, len(toks) - chunk_idx * 48) AS chunk_tokens,
                array_to_string(
                  toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ')
                  AS chunk_text
              FROM c""")),

    // deterministic train/val/test split assignment by hashed key
    Q("q_split_assign",
      (s, d) => graft.operators.Sampling.splitAssign(
        s.read.parquet(pq(d, "documents")).select(col("doc_id")),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "split"),
      Some("""SELECT doc_id, CASE
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4)
                  < 'cccc' THEN 'train'
                WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 4)
                  < 'e666' THEN 'val'
                ELSE 'test' END AS split FROM documents""")),

    // ---- similarity search ----------------------------------------------
    Q("q_ann_brute",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
        val qv = emb.where(col("vec_id") === 0)
          .select(col("embedding")).first().getSeq[Float](0)
        graft.operators.Similarity.bruteForceTopK(
          emb, "vec_id", "embedding", qv, 10)
      },
      Some("""SELECT vec_id,
              ROUND(CAST(list_cosine_similarity(embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = 0))
                AS DOUBLE), 4) AS cosine
              FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10""")),

    // hard-negative mining (DPR-style): per anchor, the most-similar
    // vectors with a DIFFERENT label — exact scan with the label
    // inequality ahead of the window; oracle replays cosine + rank
    Q("q_hard_negatives",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
        val anchors = emb.where(col("vec_id") < 5)
          .select(col("vec_id").as("anchor_id"),
            col("embedding").as("av"), col("label").as("albl"))
        graft.operators.Similarity.hardNegatives(emb, anchors,
          "vec_id", "embedding", "label", "anchor_id", "av", "albl",
          k = 5)
      },
      Some("""SELECT anchor_id, vec_id, label, cosine, rank FROM (
                SELECT a.vec_id AS anchor_id, e.vec_id AS vec_id,
                  e.label,
                  ROUND(CAST(list_cosine_similarity(e.embedding,
                    a.embedding) AS DOUBLE), 4) AS cosine,
                  ROW_NUMBER() OVER (PARTITION BY a.vec_id
                    ORDER BY ROUND(CAST(list_cosine_similarity(
                      e.embedding, a.embedding) AS DOUBLE), 4) DESC,
                      e.vec_id) AS rank
                FROM embeddings e, embeddings a
                WHERE a.vec_id < 5 AND e.label <> a.label) t
              WHERE rank <= 5""")),

    Q("q_ann_topk_per_query",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
        val queries = emb.where(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("qv"))
        graft.operators.Similarity.topKPerQuery(emb, queries,
          "vec_id", "embedding", "query_id", "qv", 5)
      },
      Some("""SELECT query_id, vec_id, cosine, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                  ROUND(CAST(list_cosine_similarity(e.embedding, q.embedding)
                    AS DOUBLE), 4) AS cosine,
                  ROW_NUMBER() OVER (PARTITION BY q.vec_id
                    ORDER BY ROUND(CAST(list_cosine_similarity(e.embedding,
                      q.embedding) AS DOUBLE), 4) DESC, e.vec_id) AS rank
                FROM embeddings e, embeddings q WHERE q.vec_id < 3) t
              WHERE rank <= 5""")),

    // same planted-exactness move as q_ann_lsh below: an identical copy
    // is assigned to its source's IVF cell (same argmax centroid), scores
    // cosine 1.0, and ranks 2 behind the self-match — cell structure
    // stays index-specific, the planted slice is an exact expected set
    Q("q_ann_ivf",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .select(col("vec_id"), col("embedding"))
        val planted = emb.where(col("vec_id") < 3)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        val queries = emb.where(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        graft.operators.Similarity.ivfTopK(emb.unionByName(planted), queries,
          "vec_id", "embedding", "query_id", "qv",
          k = 5, nlist = 16, nprobe = 4)
          .where(col("vec_id") === col("query_id") + 100000L)
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS vec_id,
              CAST(1.0 AS DOUBLE) AS cosine, 2 AS "rank"
              FROM embeddings WHERE vec_id < 3""")),

    // IVF-PQ: the memory-bounded ANN scale path (codes-only candidate
    // scan + exact-cosine rerank). The quantized shortlist is
    // approximate, but the planted slice stays exact: an identical
    // copy shares its source's coarse cell AND its PQ codes
    // (identical residual → identical L2-argmin codes), ties its ADC
    // self-reconstruction score — far above unrelated candidates — so
    // both ride the shortlist into the rerank, where exact cosine
    // puts the copy at rank 2 behind the self-match
    Q("q_ann_ivfpq",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .select(col("vec_id"), col("embedding"))
        val planted = emb.where(col("vec_id") < 3)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        val queries = emb.where(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        graft.operators.Similarity.ivfpqTopK(emb.unionByName(planted),
          queries, "vec_id", "embedding", "query_id", "qv",
          k = 5, nlist = 16, nprobe = 4, m = 8, ksub = 16, shortlist = 64)
          .where(col("vec_id") === col("query_id") + 100000L)
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS vec_id,
              CAST(1.0 AS DOUBLE) AS cosine, 2 AS "rank"
              FROM embeddings WHERE vec_id < 3""")),

    // LSH buckets are approximate by design, but planted IDENTICAL
    // vectors make a slice of the output exact: a copy shares its
    // source's bucket (same sign bits) with cosine 1.0, so behind the
    // self-match (rank 1, smaller id) it lands at rank 2 — an expected
    // set that IS SQL-expressible, giving the bucket-join + rank path a
    // real oracle. (A natural vector would have to round to cosine
    // 1.0000 to break the rank — random embeddings sit far below.)
    Q("q_ann_lsh",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .select(col("vec_id"), col("embedding"))
        val planted = emb.where(col("vec_id") < 3)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        val queries = emb.where(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        graft.operators.Similarity.lshTopK(emb.unionByName(planted), queries,
          "vec_id", "embedding", "query_id", "qv", k = 5, planes = 6)
          .where(col("vec_id") === col("query_id") + 100000L)
      },
      Some("""SELECT vec_id AS query_id, vec_id + 100000 AS vec_id,
              CAST(1.0 AS DOUBLE) AS cosine, 2 AS "rank"
              FROM embeddings WHERE vec_id < 3""")),

    // ---- events / time-series -------------------------------------------
    Q("q_events_hourly",
      (s, d) => graft.streaming.EventsPipeline.hourlyRollup(events(s, d))
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:00:00")
          .as("hour_str"), col("event_type"), col("n_events"),
          col("sum_value"))
        .withColumn("sum_value", round(col("sum_value"), 4)),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00')
                AS hour_str, event_type, COUNT(*) AS n_events,
              ROUND(SUM(value), 4) AS sum_value
              FROM events GROUP BY 1, 2""")),

    // sliding-window rollup (10-min windows every 5 min): each event
    // lands in exactly two windows — the oracle materializes both via
    // the [0, 300]s offset unnest on the same 5-min grid arithmetic
    // Spark's window() uses; naive-timestamp math end to end (no tz)
    Q("q_events_sliding",
      (s, d) => graft.streaming.EventsPipeline
        .slidingUserActivity(events(s, d))
        .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_str"), col("user_id"), col("n"), col("v")),
      Some("""WITH e AS (SELECT user_id, value,
                make_timestamp(CAST((floor(epoch(ts) / 300) * 300 - off)
                  * 1000000 AS BIGINT)) AS win_start
                FROM events, unnest([0, 300]) AS t(off))
              SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_str,
                user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS v
              FROM e GROUP BY 1, 2""")),

    Q("q_events_type_stats",
      (s, d) => events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("user_id")).as("n_users"),
          round(avg(col("value")), 4).as("avg_value")),
      Some("""SELECT event_type, COUNT(*) AS n,
              COUNT(DISTINCT user_id) AS n_users,
              ROUND(AVG(value), 4) AS avg_value
              FROM events GROUP BY event_type""")),

    Q("q_sessionize",
      (s, d) => graft.streaming.EventsPipeline
        .sessionizeBatch(events(s, d), gapMinutes = 30)
        .select(col("user_id"), col("session_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
            .as("start_str"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss")
            .as("end_str"),
          col("n_events"), col("sum_value")),
      Some("""SELECT user_id, session_id,
                strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_str,
                strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_str,
                COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
              FROM (
                SELECT user_id, ts, value,
                  CAST(SUM(brk) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
                FROM (
                  SELECT user_id, event_id, ts, value,
                    CASE WHEN prev_ts IS NULL
                      OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                       - CAST(FLOOR(epoch(prev_ts)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS brk
                  FROM (SELECT user_id, event_id, ts, value,
                    LAG(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_ts FROM events) a
                ) b
              ) c GROUP BY user_id, session_id""")),

    // Spark's NATIVE session_window operator — same gap semantics as the
    // hand-rolled q_sessionize (split at gap >= 30min; the oracle's
    // break uses >= on full-precision timestamps, exactly
    // session_window's merge rule)
    Q("q_session_window",
      (s, d) => graft.streaming.EventsPipeline
        .sessionizeNative(events(s, d), gapMinutes = 30)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
            .as("start_str"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss")
            .as("end_str"),
          col("n_events"), col("sum_value")),
      Some("""SELECT user_id,
                strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_str,
                strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_str,
                COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
              FROM (
                SELECT user_id, ts, value,
                  CAST(SUM(brk) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS sid
                FROM (
                  SELECT user_id, event_id, ts, value,
                    CASE WHEN prev_ts IS NULL
                      OR ts >= prev_ts + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
                  FROM (SELECT user_id, event_id, ts, value,
                    LAG(ts) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) AS prev_ts FROM events) a
                ) b
              ) c GROUP BY user_id, sid""")),

    // exact interpolated percentiles: Spark `percentile` ≡ DuckDB
    // quantile_cont (both linear interpolation over the sorted set)
    Q("q_percentile",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .groupBy(col("l_returnflag"))
        // array form: ONE per-group value buffer + sort serves all three
        // percentiles (three scalar calls would keep three copies)
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
          .as("pcts"))
        .select(col("l_returnflag"),
          round(element_at(col("pcts"), 1), 4).as("p50"),
          round(element_at(col("pcts"), 2), 4).as("p90"),
          round(element_at(col("pcts"), 3), 4).as("p99")),
      Some("""SELECT l_returnflag,
              ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
              ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
              ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
              FROM lineitem GROUP BY l_returnflag""")),

    // bounded-error gate (not rows-only): the HLL++ estimate is
    // algorithm-specific, so the query computes approx AND exact in ONE
    // aggregation pass and emits a per-group verdict the oracle can
    // state as a constant — |approx − exact| ≤ 4·rsd·exact (rsd 0.05
    // default ⇒ 0.2). A silently broken sketch now turns the gate red.
    // The exact twin lives only in the gate; the production scale path
    // remains the sketch alone.
    Q("q_approx_count_distinct",
      (s, d) => s.read.parquet(pq(d, "lineitem"))
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("__approx"),
          count_distinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")) <=
            lit(0.2) * col("exact_parts")).as("within_bound")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
              CAST(1 AS BOOLEAN) AS within_bound
              FROM lineitem GROUP BY l_returnflag""")),

    // the scale path beside q_percentile: exact `percentile` shuffles
    // every group's full value set to one reducer buffer — fine at
    // thousands of values per group, not at 10^9; approx_percentile
    // keeps a bounded sketch per group and partial-aggregates map-side,
    // so memory is O(sketch) however large the group
    // bounded-error gate: KLL-sketch values are algorithm-specific, so
    // the query computes approx AND exact percentiles in ONE aggregation
    // and emits the EXACT values plus a verdict — each approx value
    // within 1% relative of its exact twin (accuracy 10000 ⇒ rank error
    // ≤ 1e-4·N; the value gap across ±6 ranks at sf0.01 is far inside
    // 1%). The oracle replays the exact quantiles and the constant TRUE.
    Q("q_approx_percentile",
      (s, d) => {
        def ok(i: Int) =
          abs(element_at(col("__ap"), i) - element_at(col("__ep"), i)) <=
            lit(0.01) * abs(element_at(col("__ep"), i))
        s.read.parquet(pq(d, "lineitem"))
          .groupBy(col("l_returnflag"))
          .agg(expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
            .as("__ap"),
            expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
              .as("__ep"))
          .select(col("l_returnflag"),
            round(element_at(col("__ep"), 1), 4).as("p50"),
            round(element_at(col("__ep"), 2), 4).as("p90"),
            round(element_at(col("__ep"), 3), 4).as("p99"),
            (ok(1) && ok(2) && ok(3)).as("within_bound"))
      },
      Some("""SELECT l_returnflag,
              ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
              ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
              ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
              CAST(1 AS BOOLEAN) AS within_bound
              FROM lineitem GROUP BY l_returnflag""")),

    // ---- multimodal plumbing (image/audio/video decode all REAL — JDK
    // ImageIO / javax.sound / MJPEG frame-split; see Multimodal
    // scaladoc). The decoded shape facts per media_id ARE
    // SQL-expressible: synthetic payload dims/rates are deterministic
    // functions of the id, and the Spark side reports what the codecs
    // DECODED, so the oracle verifies a real decode round-trip for all
    // three modalities
    Q("q_multimodal_features",
      (s, d) => {
        import graft.multimodal.Multimodal
        val feats = Multimodal.featurize(Multimodal.syntheticMedia(s, 300))
        feats.toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"))
      },
      Some("""SELECT i AS media_id,
              CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
              CASE WHEN i % 3 = 1 THEN 16000
                ELSE CAST(64 + (i % 4) * 32 AS INTEGER) END AS width,
              CASE WHEN i % 3 = 1 THEN 1600
                ELSE CAST(64 + (i % 3) * 32 AS INTEGER) END AS height
              FROM generate_series(0, 299) t(i)""")),

    // perceptual image dedup: DCT pHash per image (real decode) + the
    // SAME Manku blocking as text SimHash. The fixture plants 3
    // pixel-identical copies of each of 60 distinct contents under
    // different ids, so the pair set is pure id arithmetic —
    // MultimodalSpec pins the safety margin (distinct contents > 8
    // bits apart on this exact fixture, query threshold 4)
    Q("q_image_phash_dedup",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.imageNearDuplicates(
          Multimodal.syntheticImageCorpus(s, nContents = 60, copies = 3),
          maxHamming = 4)
      },
      Some("""SELECT a.i AS id_a, b.i AS id_b, 0 AS hamming
              FROM generate_series(0, 179) a(i)
                JOIN generate_series(0, 179) b(i)
                ON a.i < b.i AND a.i % 60 = b.i % 60""")),

    // video near-dup: middle-frame DCT pHash over real MJPEG decode +
    // the shared Manku blocking — completes the image/audio/video
    // near-dup family under the driver gate
    Q("q_video_fp_dedup",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.videoNearDuplicates(
          Multimodal.syntheticVideoCorpus(s, nContents = 30, copies = 3),
          maxHamming = 4)
      },
      Some("""SELECT a.i AS id_a, b.i AS id_b, 0 AS hamming
              FROM generate_series(0, 89) a(i)
                JOIN generate_series(0, 89) b(i)
                ON a.i < b.i AND a.i % 30 = b.i % 30""")),

    // incremental media dedup: a new batch's image pHashes probe a
    // PERSISTED fingerprint index (Dedup.simhashProbeIndex — the
    // incremental path shared by every 64-bit fingerprint family);
    // history is fingerprinted once, the batch joins an 8-byte column.
    // Batch = 10 exact copies of indexed contents + 10 novel contents
    // (distinct-content margins pinned by the MultimodalSpec fixture
    // guard), so the match set is pure id arithmetic
    Q("q_media_incremental_dedup",
      (s, d) => {
        import s.implicits._
        import graft.multimodal.Multimodal
        val index = Multimodal.imageHashes(
          Multimodal.syntheticImageCorpus(s, nContents = 40, copies = 1))
        val batch = Multimodal.syntheticImageCorpus(s, nContents = 50,
            copies = 1)
          .filter(r => r.media_id < 10 || r.media_id >= 40)
          .map(r => r.copy(media_id = r.media_id + 1000))
        graft.operators.Dedup.simhashProbeIndex(
          Multimodal.imageHashes(batch), index,
          "media_id", "phash", maxHamming = 4)
      },
      Some("""SELECT i + 1000 AS new_id, i AS seen_id, 0 AS hamming
              FROM generate_series(0, 9) t(i)""")),

    // audio near-dup: temporal zero-crossing fingerprint (real WAV
    // decode) + the shared Manku blocking — the audio member of the
    // pHash/SimHash family, same planted-content oracle construction
    Q("q_audio_fp_dedup",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.audioNearDuplicates(
          Multimodal.syntheticAudioCorpus(s, nContents = 40, copies = 3),
          maxHamming = 4)
      },
      Some("""SELECT a.i AS id_a, b.i AS id_b, 0 AS hamming
              FROM generate_series(0, 119) a(i)
                JOIN generate_series(0, 119) b(i)
                ON a.i < b.i AND a.i % 40 = b.i % 40""")),

    // WET (Common Crawl text-extract) record parsing: render each doc
    // as a WARC conversion record (version line, octet
    // Content-Length, blank-line terminator), parse it back with the
    // codegen'd regexp layer — the payload round-trips EXACTLY (one
    // terminator stripped, content newlines preserved). The oracle is
    // ANALYTIC — expected fields written directly from the source
    // columns, not by replaying the regex — so a parse bug cannot
    // cancel itself out. File-level record splitting (custom lineSep
    // across Hadoop splits) is WarcSpec-tier.
    Q("q_wet_parse",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        graft.sources.Warc.parseWet(docs.select(
          graft.sources.Warc.toWetRecord(
            concat(lit("https://example.com/doc/"),
              col("doc_id").cast("string")),
            lit("2024-01-01T00:00:00Z"), col("text")).as("record")))
      },
      Some("""SELECT 'https://example.com/doc/' ||
                CAST(doc_id AS VARCHAR) AS url,
              '2024-01-01T00:00:00Z' AS warc_date,
              CAST(strlen(text) AS BIGINT) AS content_length,
              text
              FROM documents""")),

    // curation-funnel accounting: survivor counts through each
    // cumulative quality-gate prefix in ONE aggregation pass (N
    // filter+count stages would be N corpus scans); every predicate
    // replays verbatim in the oracle
    Q("q_gate_funnel",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        graft.operators.Analytics.gateFunnel(docs, Seq(
          "nonempty" -> (length(trim(col("text"))) > 0),
          "min_tokens" ->
            (graft.functions.TextAnalysis.tokenCount(col("text")) >= 5),
          "is_en" -> (col("lang") === "en"),
          "alpha_half" ->
            (graft.functions.TextAnalysis.alphaRatio(col("text"))
              >= 0.5)))
      },
      Some("""WITH g AS (SELECT
                length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0 AS g1,
                CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
                  >= 5 AS g2,
                lang = 'en' AS g3,
                CASE WHEN length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^\p{L}]', '',
                    'g')) AS DOUBLE) / length(text) END >= 0.5 AS g4
                FROM documents)
              SELECT COUNT(*) AS rows_in,
                CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS nonempty,
                CAST(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS min_tokens,
                CAST(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS is_en,
                CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4
                  THEN 1 ELSE 0 END) AS BIGINT) AS alpha_half
              FROM g""")),

    // the crawl-curation capstone: WET records → parsed docs → PSL
    // registrable-domain keys → token-count quality gate → per-domain
    // cap → deterministic split, ONE declarative plan (the
    // q_pipeline_e2e pattern for the round-8 crawl surface). Every
    // stage reuses an operator already gated on its own; the oracle
    // composes their proven SQL replays, with the WET fields and PSL
    // domains written analytically
    Q("q_crawl_pipeline",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        val docs = s.read.parquet(pq(d, "documents"))
        val hosts = array(
          lit("www.shop.example.co.uk"), lit("news.example.co.uk"),
          lit("a.media-site.com"), lit("b.media-site.com"),
          lit("store.outlet.example.com.au"), lit("m.example.com.au"))
        val url = concat(lit("https://"),
          element_at(hosts, (col("doc_id") % 6 + 1).cast("int")),
          lit("/doc/"), col("doc_id").cast("string"))
        val recs = docs.select(graft.sources.Warc.toWetRecord(url,
          lit("2024-01-01T00:00:00Z"), col("text")).as("record"))
        val parsed = graft.sources.Warc.parseWet(recs)
        val keyed = parsed.withColumn("domain",
          graft.functions.Urls.urlDomain(col("url"), psl = true))
        val gated = keyed.where(
          graft.functions.TextAnalysis.tokenCount(col("text")) >= 5)
        val capped = graft.operators.Sampling.capPerGroup(
          gated, "domain", "url", cap = 40)
        graft.operators.Sampling.splitAssign(
          capped.select(col("url"), col("domain")), "url",
          Seq("train" -> 0.9, "val" -> 0.1), salt = "crawl")
      },
      Some("""WITH base AS (SELECT doc_id,
                'https://' || CASE CAST(doc_id % 6 AS INT)
                  WHEN 0 THEN 'www.shop.example.co.uk'
                  WHEN 1 THEN 'news.example.co.uk'
                  WHEN 2 THEN 'a.media-site.com'
                  WHEN 3 THEN 'b.media-site.com'
                  WHEN 4 THEN 'store.outlet.example.com.au'
                  ELSE 'm.example.com.au' END ||
                  '/doc/' || CAST(doc_id AS VARCHAR) AS url,
                CASE CAST(doc_id % 6 AS INT)
                  WHEN 0 THEN 'example.co.uk'
                  WHEN 1 THEN 'example.co.uk'
                  WHEN 2 THEN 'media-site.com'
                  WHEN 3 THEN 'media-site.com'
                  ELSE 'example.com.au' END AS domain,
                text
                FROM documents),
              gated AS (SELECT url, domain FROM base
                WHERE CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
                  ELSE len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) END
                  >= 5),
              capped AS (SELECT url, domain FROM (
                  SELECT url, domain, ROW_NUMBER() OVER (
                    PARTITION BY domain ORDER BY md5(url), url) AS rk
                  FROM gated)
                WHERE rk <= 40)
              SELECT url, domain, CASE
                WHEN substr(md5('crawl' || url), 1, 4) < 'e666'
                  THEN 'train'
                ELSE 'val' END AS split
              FROM capped""")),

    // salting must be semantically invisible: oracle is the plain join
    Q("q_skew_salted_join",
      (s, d) => graft.operators.Skew.saltedJoin(
        s.read.parquet(pq(d, "lineitem"))
          .select(col("l_orderkey"), col("l_quantity")),
        s.read.parquet(pq(d, "orders"))
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")),
        Seq("l_orderkey"), buckets = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 4).as("qty")),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
              ROUND(SUM(l_quantity), 4) AS qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderstatus""")),

    // single-pass column profiler (corpus QA): stats for all columns in
    // ONE aggregation, unpivoted with stack — not a scan per column
    Q("q_profile",
      (s, d) => graft.operators.Profile.profileNumeric(
        s.read.parquet(pq(d, "lineitem")),
        Seq("l_quantity", "l_extendedprice", "l_discount")),
      Some(profileExactOracleSql)),
    // the 100 TB profile path: HLL-sketch n_distinct (a few KB per
    // column, still one pass) replaces the exact-distinct Expand that
    // makes q_profile the slowest bench query. Bounded-error gate: the
    // sketch pass joins its exact twin (two 3-row frames, broadcast) and
    // the output carries the EXACT stats plus a per-column verdict —
    // |approx_ndv − exact_ndv| ≤ 0.2·exact_ndv (4·rsd at default 0.05) —
    // so a silently broken sketch goes red instead of rows-only-green.
    Q("q_profile_approx",
      (s, d) => {
        val li = s.read.parquet(pq(d, "lineitem"))
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val exact = graft.operators.Profile.profileNumeric(li, cols)
        val approx = graft.operators.Profile
          .profileNumeric(li, cols, exactDistinct = false)
          .select(col("column"), col("n_distinct").as("__approx_nd"))
        exact.join(broadcast(approx), Seq("column"))
          .select(col("column"), col("n_rows"), col("n_nonnull"),
            col("n_distinct"), col("min_v"), col("max_v"), col("avg_v"),
            (abs(col("__approx_nd") - col("n_distinct")) <=
              lit(0.2) * col("n_distinct")).as("ndv_within_bound"))
      },
      Some(
        s"""SELECT *, CAST(1 AS BOOLEAN) AS ndv_within_bound
            FROM ($profileExactOracleSql)""")),

    // salting must be semantically invisible: oracle is the plain GROUP BY
    Q("q_skew_salted",
      (s, d) => graft.operators.Skew.saltedAggregate(
        s.read.parquet(pq(d, "lineitem")), Seq("l_returnflag"), Seq(
          Seq("l_quantity", "sum", "qty_sum"),
          Seq("l_quantity", "count", "qty_n"),
          Seq("l_quantity", "mean", "qty_avg"),
          Seq("l_quantity", "min", "qty_min"),
          Seq("l_quantity", "max", "qty_max")), buckets = 8)
        .withColumn("qty_sum", round(col("qty_sum"), 4))
        .withColumn("qty_avg", round(col("qty_avg"), 4)),
      Some("""SELECT l_returnflag, ROUND(SUM(l_quantity), 4) AS qty_sum,
              COUNT(l_quantity) AS qty_n, ROUND(AVG(l_quantity), 4) AS qty_avg,
              MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max
              FROM lineitem GROUP BY l_returnflag""")),

    // Z-order clustered write + read-back: the multi-dimensional data-
    // skipping layout (Morton interleave of l_orderkey × l_partkey
    // bucket bits; row-group stats tight in BOTH dimensions, so the
    // rectangle filter prunes on both — ZOrderSpec asserts the actual
    // row-group pruning; here the driver checks the round-trip answer)
    Q("q_zorder_skipping",
      (s, d) => {
        s.read.parquet(zorderFixture(s, d))
          .where(col("l_orderkey") <= 6000 && col("l_partkey") <= 200)
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 4).as("qty"))
      },
      Some("""SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS qty
              FROM lineitem
              WHERE l_orderkey <= 6000 AND l_partkey <= 200""")),

    // manifest-level file skipping: the external per-file stats index
    // picks the files whose [min,max] can intersect the range BEFORE
    // any footer is opened; the exact filter then runs on the scanned
    // rows, so the answer ≡ the full-directory read the oracle runs
    // (StatsIndexSpec asserts the actual file-count reduction)
    // JSONL edge round-trip under hostility: the corpus written as
    // JSONL (Spark-escaped text incl. newlines/quotes/unicode), two
    // corrupt lines planted (broken JSON + type-mismatched field),
    // read back under the EXPLICIT schema with quarantine — valid
    // rows must reproduce the parquet corpus exactly (the sums/counts
    // pin it) and the corrupt accounting must be 2, not a failed scan
    // and not a silent drop. Fixture is content-keyed like the other
    // on-disk fixtures.
    Q("q_jsonl_roundtrip",
      (s, d) => {
        val src = new java.io.File(pq(d, "documents"))
        val root = contentKeyedFixture(src, "graft_jsonl") { dir =>
          committedData(new java.io.File(dir, "data")) &&
            new java.io.File(new java.io.File(dir, "data"),
              "corrupt-0.json").isFile
        } { tmp =>
          val data = new java.io.File(tmp, "data")
          graft.sources.Jsonl.write(s.read.parquet(src.getPath),
            data.toString)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(data.toString, "corrupt-0.json"),
            "{broken\n{\"doc_id\": \"notanumber\"}\n".getBytes("UTF-8"))
        }
        val schema = new org.apache.spark.sql.types.StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType)
          .add("text", org.apache.spark.sql.types.StringType)
          .add("lang", org.apache.spark.sql.types.StringType)
          .add("source", org.apache.spark.sql.types.StringType)
          .add("n_chars", org.apache.spark.sql.types.LongType)
        val c = col(graft.sources.Jsonl.CorruptCol)
        graft.sources.Jsonl.read(s,
            new java.io.File(root, "data").toString, schema)
          .agg(count(when(c.isNull, lit(1))).as("n_valid"),
            count(c).as("n_corrupt"),
            sum(when(c.isNull, col("n_chars"))).cast("long")
              .as("sum_chars"),
            sum(when(c.isNull, length(col("text")))).cast("long")
              .as("sum_text_len"),
            count_distinct(when(c.isNull, col("lang"))).as("n_langs"))
      },
      Some("""SELECT
              (SELECT COUNT(*) FROM documents) AS n_valid,
              CAST(2 AS BIGINT) AS n_corrupt,
              (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents)
                AS sum_chars,
              (SELECT CAST(SUM(length(text)) AS BIGINT) FROM documents)
                AS sum_text_len,
              (SELECT COUNT(DISTINCT lang) FROM documents)
                AS n_langs""")),

    Q("q_file_skipping",
      (s, d) => {
        val root = statsIndexFixture(s, d)
        graft.sources.StatsIndex.prunedRead(s,
            new java.io.File(root, "data").toString,
            new java.io.File(root, "index").toString,
            Seq(graft.sources.StatsIndex.Range("l_orderkey",
              1000L, 5000L)))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 4).as("qty"))
      },
      Some("""SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS qty
              FROM lineitem
              WHERE l_orderkey BETWEEN 1000 AND 5000""")),

    // outlink extraction: planted pages exercising double/single/un-
    // quoted hrefs, attribute order, and a non-anchor href that must
    // NOT extract; the oracle replays the identical RE2 chain
    Q("q_html_links",
      (s, d) => {
        val pages = array(
          lit("<p>x</p><a href=\"/a1\">one</a><a id=q href='/a2'>two" +
            "</a>"),
          lit("<a class=z href=/bare>b</a><link href=\"/css\">" +
            "<A HREF=\"/caps\">c</A>"),
          lit("<a data-href=\"/tracker\" href=\"/real\">t</a>" +
            "no other links"))
        val html = element_at(pages, (col("doc_id") % 3 + 1).cast("int"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 150)
          .select(col("doc_id"),
            posexplode_outer(
              graft.functions.TextAnalysis.extractLinks(html))
              .as(Seq("pos", "link")))
      },
      Some("""WITH h AS (SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN '<p>x</p><a href="/a1">one</a>' ||
                    '<a id=q href=''/a2''>two</a>'
                  WHEN 1 THEN '<a class=z href=/bare>b</a>' ||
                    '<link href="/css"><A HREF="/caps">c</A>'
                  ELSE '<a data-href="/tracker" href="/real">t</a>' ||
                    'no other links' END AS html
                FROM documents WHERE doc_id < 150),
              l AS (SELECT doc_id, list_transform(
                  regexp_extract_all(html,
                    '(?i)<a[\t\n\f\r ](?:[^>]*?[\t\n\f\r "''])?href[\t\n\f\r ]*=[\t\n\f\r ]*("[^"]*"|''[^'']*''|[^\t\n\f\r >"'']+)',
                    1),
                  v -> regexp_replace(v, '^["'']|["'']$', '', 'g'))
                  AS links
                FROM h),
              i AS (SELECT doc_id, links,
                  unnest(range(1, greatest(len(links), 1) + 1)) AS p
                FROM l)
              SELECT doc_id,
                CASE WHEN len(links) = 0 THEN NULL
                  ELSE CAST(p - 1 AS INT) END AS pos,
                links[p] AS link
              FROM i""")),

    // anchor (url, text) pairs: visible anchor text beside each link
    // target — inner tags stripped, whitespace collapsed; an anchor
    // never closed before EOF is dropped (no text to extract). The
    // oracle replays the identical two-group RE2 pattern and the
    // identical strip/collapse/trim chain, zipped by index.
    Q("q_html_anchors",
      (s, d) => {
        val pages = array(
          lit("<p>x</p><a href=\"/a1\">one</a>" +
            "<a id=q href='/a2'><b>two</b>\nwords</a>"),
          lit("<a class=z href=/bare>b</a><link href=\"/css\">" +
            "<A HREF=\"/caps\">Caps  Text</A>"),
          lit("<a href=\"/open\">never closed"))
        val html = element_at(pages, (col("doc_id") % 3 + 1).cast("int"))
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 150)
          .select(col("doc_id"),
            posexplode_outer(
              graft.functions.TextAnalysis.extractAnchors(html))
              .as(Seq("pos", "a")))
          .select(col("doc_id"), col("pos"),
            col("a.url").as("url"), col("a.anchor").as("anchor"))
      },
      Some("""WITH h AS (SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN '<p>x</p><a href="/a1">one</a>' ||
                    '<a id=q href=''/a2''><b>two</b>' || chr(10) ||
                    'words</a>'
                  WHEN 1 THEN '<a class=z href=/bare>b</a>' ||
                    '<link href="/css"><A HREF="/caps">Caps  Text</A>'
                  ELSE '<a href="/open">never closed' END AS html
                FROM documents WHERE doc_id < 150),
              l AS (SELECT doc_id,
                list_transform(regexp_extract_all(html,
                  '(?is)<a[\t\n\f\r ](?:[^>]*?[\t\n\f\r "''])?href[\t\n\f\r ]*=[\t\n\f\r ]*("[^"]*"|''[^'']*''|[^\t\n\f\r >"'']+)[^>]*>(.*?)</[aA][\t\n\f\r ]*>',
                  1),
                  v -> regexp_replace(v, '^["'']|["'']$', '', 'g'))
                  AS urls,
                list_transform(regexp_extract_all(html,
                  '(?is)<a[\t\n\f\r ](?:[^>]*?[\t\n\f\r "''])?href[\t\n\f\r ]*=[\t\n\f\r ]*("[^"]*"|''[^'']*''|[^\t\n\f\r >"'']+)[^>]*>(.*?)</[aA][\t\n\f\r ]*>',
                  2),
                  t -> trim(regexp_replace(regexp_replace(t,
                    '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')))
                  AS texts
                FROM h),
              i AS (SELECT doc_id, urls, texts,
                  unnest(range(1, greatest(len(urls), 1) + 1)) AS p
                FROM l)
              SELECT doc_id,
                CASE WHEN len(urls) = 0 THEN NULL
                  ELSE CAST(p - 1 AS INT) END AS pos,
                urls[p] AS url, texts[p] AS anchor
              FROM i""")),

    // crawl-frontier capstone: outlink extraction → registrable-domain
    // keys → robots politeness → seen-set anti-join → per-domain cap,
    // one declarative plan composing operators each gated on its own.
    // The oracle is the hand-derived candidate set (each exclusion —
    // seen, robots-blocked — is individually provable from the planted
    // data) with the cap's md5-order window replayed exactly
    Q("q_crawl_frontier",
      (s, d) => {
        val pages = array(
          lit("<a href=\"https://a.com/p1\">x</a>" +
            "<a href=\"https://a.com/private/z\">y</a>"),
          lit("<a href=\"https://sub.a.com/p2\">x</a>" +
            "<a href=\"https://b.com/q1\">y</a>"),
          lit("<a href=\"https://b.com/q2\">x</a>" +
            "<a href=\"https://b.com/q3\">y</a>"),
          lit("no links"))
        val html = element_at(pages, (col("doc_id") % 4 + 1).cast("int"))
        graft.plans.NativeFunctions.register(s)
        val links = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 120)
          .select(explode(
            graft.functions.TextAnalysis.extractLinks(html)).as("url"))
          .distinct()
          .select(col("url"),
            graft.functions.Urls.urlDomain(col("url"), psl = true)
              .as("domain"),
            graft.functions.Urls.urlPath(col("url")).as("path"))
        // robots keyed by registrable domain (per-host fetch rolled up
        // — the planted bodies carry one policy per site). Two rows
        // via when() so the domain column is non-foldable: a constant
        // literal would fold the rule parser's window partition spec
        // to empty (the single-partition shape PlanGuardSpec bans)
        val robots = s.range(2).toDF("i").select(
          when(col("i") === 0, "a.com").otherwise("b.com").as("rdomain"),
          when(col("i") === 0, "User-agent: *\nDisallow: /private\n")
            .otherwise("# crawl freely\n").as("body"))
        val rules = graft.functions.Robots.rules(robots,
          "rdomain", "body")
        val allowed = graft.functions.Robots.verdict(links, rules,
            "graftbot", "domain", "path")
          .where(col("robots_allowed"))
        val seen = s.range(1)
          .select(lit("https://a.com/p1").as("url"))
        val fresh = allowed.join(seen, Seq("url"), "left_anti")
        graft.operators.Sampling.capPerGroup(
            fresh.select(col("domain"), col("url")),
            "domain", "url", cap = 2, salt = "fr")
      },
      Some("""WITH cand AS (SELECT * FROM (VALUES
                ('a.com', 'https://sub.a.com/p2'),
                ('b.com', 'https://b.com/q1'),
                ('b.com', 'https://b.com/q2'),
                ('b.com', 'https://b.com/q3')) AS t(domain, url)),
              r AS (SELECT domain, url, ROW_NUMBER() OVER (
                  PARTITION BY domain
                  ORDER BY md5('fr' || url), url) AS rk FROM cand)
              SELECT domain, url FROM r WHERE rk <= 2""")),

    // PageRank over a synthesized link graph (node 11 is dst-only —
    // the dangling case). The ENTIRE iteration is integer arithmetic
    // on the 1e-12 grid with damping as the rational 17/20, so the
    // oracle replays three unrolled rounds of identical div
    // arithmetic — bit-exact, no FP anywhere until the final display
    // division
    Q("q_pagerank",
      (s, d) => {
        val edges = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 60)
          .select((col("doc_id") % 12).as("src"),
            ((col("doc_id") * 7 + 3) % 12).as("dst"))
          .where(col("src") =!= 11)
        graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3)
          .select(col("node"), round(col("rank"), 6).as("rank"))
      },
      Some("""WITH e AS (SELECT DISTINCT doc_id % 12 AS src,
                  (doc_id * 7 + 3) % 12 AS dst
                FROM documents
                WHERE doc_id < 60 AND doc_id % 12 <> 11),
              nodes AS (SELECT src AS node FROM e
                UNION SELECT dst FROM e),
              nn AS (SELECT COUNT(*) AS n FROM nodes),
              deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
              r0 AS (SELECT node,
                  (2 * 1000000000000 + n) // (2 * n) AS r
                FROM nodes, nn),
              dm1 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r0
                LEFT JOIN deg ON r0.node = deg.src WHERE d IS NULL),
              c1 AS (SELECT e.dst AS node,
                  SUM((2 * r + d) // (2 * d)) AS inp
                FROM r0 JOIN deg ON r0.node = deg.src
                  JOIN e ON e.src = r0.node
                GROUP BY e.dst),
              r1 AS (SELECT nodes.node,
                  (6 * 1000000000000 + 20 * n) // (40 * n)
                  + (34 * dm + 20 * n) // (40 * n)
                  + (34 * COALESCE(inp, 0) + 20) // 40 AS r
                FROM nodes CROSS JOIN nn CROSS JOIN dm1
                  LEFT JOIN c1 ON nodes.node = c1.node),
              dm2 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r1
                LEFT JOIN deg ON r1.node = deg.src WHERE d IS NULL),
              c2 AS (SELECT e.dst AS node,
                  SUM((2 * r + d) // (2 * d)) AS inp
                FROM r1 JOIN deg ON r1.node = deg.src
                  JOIN e ON e.src = r1.node
                GROUP BY e.dst),
              r2 AS (SELECT nodes.node,
                  (6 * 1000000000000 + 20 * n) // (40 * n)
                  + (34 * dm + 20 * n) // (40 * n)
                  + (34 * COALESCE(inp, 0) + 20) // 40 AS r
                FROM nodes CROSS JOIN nn CROSS JOIN dm2
                  LEFT JOIN c2 ON nodes.node = c2.node),
              dm3 AS (SELECT COALESCE(SUM(r), 0) AS dm FROM r2
                LEFT JOIN deg ON r2.node = deg.src WHERE d IS NULL),
              c3 AS (SELECT e.dst AS node,
                  SUM((2 * r + d) // (2 * d)) AS inp
                FROM r2 JOIN deg ON r2.node = deg.src
                  JOIN e ON e.src = r2.node
                GROUP BY e.dst),
              r3 AS (SELECT nodes.node,
                  (6 * 1000000000000 + 20 * n) // (40 * n)
                  + (34 * dm + 20 * n) // (40 * n)
                  + (34 * COALESCE(inp, 0) + 20) // 40 AS r
                FROM nodes CROSS JOIN nn CROSS JOIN dm3
                  LEFT JOIN c3 ON nodes.node = c3.node)
              SELECT node,
                ROUND(CAST(r AS DOUBLE) / 1000000000000, 6) AS rank
              FROM r3""")),

    // robots.txt politeness gate over planted bodies + URL cases: the
    // Spark side runs the FULL parse (groups, comments, specific-group
    // precedence) then the longest-match verdict; the oracle replays
    // the matching math against the hand-derived effective rule table
    // for the agent — if the parse produced different rules, the
    // verdicts would diverge, so both layers are pinned
    Q("q_robots_filter",
      (s, d) => {
        val robotsA = "User-agent: *\nDisallow: /private\n" +
          "Allow: /private/ok # curated\nDisallow: /tmp*\n\n" +
          "User-agent: graftbot\nDisallow: /only-star-blocked\n"
        val robotsB = "User-agent: graftbot\nUser-agent: otherbot\n" +
          "Disallow: /\nAllow: /pub\n"
        val robotsD = "User-agent: *\nDisallow: /dl/*.zip\n" +
          "Allow: /dl/free\n"
        val robots = s.range(3).toDF("i").select(
          when(col("i") === 0, "a.com").when(col("i") === 1, "b.com")
            .otherwise("d.com").as("domain"),
          when(col("i") === 0, robotsA).when(col("i") === 1, robotsB)
            .otherwise(robotsD).as("body"))
        val ruleTable = graft.functions.Robots.rules(robots,
          "domain", "body")
        val domains = array(lit("a.com"), lit("a.com"), lit("a.com"),
          lit("b.com"), lit("b.com"), lit("c.com"), lit("b.com"),
          lit("a.com"), lit("d.com"), lit("d.com"))
        val paths = array(lit("/private/ok/x"),
          lit("/only-star-blocked/z"), lit("/tmp/y"), lit("/pub/doc"),
          lit("/secret"), lit("/anything"), lit("/"), lit("/private"),
          lit("/dl/stuff.zip"), lit("/dl/readme.txt"))
        val urls = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 200)
          .select(col("doc_id"),
            element_at(domains, (col("doc_id") % 10 + 1).cast("int"))
              .as("domain"),
            element_at(paths, (col("doc_id") % 10 + 1).cast("int"))
              .as("path"))
        graft.functions.Robots.verdict(urls, ruleTable, "graftbot",
          "domain", "path")
      },
      Some("""WITH rules AS (SELECT * FROM (VALUES
                ('a.com', FALSE, '/only-star-blocked', FALSE, NULL, 18),
                ('b.com', FALSE, '/', FALSE, NULL, 1),
                ('b.com', TRUE, '/pub', FALSE, NULL, 4),
                ('d.com', FALSE, NULL, TRUE, '^/dl/.*\.zip', 9),
                ('d.com', TRUE, '/dl/free', FALSE, NULL, 8))
                AS r(domain, allow, prefix, wildcard, pattern,
                  priority)),
              urls AS (SELECT doc_id,
                CASE CAST(doc_id % 10 AS INT)
                  WHEN 0 THEN 'a.com' WHEN 1 THEN 'a.com'
                  WHEN 2 THEN 'a.com' WHEN 3 THEN 'b.com'
                  WHEN 4 THEN 'b.com' WHEN 5 THEN 'c.com'
                  WHEN 6 THEN 'b.com' WHEN 7 THEN 'a.com'
                  ELSE 'd.com' END AS domain,
                CASE CAST(doc_id % 10 AS INT)
                  WHEN 0 THEN '/private/ok/x'
                  WHEN 1 THEN '/only-star-blocked/z'
                  WHEN 2 THEN '/tmp/y' WHEN 3 THEN '/pub/doc'
                  WHEN 4 THEN '/secret' WHEN 5 THEN '/anything'
                  WHEN 6 THEN '/' WHEN 7 THEN '/private'
                  WHEN 8 THEN '/dl/stuff.zip'
                  ELSE '/dl/readme.txt' END AS path
                FROM documents WHERE doc_id < 200),
              ranked AS (SELECT u.doc_id, u.domain, u.path, r.allow,
                  ROW_NUMBER() OVER (PARTITION BY u.doc_id
                    ORDER BY r.priority DESC NULLS LAST,
                      r.allow DESC) AS rk
                FROM urls u LEFT JOIN rules r
                  ON u.domain = r.domain
                    AND CASE WHEN r.wildcard
                      THEN regexp_matches(u.path, r.pattern)
                      ELSE starts_with(u.path, r.prefix) END)
              SELECT doc_id, domain, path,
                COALESCE(allow, TRUE) AS robots_allowed
              FROM ranked WHERE rk = 1""")),

    // effective Crawl-delay per domain — the frontier scheduler's
    // rate limit beside the allow/deny verdict. The fixture covers
    // the precedence matrix: agent delay shades '*' (a.com), '*'
    // fallback (b.com), unparsable agent value falls back rather
    // than meaning "no limit" (c.com has no '*' → absent), and
    // multiple delays collapse to the minimum (d.com). The oracle is
    // the hand-derived ground truth of those semantics.
    Q("q_crawl_delay",
      (s, d) => {
        val bodyA = "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n" +
          "User-agent: graftbot\nCrawl-delay: 2.5\n"
        val bodyB = "User-agent: *\nCrawl-delay: 5\n"
        val bodyC = "User-agent: graftbot\nCrawl-delay: oops\n"
        val bodyD = "User-agent: graftbot\nDisallow: /q\n" +
          "Crawl-delay: 7\nCrawl-delay: 3\n"
        val robots = s.range(4).toDF("i").select(
          element_at(array(lit("a.com"), lit("b.com"), lit("c.com"),
            lit("d.com")), (col("i") + 1).cast("int")).as("domain"),
          element_at(array(lit(bodyA), lit(bodyB), lit(bodyC),
            lit(bodyD)), (col("i") + 1).cast("int")).as("body"))
        graft.functions.Robots.crawlDelays(robots, "domain", "body",
          "GraftBot")
      },
      Some("""SELECT * FROM (VALUES
              ('a.com', CAST(2.5 AS DOUBLE)),
              ('b.com', CAST(5 AS DOUBLE)),
              ('d.com', CAST(3 AS DOUBLE)))
              t(domain, crawl_delay)""")),

    // Sitemap records are domain-global (valid anywhere in the file,
    // never part of a group): extraction is a field filter with the
    // URL's case preserved; duplicates collapse
    Q("q_sitemaps",
      (s, d) => {
        val bodyA = "Sitemap: https://a.com/sm1.xml\nUser-agent: *\n" +
          "Disallow: /x\nSitemap: https://a.com/sm2.xml\n"
        val bodyB = "User-agent: *\nCrawl-delay: 5\n"
        val bodyD = "Sitemap: https://d.com/SM.xml\n" +
          "Sitemap: https://d.com/SM.xml\n"
        val robots = s.range(3).toDF("i").select(
          element_at(array(lit("a.com"), lit("b.com"), lit("d.com")),
            (col("i") + 1).cast("int")).as("domain"),
          element_at(array(lit(bodyA), lit(bodyB), lit(bodyD)),
            (col("i") + 1).cast("int")).as("body"))
        graft.functions.Robots.sitemaps(robots, "domain", "body")
      },
      Some("""SELECT * FROM (VALUES
              ('a.com', 'https://a.com/sm1.xml'),
              ('a.com', 'https://a.com/sm2.xml'),
              ('d.com', 'https://d.com/SM.xml'))
              t(domain, sitemap)""")),

    // politeness scheduling capstone: corpus-scale URLs get per-domain
    // fetch slots under the delays the robots bodies declare (a.com
    // 2.5s via the agent group, b.com 5s via '*', c.com none →
    // default 1s). The md5 fetch order and the slot arithmetic are
    // both engine-portable, so the oracle replays the whole schedule.
    Q("q_frontier_schedule",
      (s, d) => {
        val bodyA = "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n\n" +
          "User-agent: graftbot\nCrawl-delay: 2.5\n"
        val bodyB = "User-agent: *\nCrawl-delay: 5\n"
        val robots = s.range(2).toDF("i").select(
          element_at(array(lit("a.com"), lit("b.com")),
            (col("i") + 1).cast("int")).as("domain"),
          element_at(array(lit(bodyA), lit(bodyB)),
            (col("i") + 1).cast("int")).as("body"))
        val delays = graft.functions.Robots.crawlDelays(robots,
          "domain", "body", "graftbot")
        val urls = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 200)
          .select(col("doc_id"),
            element_at(array(lit("a.com"), lit("b.com"), lit("c.com")),
              (col("doc_id") % 3 + 1).cast("int")).as("domain"))
          .withColumn("url", concat(lit("https://"), col("domain"),
            lit("/p"), col("doc_id").cast("string")))
        graft.functions.Robots.scheduleFrontier(urls, delays,
            "domain", "url")
          .select(col("doc_id"), col("domain"), col("url"),
            col("fetch_seq").cast("long").as("fetch_seq"),
            round(col("fetch_offset_s"), 4).as("fetch_offset_s"))
      },
      Some("""WITH urls AS (SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'a.com'
                  WHEN 1 THEN 'b.com' ELSE 'c.com' END AS domain
                FROM documents WHERE doc_id < 200),
              u AS (SELECT doc_id, domain,
                'https://' || domain || '/p' || CAST(doc_id AS VARCHAR)
                  AS url FROM urls),
              dl AS (SELECT * FROM (VALUES
                ('a.com', CAST(2.5 AS DOUBLE)),
                ('b.com', CAST(5 AS DOUBLE))) t(domain, delay)),
              seq AS (SELECT doc_id, u.domain, url,
                ROW_NUMBER() OVER (PARTITION BY u.domain
                  ORDER BY md5(url), url) - 1 AS fetch_seq,
                COALESCE(dl.delay, 1.0) AS delay
                FROM u LEFT JOIN dl ON u.domain = dl.domain)
              SELECT doc_id, domain, url,
                CAST(fetch_seq AS BIGINT) AS fetch_seq,
                ROUND(fetch_seq * delay, 4) AS fetch_offset_s
              FROM seq""")),

    // per-label embedding centroids by mean pooling (the chunk→doc /
    // class-centroid aggregation); the digest projection keeps the
    // compare on scalars (the q_transport_embeddings pattern) — dim,
    // first component, and component-sum pin the whole vector
    Q("q_emb_pool",
      (s, d) => {
        val pooled = graft.operators.Embeddings.meanPool(
          s.read.parquet(pq(d, "embeddings")), "label", "embedding")
        pooled.select(col("label"), col("n"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1), 4).as("e0"),
          round(graft.operators.Embeddings.l2Norm(col("embedding")), 4)
            .as("nrm"))
      },
      Some("""WITH idx AS (SELECT label, embedding,
                  unnest(range(1, len(embedding) + 1)) AS pos
                FROM embeddings),
              e AS (SELECT label, pos,
                  CAST(embedding[pos] AS DOUBLE) AS x FROM idx),
              m AS (SELECT label, pos, AVG(x) AS m, COUNT(*) AS cnt
                FROM e GROUP BY label, pos)
              SELECT label, MAX(cnt) AS n, COUNT(*) AS dim,
                ROUND(MAX(CASE WHEN pos = 1 THEN m END), 4) AS e0,
                ROUND(SQRT(SUM(m * m)), 4) AS nrm
              FROM m GROUP BY label""")),

    // needle-in-haystack point lookup: the per-file Bloom sketch in
    // the manifest (not the min/max interval) decides which files can
    // contain the key; no false negatives, exact filter on top —
    // answer ≡ the plain equality read
    Q("q_point_lookup",
      (s, d) => {
        val root = statsIndexFixture(s, d)
        graft.sources.StatsIndex.prunedRead(s,
            new java.io.File(root, "data").toString,
            new java.io.File(root, "index").toString,
            preds = Nil,
            points = Seq(graft.sources.StatsIndex.Point("l_orderkey",
              1000L)))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 4).as("qty"))
      },
      Some("""SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), 4) AS qty
              FROM lineitem WHERE l_orderkey = 1000""")),

    // ---- transport round-trip (S7/S8) ------------------------------------
    Q("q_transport_roundtrip",
      (s, d) => {
        val agg = AggregateEngine.aggregatePq(s, pq(d, "lineitem"),
          Seq("l_returnflag", "l_linestatus"),
          Seq(Seq("l_extendedprice", "sum", "price_sum"),
            Seq("l_orderkey", "count", "n")))
          .withColumn("price_sum", round(col("price_sum"), 4))
        graft.sources.Transport.deserializeArrowBytes(s,
          graft.sources.Transport.serializeArrowBytes(agg))
      },
      Some("""SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_extendedprice), 4) AS price_sum,
              COUNT(l_orderkey) AS n
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // array columns through the IPC edge (reference transport is
    // generic-table; the digest projection after the round-trip keeps
    // the oracle comparison on scalar columns)
    Q("q_transport_embeddings",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .where(col("vec_id") < 20)
          .select(col("vec_id"), col("embedding"))
        val back = graft.sources.Transport.deserializeArrowBytes(s,
          graft.sources.Transport.serializeArrowBytes(emb))
        back.select(col("vec_id"), size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("e0"))
      },
      Some("""SELECT vec_id, len(embedding) AS dim,
              ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e0
              FROM embeddings WHERE vec_id < 20""")))

  // =========================================================================
  // Round-3 extensions: substring-span dedup, C4 quality filter, fuzzy
  // join, embedding transforms, event analytics, unpivot
  // =========================================================================

  private val round3: Seq[Q] = Seq(
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
  // Round-6 extensions: semantic dedup, span cuts, persisted-state
  // admission, 128-bit span keys, bucket-drop accounting
  // =========================================================================

  /** Shared planting for the span-cut queries: every doc gets the first
    * 12 words of donor doc (doc_id % 10) appended — identical to
    * q_dup_spans, so the three span queries exercise one corpus shape. */
  private def spanAugmented(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextAnalysis
    val docs = s.read.parquet(pq(d, "documents"))
      .repartition(s.sparkContext.defaultParallelism)
    val donors = docs.where(col("doc_id") < 10)
      .select(col("doc_id").as("__don_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 12))
          .as("__don_txt"))
    docs.select(col("doc_id"), col("text"))
      .join(broadcast(donors), col("doc_id") % 10 === col("__don_id"))
      .select(col("doc_id"),
        concat(col("text"), lit(" "), col("__don_txt")).as("text"))
  }

  /** DuckDB replay of [[spanAugmented]] + per-doc span statistics —
    * shared verbatim by q_dup_spans (64-bit keys) and q_dup_spans_128:
    * the two modes are the same semantics by contract, so they get the
    * same oracle STRING, not a copy. A `def` (not val): referenced
    * from the round-3 section, which initializes earlier in the
    * object. */
  private def spanStatsOracle: String =
    """WITH don AS (SELECT doc_id AS don_id, array_to_string(
         list_slice(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'), 1, 12),
         ' ') AS don_txt
         FROM documents WHERE doc_id < 10),
       aug AS (SELECT d.doc_id, d.text || ' ' ||
           don.don_txt AS text
         FROM documents d JOIN don ON d.doc_id % 10 = don.don_id),
       t AS (SELECT doc_id,
         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM aug),
       e AS (SELECT doc_id, unnest(list_transform(
           generate_series(0, greatest(len(toks) - 10, 0)),
           i -> array_to_string(list_slice(toks, i+1, i+10), ' ')))
           AS win FROM t),
       c AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY win) AS occ
         FROM e)
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_spans,
         ROUND(CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END)
           AS DOUBLE) / COUNT(*), 4) AS dup_span_frac
       FROM c GROUP BY doc_id"""

  /** DuckDB replay of [[spanAugmented]] + window occurrence counts +
    * interval merge — the shared oracle prefix for the span-cut pair. */
  private val spanCutOracleCtes =
    """WITH don AS (SELECT doc_id AS don_id, array_to_string(
         list_slice(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'), 1, 12), ' ')
           AS don_txt
         FROM documents WHERE doc_id < 10),
       aug AS (SELECT d.doc_id, d.text || ' ' || don.don_txt AS text
         FROM documents d JOIN don ON d.doc_id % 10 = don.don_id),
       t AS (SELECT doc_id,
         string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM aug),
       w0 AS (SELECT doc_id, toks, unnest(generate_series(0,
           greatest(len(toks) - 10, 0))) AS i FROM t),
       w AS (SELECT doc_id, i, least(i + 10, len(toks)) AS e,
           array_to_string(list_slice(toks, i + 1, i + 10), ' ') AS win
         FROM w0),
       c AS (SELECT doc_id, i, e, COUNT(*) OVER (PARTITION BY win) AS occ
         FROM w),
       dup AS (SELECT doc_id, i, e FROM c WHERE occ >= 2),
       f AS (SELECT doc_id, i, e, CASE WHEN i > COALESCE(MAX(e) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
           THEN 1 ELSE 0 END AS ng FROM dup),
       g AS (SELECT doc_id, i, e, SUM(ng) OVER (PARTITION BY doc_id
           ORDER BY i ROWS UNBOUNDED PRECEDING) AS grp FROM f),
       cuts AS (SELECT doc_id, MIN(i) AS s, MAX(e) AS e
         FROM g GROUP BY doc_id, grp)"""

  /** Lazily-materialized admission-state fixture (band index parquet +
    * Bloom sketch bytes) under java.io.tmpdir — built on first use,
    * REUSED by every later run in any process, so
    * q_ingest_admission_state's steady-state bench time measures
    * admission against prebuilt state (the production shape: state is
    * maintained incrementally beside the corpus, never rebuilt per
    * batch — `IngestPipeline.nearDupIngestIncremental` is the writer).
    * Keyed by the source table's CONTENT identity (path + length +
    * mtime), not just its path: regenerated testdata at the same path
    * must invalidate the fixture, or the query would admit against a
    * stale history while the oracle replays the current data. Build
    * lands in a temp dir, then one atomic rename publishes it — a
    * crashed build leaves only unreferenced garbage, never a
    * half-state the next run would trust; a PARTIALLY deleted fixture
    * (age-based tmp cleaners remove individual files) fails the
    * completeness probe and is rebuilt rather than read. */
  /** The content-keyed on-disk fixture discipline, held ONCE for every
    * registry fixture (admission state, z-ordered table):
    *  - keyed by the source table's CONTENT identity (path + length +
    *    mtime), so regenerated testdata at the same path invalidates
    *    the fixture rather than being served stale state;
    *  - `complete` probes for real data, not just the directory —
    *    age-based tmp cleaners delete oldest-first, so part files
    *    (written before _SUCCESS) can vanish while markers survive; a
    *    partially deleted fixture is rebuilt, not read;
    *  - build lands in a temp dir, ONE atomic rename publishes it — a
    *    crashed build leaves unreferenced garbage, never half-state a
    *    later run would trust; losing the rename race to a concurrent
    *    builder is fine, the published copy wins;
    *  - self-heal delete may race a concurrent healer mid-walk —
    *    both fall through to the rebuild. */
  /** Shared CDC change set over orders: base snapshot (version 0) plus
    * updates / tombstones / inserts (version 1) — exact-valued payloads
    * (a cast key), so no FP arithmetic rides the gate. Used by
    * `q_merge_upsert` (one-shot merge) and `q_cdc_snapshot` (the same
    * merge through the epoch/bucket snapshot layout) so both share one
    * oracle shape. */
  private def ordersChangeSet(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val orders = s.read.parquet(pq(d, "orders"))
    val base = orders.select(col("o_orderkey"), col("o_totalprice"),
      col("o_orderstatus"), lit(0L).as("version"),
      lit(false).as("is_delete"))
    val updates = orders.where(col("o_orderkey") % 10 < 3)
      .select(col("o_orderkey"),
        col("o_orderkey").cast("double").as("o_totalprice"),
        lit("U").as("o_orderstatus"), lit(1L).as("version"),
        lit(false).as("is_delete"))
      .unionAll(orders.where(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey"),
          lit(null).cast("double").as("o_totalprice"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(1L).as("version"), lit(true).as("is_delete")))
      .unionAll(orders.where(col("o_orderkey") % 10 === 4)
        .select((-col("o_orderkey")).as("o_orderkey"),
          col("o_orderkey").cast("double").as("o_totalprice"),
          lit("N").as("o_orderstatus"), lit(1L).as("version"),
          lit(false).as("is_delete")))
    (base, updates)
  }

  /** Lazily-materialized CDC snapshot fixture: the [[ordersChangeSet]]
    * applied as two epochs through [[graft.streaming.CdcPipeline]]'s
    * log-structured layout — built once per testdata identity, so the
    * steady-state bench time measures the snapshot READ (latest
    * committed epoch per bucket), the shape a downstream consumer
    * pays. */
  private def cdcSnapshotFixture(s: SparkSession, d: String): String = {
    val root = contentKeyedFixture(new java.io.File(d, "orders.parquet"),
      "graft_cdc_snapshot") { r =>
      new java.io.File(r, "snap/epoch=0/_SUCCESS").isFile &&
        new java.io.File(r, "snap/epoch=1/_SUCCESS").isFile
    } { tmp =>
      val snap = new java.io.File(tmp, "snap").toString
      val (base, updates) = ordersChangeSet(s, d)
      graft.streaming.CdcPipeline.applyBatch(s, base, snap,
        Seq("o_orderkey"), "version", "is_delete", numBuckets = 16,
        epoch = 0L)
      graft.streaming.CdcPipeline.applyBatch(s, updates, snap,
        Seq("o_orderkey"), "version", "is_delete", numBuckets = 16,
        epoch = 1L)
    }
    new java.io.File(root, "snap").toString
  }

  /** [[cdcSnapshotFixture]]'s end-of-life twin: the same two epochs,
    * then a FULL compaction, then the old epoch dirs deleted — the
    * retention flow the log-structured layout exists for. The staged
    * rename-commit (data + tombstoned-empty-bucket sentinels + bucket
    * marker published atomically) is what makes the deletion safe: the
    * compacted epoch alone must serve every bucket, including the
    * empty-now ones, or deleted keys would resurrect. Final state is
    * identical to the uncompacted snapshot, so the oracle is shared. */
  private def cdcCompactedFixture(s: SparkSession, d: String): String = {
    val root = contentKeyedFixture(new java.io.File(d, "orders.parquet"),
      "graft_cdc_compacted") { r =>
      new java.io.File(r, "snap/epoch=2/_SUCCESS").isFile &&
        !new java.io.File(r, "snap/epoch=0").exists() &&
        !new java.io.File(r, "snap/epoch=1").exists()
    } { tmp =>
      val snap = new java.io.File(tmp, "snap").toString
      val (base, updates) = ordersChangeSet(s, d)
      graft.streaming.CdcPipeline.applyBatch(s, base, snap,
        Seq("o_orderkey"), "version", "is_delete", numBuckets = 16,
        epoch = 0L)
      graft.streaming.CdcPipeline.applyBatch(s, updates, snap,
        Seq("o_orderkey"), "version", "is_delete", numBuckets = 16,
        epoch = 1L)
      val next = graft.streaming.CdcPipeline.compactSnapshot(s, snap,
        Seq("o_orderkey"), numBuckets = 16)
      require(next == 2L, s"expected compaction epoch 2, got $next")
      Seq(0L, 1L).foreach { e =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(s"$snap/epoch=$e"))
      }
    }
    new java.io.File(root, "snap").toString
  }

  private def contentKeyedFixture(src: java.io.File, name: String)
      (complete: java.io.File => Boolean)
      (build: java.io.File => Unit): java.io.File = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getPath}|${src.length}|${src.lastModified}"
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val root = new java.io.File(
      sys.props("java.io.tmpdir"), s"${name}_$key")
    def ok: Boolean = root.exists() && complete(root)
    if (root.exists() && !ok)
      try org.apache.commons.io.FileUtils.deleteDirectory(root)
      catch { case scala.util.control.NonFatal(_) => () }
    if (!ok) {
      val tmp = new java.io.File(root.getParentFile,
        root.getName + ".build" + System.nanoTime())
      build(tmp)
      if (!tmp.renameTo(root))
        org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }
    root
  }

  /** Commit marker + at least one visible data file under `dir`. */
  private def committedData(dir: java.io.File): Boolean =
    new java.io.File(dir, "_SUCCESS").isFile &&
      Option(dir.listFiles).exists(_.exists(f =>
        f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")))

  /** Lazily-materialized admission-state fixture (band index parquet +
    * Bloom sketch bytes) via [[contentKeyedFixture]] — built on first
    * use, REUSED by every later run in any process, so
    * q_ingest_admission_state's steady-state bench time measures
    * admission against prebuilt state (the production shape: state is
    * maintained incrementally beside the corpus, never rebuilt per
    * batch — `IngestPipeline.nearDupIngestIncremental` is the writer). */
  private def admissionState(s: SparkSession, d: String,
                             history: DataFrame): (Array[Byte], DataFrame) = {
    val root = contentKeyedFixture(new java.io.File(d, "documents.parquet"),
      "graft_admission_state") { r =>
      new java.io.File(r, "sketch").isFile &&
        committedData(new java.io.File(r, "bands"))
    } { tmp =>
      graft.operators.Dedup.minhashBands(history, "doc_id", "text")
        .withColumnRenamed("doc_id", "seen_id")
        .write.mode("overwrite")
        .parquet(new java.io.File(tmp, "bands").toString)
      val sketch = graft.operators.Dedup.buildSeenSketch(history, "text",
        expectedItems = 10000L, numBits = 1L << 17).get
      java.nio.file.Files.write(
        new java.io.File(tmp, "sketch").toPath, sketch)
    }
    (java.nio.file.Files.readAllBytes(
      new java.io.File(root, "sketch").toPath),
      s.read.parquet(new java.io.File(root, "bands").toString))
  }

  /** Lazily-materialized Z-ordered lineitem fixture via
    * [[contentKeyedFixture]]: built once per testdata identity and
    * REUSED — earlier revisions rebuilt the clustered copy into a
    * fresh never-deleted temp dir on EVERY query construction (each
    * bench warmup/run, each Verify, each PlanGuard plan), leaking a
    * full table copy per call. The steady-state bench number now
    * measures the read-side skipping, which is the operator's claim —
    * the one-time write cost is the build, exercised by ZOrderSpec. */
  private def zorderFixture(s: SparkSession, d: String): String =
    contentKeyedFixture(new java.io.File(d, "lineitem.parquet"),
      "graft_zorder")(committedData) { tmp =>
      val li = s.read.parquet(pq(d, "lineitem"))
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      graft.sources.ZOrder.writeZOrdered(li, tmp.toString,
        Seq("l_orderkey", "l_partkey"), bits = 10, numFiles = 16)
    }.toString

  /** Range-clustered lineitem copy (16 files tight in l_orderkey) plus
    * its [[graft.sources.StatsIndex]] manifest, built once per source
    * content — the bench then measures the index-consulted read. */
  private def statsIndexFixture(s: SparkSession, d: String): java.io.File =
    contentKeyedFixture(new java.io.File(d, "lineitem.parquet"),
      "graft_stats_index_v3") { r =>
      new java.io.File(r, "data/_SUCCESS").isFile &&
        new java.io.File(r, "index/_SUCCESS").isFile
    } { tmp =>
      val li = s.read.parquet(pq(d, "lineitem"))
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      val data = new java.io.File(tmp, "data").toString
      li.repartitionByRange(16, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(data)
      graft.sources.StatsIndex.writeIndex(s, data,
        new java.io.File(tmp, "index").toString, Seq("l_orderkey"),
        bloomCols = Seq("l_orderkey"))
    }

  private val round6: Seq[Q] = Seq(
    // SemDeDup (Abbas et al. 2023): IVF cells → within-cell cosine pairs
    // → connected components → survivor selection. Planted identical
    // embeddings (vec_id < 30 copied at +100000/+200000) MUST collapse
    // to their source id: an identical copy lands in the same
    // (deterministic) cell, its cosine is exactly 1.0, and min-id
    // survivor selection keeps the source — an exact expected set, the
    // q_dedup_survivors pattern for the semantic pipeline. The pmod
    // filter keeps the planted universe; natural embeddings are random,
    // so no natural pair reaches cosine 0.999.
    Q("q_dedup_semantic",
      (s, d) => {
        // the < 100000 guard pins the planting-offset assumption: a
        // future sf whose embeddings table reached 100000 natural rows
        // would otherwise leak naturals through the pmod survivor
        // filter and break the oracle silently
        val emb = s.read.parquet(pq(d, "embeddings"))
          .where(col("vec_id") < 100000L)
          .select(col("vec_id"), col("embedding"))
        val fam = emb.where(col("vec_id") < 30)
        val all = emb
          .unionByName(fam.select((col("vec_id") + 100000L).as("vec_id"),
            col("embedding")))
          .unionByName(fam.select((col("vec_id") + 200000L).as("vec_id"),
            col("embedding")))
        graft.operators.Dedup.semanticDedup(all, "vec_id", "embedding",
          nlist = 32, minCosine = 0.999)
          .where(pmod(col("vec_id"), lit(100000L)) < 30)
          .select(col("vec_id"))
      },
      Some("""SELECT vec_id FROM embeddings WHERE vec_id < 30""")),

    // span CUT extraction (Lee et al. 2022 — the corpus operation, not
    // just the statistic): maximal merged token intervals of windows
    // with corpus count >= 2. With the q_dup_spans planting, each
    // non-donor doc's cut is exactly its appended 12-token donor
    // suffix; donors additionally cut their own 12-token prefix. The
    // oracle replays windows → occ → interval merge generically rather
    // than hand-deriving that shape, so natural repeats (none at these
    // SFs, but the query must not assume it) stay covered.
    Q("q_dup_span_cut",
      (s, d) => graft.operators.Dedup.duplicateSpanCuts(
        spanAugmented(s, d), "doc_id", "text", spanWords = 10),
      Some(spanCutOracleCtes + """
        SELECT doc_id, CAST(s AS BIGINT) AS span_start,
          CAST(e AS BIGINT) AS span_end FROM cuts""")),

    // the rewrite half: drop exactly the cut intervals, rejoin with
    // single spaces. For non-donor docs this recovers the original
    // (space-normalized) text; the oracle again replays generically —
    // per-token anti-join against the cut intervals, re-aggregated in
    // position order.
    Q("q_dup_span_rewrite",
      (s, d) => {
        val aug = spanAugmented(s, d)
        graft.operators.Dedup.rewriteWithoutSpans(aug,
          graft.operators.Dedup.duplicateSpanCuts(aug, "doc_id", "text",
            spanWords = 10),
          "doc_id", "text")
      },
      Some(spanCutOracleCtes + """,
        tok AS (SELECT doc_id, unnest(toks) AS wd,
          unnest(generate_series(1, len(toks))) AS p FROM t),
        keep AS (SELECT tok.doc_id, wd, p FROM tok
          WHERE NOT EXISTS (SELECT 1 FROM cuts
            WHERE cuts.doc_id = tok.doc_id
              AND tok.p - 1 >= cuts.s AND tok.p - 1 < cuts.e)),
        agg AS (SELECT doc_id, string_agg(wd, ' ' ORDER BY p) AS text_cut
          FROM keep GROUP BY doc_id)
        SELECT t.doc_id, COALESCE(agg.text_cut, '') AS text_cut
        FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""")),

    // duplicate-span statistic under the 128-bit (two-long struct)
    // window key: identical semantics — the oracle is q_dup_spans's,
    // the SAME string — so the 10^13-window hash upgrade is
    // driver-checked, not just a parameter that compiles
    Q("q_dup_spans_128",
      (s, d) => graft.operators.Dedup.duplicateSpans(
        spanAugmented(s, d), "doc_id", "text", spanWords = 10,
        hashBits = 128),
      Some(spanStatsOracle)),

    // the persisted-state admission form under the driver's gates: the
    // SAME batch and oracle as q_ingest_admission, but the Bloom sketch
    // and band index come from a prebuilt on-disk fixture
    // (admissionState) instead of being fingerprinted from history
    // inline — the form whose 100 TB claim ("per-batch cost independent
    // of history size") actually matters. The admitted set is identical
    // by construction, so the oracle is shared verbatim.
    Q("q_ingest_admission_state",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val history = docs.where(col("doc_id") < 400)
        val batch = docs.where(col("doc_id") < 50)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
          .unionAll(docs.where(col("doc_id").between(50, 79))
            .select((col("doc_id") + 100000L).as("doc_id"),
              concat(col("text"), lit(" graftmarker")).as("text")))
          .unionAll(docs.where(col("doc_id").between(400, 449))
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        val (sketch, bands) = admissionState(s, d, history)
        graft.operators.Dedup.ingestAdmissionAgainstState(batch, history,
          Some(sketch), bands, "doc_id", "text", minJaccard = 0.95)
          .select(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, text FROM documents
                WHERE doc_id < 400),
              b AS (SELECT doc_id + 100000 AS doc_id, text
                  FROM documents WHERE doc_id < 50
                UNION ALL
                SELECT doc_id + 100000, text || ' graftmarker'
                  FROM documents WHERE doc_id BETWEEN 50 AND 79
                UNION ALL
                SELECT doc_id + 100000, text
                  FROM documents WHERE doc_id BETWEEN 400 AND 449),
              hs AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(toks) - 3, 0)),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
                FROM (SELECT doc_id,
                  string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM h)),
              bs AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(toks) - 3, 0)),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
                FROM (SELECT doc_id,
                  string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS toks FROM b)),
              near AS (SELECT DISTINCT bs.doc_id FROM bs JOIN hs ON
                CAST(len(list_intersect(bs.sh, hs.sh)) AS DOUBLE) /
                  (len(bs.sh) + len(hs.sh) -
                    len(list_intersect(bs.sh, hs.sh))) >= 0.95)
              SELECT b.doc_id FROM b
              WHERE NOT EXISTS (SELECT 1 FROM h WHERE h.text = b.text)
                AND NOT EXISTS (SELECT 1 FROM b b2
                  WHERE b2.text = b.text AND b2.doc_id < b.doc_id)
                AND b.doc_id NOT IN (SELECT doc_id FROM near)""")),

    // incremental semantic ingestion: batch embeddings matched against
    // the corpus's persisted IVF index without re-clustering it —
    // planted copies (re-ingested vec_id < 50 under new ids) land in
    // their source's cell by assignment determinism and MUST match it
    // at cosine 1.0; the id-distance filter projects out incidental
    // natural matches, the q_dedup_incremental_minhash discipline
    Q("q_dedup_incremental_semantic",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
          .where(col("vec_id") < 100000L)
          .select(col("vec_id"), col("embedding"))
        val batch = emb.where(col("vec_id") < 50)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        graft.operators.Dedup.incrementalSemantic(batch, emb,
          "vec_id", "embedding", nlist = 32, minCosine = 0.999)
          .where(col("new_id") - col("seen_id") === 100000L)
      },
      Some("""SELECT vec_id + 100000 AS new_id, vec_id AS seen_id,
              CAST(1.0 AS DOUBLE) AS cosine
              FROM embeddings WHERE vec_id < 50""")),

    // bucket-drop accounting as a driver-checked invariant: run the LSH
    // candidate stage, then read its observe() metrics — zero dropped
    // buckets on this corpus, exactly one bucketed expansion in the
    // plan, and a non-empty pair set (which is also what makes the
    // observe metric reliable under AQE — see Dedup.observeBuckets).
    // The count() inside the query body IS the action that populates
    // the metrics; the returned frame is metric-sized (driver-local by
    // construction, not a collect of data rows).
    Q("q_dedup_observe",
      (s, d) => {
        val cand = graft.operators.Dedup.minhashCandidates(
          s.read.parquet(pq(d, "documents")), "doc_id", "text")
        // collect(), not count(): count() routes through a NEW grouped
        // QueryExecution, so the observe metrics would land there while
        // bucketMetrics reads cand's own execution. The pair set is
        // near-dup-pair-sized (two longs each), not corpus-sized.
        val nPairs = cand.collect().length
        val m = graft.operators.Dedup.bucketMetrics(cand)
        import s.implicits._
        Seq((m.size.toLong, m.values.map(_._2).sum,
          if (nPairs > 0) 1L else 0L))
          .toDF("n_observations", "n_dropped_buckets", "has_pairs")
      },
      Some("""SELECT CAST(1 AS BIGINT) AS n_observations,
              CAST(0 AS BIGINT) AS n_dropped_buckets,
              CAST(1 AS BIGINT) AS has_pairs""")),

    // BM25 retrieval over the inverted index: three fixed queries probe
    // the corpus; the oracle replays the full Okapi/Lucene-idf formula
    // in SQL. Deterministic: rank on the raw double score with a doc_id
    // tiebreak, round only in the final projection (the q_tfidf
    // discipline). Distinct-query-terms contract — the repeated word in
    // query 2 must NOT double-count.
    Q("q_bm25_search",
      (s, d) => {
        import s.implicits._
        val queries = Seq((0L, "hash join"), (1L, "customer order data"),
          (2L, "vector vector scan")).toDF("query_id", "qtext")
        graft.functions.TextSearch.bm25Search(
          s.read.parquet(pq(d, "documents")), "doc_id", "text",
          queries, "query_id", "qtext", k = 5)
      },
      Some("""WITH q(query_id, qtext) AS (VALUES
                (CAST(0 AS BIGINT), 'hash join'),
                (CAST(1 AS BIGINT), 'customer order data'),
                (CAST(2 AS BIGINT), 'vector vector scan')),
              toks AS (SELECT doc_id,
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS term
                FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
              tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM toks GROUP BY 1, 2),
              dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
              stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
              dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
              qt AS (SELECT DISTINCT query_id,
                  unnest(string_split_regex(lower(regexp_replace(qtext, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS term
                FROM q),
              scored AS (SELECT qt.query_id, tf.doc_id,
                  SUM(LN(1 + (stats.n - dfreq.df + 0.5)
                        / (dfreq.df + 0.5))
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / stats.avgdl))) AS raw
                FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
                  JOIN dl USING (doc_id) CROSS JOIN stats
                GROUP BY 1, 2)
              SELECT query_id, doc_id, ROUND(raw, 4) AS score,
                "rank"
              FROM (SELECT query_id, doc_id, raw, ROW_NUMBER() OVER (
                  PARTITION BY query_id ORDER BY raw DESC, doc_id)
                    AS "rank"
                FROM scored)
              WHERE "rank" <= 5""")),

    // bounded-memory heavy hitters: the Misra-Gries sketch nominates
    // candidates (<= capacity counters per task, any cardinality), the
    // recount pass restores exact counts — so the oracle is plain
    // exact SQL. capacity 256 >> corpus vocabulary and >> n/(k-th
    // count), putting the run deep inside the sketch's correctness
    // window at every sf.
    Q("q_heavy_hitters",
      (s, d) => {
        val toks = s.read.parquet(pq(d, "documents"))
          .select(explode(graft.functions.TextAnalysis.tokens(
            lower(col("text")))).as("term"))
        graft.operators.Frequency.heavyHitters(toks, "term", k = 15,
          capacity = 256)
          .select(col("item").as("term"), col("cnt"))
      },
      Some("""WITH toks AS (SELECT
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS term
                FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
              SELECT term, COUNT(*) AS cnt FROM toks
              GROUP BY term ORDER BY cnt DESC, term LIMIT 15""")),

    // multinomial Naive Bayes, trained and scored on the corpus with
    // lang as the class: training is pure counting, so the oracle
    // replays the full smoothed-posterior argmax in SQL — same
    // baseline+correction decomposition as the Scala plan, so the
    // float paths match shape-for-shape (round only in the final
    // projection; label-asc tiebreak both sides).
    Q("q_classify_nb",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        val model = graft.functions.Classify.trainNaiveBayes(
          docs, "doc_id", "text", "lang")
        graft.functions.Classify.predictNaiveBayes(
            docs, "doc_id", "text", model)
          .select(col("doc_id"), col("predicted"),
            round(col("score"), 4).as("score"))
      },
      Some("""WITH toks AS (SELECT doc_id,
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS term
                FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
              n AS (SELECT doc_id, term, COUNT(*) AS n
                FROM toks GROUP BY 1, 2),
              dl AS (SELECT doc_id, CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0
                  THEN 0 ELSE
                  len(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+')) END
                    AS dl
                FROM documents),
              cls AS (SELECT d.lang AS label, COUNT(*) AS n_docs,
                  SUM(dl.dl) AS tok_c
                FROM documents d JOIN dl USING (doc_id) GROUP BY 1),
              tc AS (SELECT d.lang AS label, n.term, SUM(n.n) AS cnt
                FROM n JOIN documents d USING (doc_id) GROUP BY 1, 2),
              st AS (SELECT (SELECT COUNT(*) FROM documents) AS n_total,
                  (SELECT COUNT(DISTINCT term) FROM toks) AS vocab),
              base AS (SELECT dl.doc_id, cls.label,
                  LN(cls.n_docs * 1.0 / st.n_total)
                    + dl.dl * LN(1.0 / (cls.tok_c + 1.0 * st.vocab))
                    AS b
                FROM dl CROSS JOIN cls CROSS JOIN st),
              corr AS (SELECT n.doc_id, tc.label,
                  SUM(n.n * LN((tc.cnt + 1.0) / 1.0)) AS c
                FROM n JOIN tc USING (term) GROUP BY 1, 2),
              scored AS (SELECT base.doc_id, base.label,
                  base.b + COALESCE(corr.c, 0.0) AS score
                FROM base LEFT JOIN corr
                  ON base.doc_id = corr.doc_id
                  AND base.label = corr.label)
              SELECT doc_id, label AS predicted,
                ROUND(score, 4) AS score
              FROM (SELECT doc_id, label, score, ROW_NUMBER() OVER (
                  PARTITION BY doc_id ORDER BY score DESC, label) AS rk
                FROM scored)
              WHERE rk = 1""")),

    // DSIR importance selection (Xie et al. 2023): weight every doc by
    // its smoothed token-bag likelihood ratio against the en-subset
    // target distribution, keep the top 100. Deterministic counting
    // end to end, and the arithmetic is integer-exact: each smoothed
    // ln is snapped to the 1e-9 grid as a BIGINT, the per-doc sum is a
    // pure integer sum (order-independent — a raw double Σ left the
    // emitted value flipping 4th-decimal rounding boundaries between
    // engines, the r6/r7 gate failure), and the final 4-decimal
    // rounding of S/(dl·1e9) is half-away-from-zero integer division
    // replayed verbatim by the oracle. Kept set, tiebreak, and value
    // are all pure functions of the data.
    Q("q_dsir_select",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        graft.operators.Importance.dsirSelect(
          docs, "doc_id", "text", col("lang") === "en", k = 100)
      },
      Some("""WITH toks AS (SELECT doc_id,
                  unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+'))
                    AS term
                FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0),
              n AS (SELECT doc_id, term, COUNT(*) AS n
                FROM toks GROUP BY 1, 2),
              rawc AS (SELECT term, SUM(n) AS cnt_r FROM n GROUP BY 1),
              tgtc AS (SELECT n.term, SUM(n.n) AS cnt_t
                FROM n JOIN documents d USING (doc_id)
                WHERE d.lang = 'en' GROUP BY 1),
              st AS (SELECT
                  (SELECT SUM(cnt_r) FROM rawc) AS tok_r,
                  (SELECT COUNT(*) FROM rawc) AS vocab,
                  (SELECT COALESCE(SUM(cnt_t), 0) FROM tgtc) AS tok_t),
              contrib AS (SELECT n.doc_id, n.n,
                  n.n * (CAST(ROUND(LN((COALESCE(tgtc.cnt_t, 0) + 1.0)
                          / (st.tok_t + 1.0 * st.vocab))
                        * 1000000000) AS BIGINT)
                    - CAST(ROUND(LN((rawc.cnt_r + 1.0)
                          / (st.tok_r + 1.0 * st.vocab))
                        * 1000000000) AS BIGINT)) AS c
                FROM n JOIN rawc USING (term)
                  LEFT JOIN tgtc USING (term) CROSS JOIN st),
              agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS s,
                  CAST(SUM(n) AS BIGINT) AS dl
                FROM contrib GROUP BY 1)
              SELECT doc_id, dl,
                SIGN(s) * ((2 * ABS(s) + dl * 100000)
                  // (2 * dl * 100000)) / 10000.0 AS log_weight
              FROM agg
              ORDER BY log_weight DESC, doc_id
              LIMIT 100""")),

    // RefinedWeb-style per-domain cap: at most 10 docs per source,
    // chosen by the deterministic md5-of-key order — survivors are a
    // pure function of (source, doc_id, cap), so the oracle replays
    // the same window in SQL (DuckDB md5 = same lowercase hex).
    Q("q_domain_cap",
      (s, d) => {
        graft.operators.Sampling.capPerGroup(
            s.read.parquet(pq(d, "documents")), "source", "doc_id",
            cap = 10)
          .select(col("doc_id"), col("source"))
      },
      Some("""SELECT doc_id, source FROM (
                SELECT doc_id, source, ROW_NUMBER() OVER (
                  PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                FROM documents)
              WHERE rk <= 10""")),

    // CCNet-style LM quality scoring (Wenzek et al.): bigram LM trained
    // on the en subset, every >= 2-token doc scored by smoothed
    // perplexity. Counting only, so the oracle replays the exact
    // formula; bigrams are space-joined token pairs (collision-free:
    // whitespace tokens cannot contain a space); round in the final
    // projection.
    Q("q_lm_perplexity",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        val model = graft.functions.LanguageModel.trainBigramLm(
          docs.where(col("lang") === "en"), "text")
        graft.functions.LanguageModel.perplexity(
            docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_bigrams"),
            round(col("ppl"), 4).as("ppl"))
      },
      Some("""WITH uni AS (SELECT w, COUNT(*) AS cnt FROM (
                  SELECT unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')),
                    '\s+')) AS w
                  FROM documents
                  WHERE lang = 'en' AND length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
                GROUP BY 1),
              voc AS (SELECT COUNT(*) AS v FROM uni),
              bi AS (SELECT bg, COUNT(*) AS cnt FROM (
                  SELECT unnest(list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i + 1])) AS bg
                  FROM (SELECT string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')),
                      '\s+') AS l
                    FROM documents
                    WHERE lang = 'en' AND length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
                  WHERE len(l) >= 2)
                GROUP BY 1),
              cand AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i + 1])) AS bg
                FROM (SELECT doc_id,
                    string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+') AS l
                  FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
                WHERE len(l) >= 2),
              lp AS (SELECT cand.doc_id,
                  LN((COALESCE(bi.cnt, 0) + 1.0)
                    / (COALESCE(uni.cnt, 0) + 1.0 * voc.v)) AS lp
                FROM cand LEFT JOIN bi USING (bg)
                  LEFT JOIN uni
                    ON uni.w = split_part(cand.bg, ' ', 1)
                  CROSS JOIN voc)
              SELECT doc_id, COUNT(*) AS n_bigrams,
                ROUND(EXP(-SUM(lp) / COUNT(*)), 4) AS ppl
              FROM lp GROUP BY doc_id""")),

    // curation pipeline over the round-6 operators: LM-perplexity
    // quality gate (fixed threshold — deterministic and replayable,
    // unlike a percentile cut) → per-source cap → deterministic split
    // assignment, one declarative plan. The oracle composes the same
    // stages in SQL (the q_pipeline_e2e pattern): perplexity CTEs,
    // the cap window over the GATED set, and the md5 cumulative-
    // threshold split.
    Q("q_curation_pipeline",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
        val model = graft.functions.LanguageModel.trainBigramLm(
          docs.where(col("lang") === "en"), "text")
        val gated = graft.functions.LanguageModel.perplexity(
            docs, "doc_id", "text", model)
          .where(col("ppl") <= 31.0)
          .select(col("doc_id"), col("ppl"))
        val kept = docs.select(col("doc_id"), col("source"))
          .join(gated, "doc_id")
        val capped = graft.operators.Sampling.capPerGroup(
          kept, "source", "doc_id", cap = 15)
        graft.operators.Sampling.splitAssign(capped, "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "cur")
          .select(col("doc_id"), col("source"),
            round(col("ppl"), 4).as("ppl"), col("split"))
      },
      Some("""WITH uni AS (SELECT w, COUNT(*) AS cnt FROM (
                  SELECT unnest(string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')),
                    '\s+')) AS w
                  FROM documents
                  WHERE lang = 'en' AND length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
                GROUP BY 1),
              voc AS (SELECT COUNT(*) AS v FROM uni),
              bi AS (SELECT bg, COUNT(*) AS cnt FROM (
                  SELECT unnest(list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i + 1])) AS bg
                  FROM (SELECT string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')),
                      '\s+') AS l
                    FROM documents
                    WHERE lang = 'en' AND length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
                  WHERE len(l) >= 2)
                GROUP BY 1),
              cand AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(l)),
                    i -> l[i] || ' ' || l[i + 1])) AS bg
                FROM (SELECT doc_id,
                    string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+') AS l
                  FROM documents WHERE length(regexp_replace(text, '^\s+|\s+$', '', 'g')) > 0)
                WHERE len(l) >= 2),
              lp AS (SELECT cand.doc_id,
                  LN((COALESCE(bi.cnt, 0) + 1.0)
                    / (COALESCE(uni.cnt, 0) + 1.0 * voc.v)) AS lp
                FROM cand LEFT JOIN bi USING (bg)
                  LEFT JOIN uni
                    ON uni.w = split_part(cand.bg, ' ', 1)
                  CROSS JOIN voc),
              ppl AS (SELECT doc_id, EXP(-SUM(lp) / COUNT(*)) AS ppl
                FROM lp GROUP BY doc_id),
              gated AS (SELECT d.doc_id, d.source, p.ppl
                FROM documents d JOIN ppl p USING (doc_id)
                WHERE p.ppl <= 31.0),
              capped AS (SELECT doc_id, source, ppl FROM (
                  SELECT doc_id, source, ppl, ROW_NUMBER() OVER (
                    PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      AS rk
                  FROM gated)
                WHERE rk <= 15)
              SELECT doc_id, source, ROUND(ppl, 4) AS ppl,
                CASE WHEN substr(md5('cur' || CAST(doc_id AS VARCHAR)),
                    1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5('cur' || CAST(doc_id AS VARCHAR)),
                    1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split
              FROM capped""")),

    // Bloom-gated semi-join reduction: lineitem joined to a selective
    // part slice with the big side pre-filtered at the scan by the
    // small side's key sketch — no false negatives, so the gated join
    // ≡ the plain join the oracle runs. The 100 TB shape: only
    // probable matches enter the shuffle.
    Q("q_bloom_join",
      (s, d) => {
        val li = s.read.parquet(pq(d, "lineitem"))
          .select(col("l_partkey"), col("l_quantity"))
        val pt = s.read.parquet(pq(d, "part"))
          .where(col("p_size") === 1)
          .select(col("p_partkey").as("l_partkey"), col("p_brand"))
        graft.operators.Skew.bloomGatedJoin(li, pt, Seq("l_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT p_brand, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
                COUNT(*) AS n
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_size = 1
              GROUP BY p_brand""")),

    // k-NN label propagation: every 5th vector "loses" its label and
    // gets the majority label of its 5 nearest labeled neighbors —
    // count ties break toward the smaller label, so the prediction is
    // a pure function of the data (full SQL replay)
    Q("q_knn_label",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
        val unl = emb.where(col("vec_id") % 5 === 0)
          .select(col("vec_id"), col("embedding"))
        val lab = emb.where(col("vec_id") % 5 =!= 0)
          .select(col("vec_id").as("nbr_id"),
            col("embedding").as("nv"), col("label"))
        graft.plans.NativeFunctions.register(s)
        graft.operators.Similarity.knnLabel(unl, lab,
          "vec_id", "embedding", "nbr_id", "nv", "label", k = 5)
      },
      Some("""WITH pairs AS (SELECT u.vec_id, l.vec_id AS nbr_id,
                  l.label,
                  ROUND(CAST(list_cosine_similarity(u.embedding,
                    l.embedding) AS DOUBLE), 4) AS c
                FROM embeddings u, embeddings l
                WHERE u.vec_id % 5 = 0 AND l.vec_id % 5 <> 0),
              nn AS (SELECT vec_id, label FROM (
                  SELECT vec_id, label, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY c DESC, nbr_id) AS rk
                  FROM pairs) WHERE rk <= 5),
              votes AS (SELECT vec_id, label, COUNT(*) AS votes
                FROM nn GROUP BY vec_id, label)
              SELECT vec_id, label, votes FROM (
                SELECT vec_id, label, votes, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY votes DESC, label) AS vr
                FROM votes) WHERE vr = 1""")),

    // the bucketed (large-labeled-side) label propagation path: the
    // labeled side is shuffle-joined on LSH buckets, never broadcast.
    // Planted exactness (the q_ann_lsh move): each unlabeled vector
    // gets an IDENTICAL labeled twin with a known analytic label and
    // the smallest possible neighbor id — same vector → same bucket
    // always, cosine 1.0 tops the ranking, and the id tiebreak makes
    // the twin the k=1 winner even if another vector rounds to 1.0 —
    // so the approximate path's output is exactly replayable
    Q("q_knn_label_bucketed",
      (s, d) => {
        val emb = s.read.parquet(pq(d, "embeddings"))
        val unl = emb.where(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding"))
        val twins = emb.where(col("vec_id") < 5)
          .select((col("vec_id") - 1000000L).as("nbr_id"),
            col("embedding").as("nv"),
            (lit(1000L) + col("vec_id") % 3).as("label"))
        val lab = emb.where(col("vec_id") >= 5)
          .select(col("vec_id").as("nbr_id"),
            col("embedding").as("nv"), col("label"))
          .unionByName(twins)
        graft.plans.NativeFunctions.register(s)
        graft.operators.Similarity.knnLabelBucketed(unl, lab,
          "vec_id", "embedding", "nbr_id", "nv", "label",
          k = 1, planes = 6)
      },
      Some("""SELECT vec_id, CAST(1000 + vec_id % 3 AS BIGINT) AS label,
              CAST(1 AS BIGINT) AS votes
              FROM embeddings WHERE vec_id < 5""")),

    // deterministic training-order shuffle: shard by the first hex
    // digit of md5(salt||id), position within shard by the full hash —
    // shard-major order IS the reproducible shuffle, with no global
    // sort anywhere in the plan
    Q("q_shuffle_deterministic",
      (s, d) => graft.operators.Sampling.deterministicShuffle(
          s.read.parquet(pq(d, "documents")).select(col("doc_id")),
          "doc_id", shards = 8, salt = "ep0")
        .select(col("doc_id"), col("shard"), col("pos")),
      Some("""WITH h AS (SELECT doc_id,
                  md5('ep0' || CAST(doc_id AS VARCHAR)) AS h
                FROM documents)
              SELECT doc_id,
                (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 8
                  AS shard,
                ROW_NUMBER() OVER (
                  PARTITION BY (strpos('0123456789abcdef',
                    substr(h, 1, 1)) - 1) % 8
                  ORDER BY h, doc_id) AS pos
              FROM h""")),

    // round-robin source interleave: batch b takes the b-th document
    // of every source in reproducible hash order — the source-balanced
    // training data order; per-source window, never global
    Q("q_interleave_sources",
      (s, d) => graft.operators.Sampling.interleaveBySource(
          s.read.parquet(pq(d, "documents"))
            .select(col("doc_id"), col("source")),
          "source", "doc_id", salt = "ep0"),
      Some("""SELECT doc_id, source,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY md5('ep0' || CAST(doc_id AS VARCHAR)),
                    doc_id) - 1 AS batch
              FROM documents""")),

    // training-data export capstone: quality gate → reproducible
    // shuffle ORDER (the deterministicShuffle hash as the pack order —
    // no materialized sort; packSequences range-partitions on it) →
    // document-preserving sequence packing. The corpus-to-training-
    // batches closing step, each stage an operator already gated alone.
    Q("q_export_pipeline",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("n_chars") >= 100 && col("n_chars") <= 900)
          .select(col("doc_id"), col("n_chars"),
            md5(concat(lit("ex"), col("doc_id").cast("string")))
              .as("ord"))
        graft.operators.Pack.packSequences(docs, "ord", "n_chars",
            maxTokens = 2000L)
          .select(col("doc_id"), col("seq_id"), col("seq_offset"))
      },
      Some("""WITH g AS (SELECT doc_id, n_chars,
                  md5('ex' || CAST(doc_id AS VARCHAR)) AS ord
                FROM documents WHERE n_chars BETWEEN 100 AND 900),
              c AS (SELECT doc_id,
                  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS ex FROM g)
              SELECT doc_id,
                CAST(floor(ex / 2000.0) AS BIGINT) AS seq_id,
                ex - CAST(floor(ex / 2000.0) AS BIGINT) * 2000
                  AS seq_offset
              FROM c""")),

    // packed-sequence text assembly on top of the export capstone: the
    // step that turns the packing ASSIGNMENT into trainer-ready
    // sequence text — one key shuffle, per-group text bounded by the
    // token budget itself
    Q("q_pack_text",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .where(col("n_chars") >= 100 && col("n_chars") <= 900)
          .select(col("doc_id"), col("n_chars"), col("text"),
            md5(concat(lit("pt"), col("doc_id").cast("string")))
              .as("ord"))
        val packed = graft.operators.Pack.packSequences(docs, "ord",
          "n_chars", maxTokens = 2000L)
        graft.operators.Pack.packedText(packed, "text")
          .select(col("seq_id"), col("n_docs"), col("text"))
      },
      Some("""WITH g AS (SELECT doc_id, n_chars, text,
                  md5('pt' || CAST(doc_id AS VARCHAR)) AS ord
                FROM documents WHERE n_chars BETWEEN 100 AND 900),
              c AS (SELECT doc_id, text,
                  CAST(COALESCE(SUM(n_chars) OVER (ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS ex FROM g),
              p AS (SELECT doc_id, text,
                  CAST(floor(ex / 2000.0) AS BIGINT) AS seq_id,
                  ex - CAST(floor(ex / 2000.0) AS BIGINT) * 2000
                    AS seq_offset FROM c)
              SELECT seq_id, COUNT(*) AS n_docs,
                string_agg(text, chr(10) ORDER BY seq_offset) AS text
              FROM p GROUP BY seq_id""")),

    // schema data contract against the documents table: planted
    // type-drift (n_chars contracted int, stored bigint), a missing
    // contracted column, and an uncontracted extra — pure footer
    // metadata, zero jobs over the data; the oracle is the literal
    // expected diff
    Q("q_schema_contract",
      (s, d) => graft.operators.Profile.schemaContract(
        s.read.parquet(pq(d, "documents")),
        Seq("doc_id" -> "bigint", "text" -> "string",
          "lang" -> "string", "n_chars" -> "int",
          "quality" -> "double")),
      Some("""SELECT * FROM (VALUES
                ('doc_id', 'bigint', 'bigint', 'ok'),
                ('text', 'string', 'string', 'ok'),
                ('lang', 'string', 'string', 'ok'),
                ('n_chars', 'int', 'bigint', 'type_drift'),
                ('quality', 'double', NULL, 'missing'),
                ('source', NULL, 'string', 'extra'))
                AS t("column", expected_type, actual_type, status)""")),

    // deterministic fixed-size sample: exactly 100 docs by stable hash
    // order — TakeOrderedAndProject, no global sort, no RNG
    Q("q_sample_fixed_n",
      (s, d) => graft.operators.Sampling.hashSampleN(
        s.read.parquet(pq(d, "documents")).select(col("doc_id"), col("lang")),
        "doc_id", n = 100, salt = "ev"),
      Some("""SELECT doc_id, lang FROM documents
              ORDER BY md5('ev' || CAST(doc_id AS VARCHAR)), doc_id
              LIMIT 100""")),

    // mojibake repair over planted UTF-8-as-cp1252 corruptions: the
    // expected outputs are literal (the q_url_idn planted pattern) —
    // single and double encoding repair, strict-validation identity on
    // clean ASCII AND on legitimate non-ASCII ('á' is a UTF-8 lead
    // byte under cp1252, but its neighbors fail continuation checks)
    Q("q_fix_mojibake",
      (s, d) => {
        val planted = array(
          lit("cafÃ©"), lit("naÃ¯ve donâ€™t"), lit("Â°C and Â£5"),
          lit("clean ascii text"), lit("já correct é"),
          lit("cafÃƒÂ©"), lit("ðŸ˜€ ok"))
        graft.plans.NativeFunctions.register(s)
        s.read.parquet(pq(d, "documents")).where(col("doc_id") < 200)
          .select(col("doc_id"),
            graft.plans.NativeFunctions.fixMojibakeNative(
              element_at(planted, (col("doc_id") % 7 + 1).cast("int")))
              .as("fixed"))
      },
      Some("""SELECT doc_id,
                CASE CAST(doc_id % 7 AS INT)
                  WHEN 0 THEN 'café'
                  WHEN 1 THEN 'naïve don’t'
                  WHEN 2 THEN '°C and £5'
                  WHEN 3 THEN 'clean ascii text'
                  WHEN 4 THEN 'já correct é'
                  WHEN 5 THEN 'café'
                  ELSE '😀 ok' END AS fixed
              FROM documents WHERE doc_id < 200""")))

  /** Planted sentences for [[graft.functions.TextAnalysis
    * .langIdCharNgram]] — one per profiled language plus an
    * out-of-profile row, shared by q_langid_ngram's query AND its
    * generated oracle so the two cannot drift (the bpeEncodeOracleSql
    * move). No apostrophes and no multi-space runs: the sentences
    * become single-quoted SQL literals under oracleSql's whitespace
    * collapse. */
  private[graft] val langIdPlants: Seq[(String, String)] = Seq(
    "en" -> "the cat and the dog are running for the morning train",
    "de" -> "der schnelle braune fuchs springt über die faulen hunde und lacht",
    "nl" -> "het is een mooie dag van het jaar voor een wandeling",
    "sv" -> "det är en vacker dag och att gå för en promenad",
    "da" -> "det er ikke en dårlig dag og der kommer flere til",
    "fr" -> "les enfants sont dans une grande maison que nous avons",
    "es" -> "los niños están en una casa del pueblo por la mañana con la canción",
    "pt" -> "não é uma solução para os problemas dos homens com ação",
    "it" -> "che bella giornata per una passeggiata con gli amici della città",
    "ro" -> "aceasta este o carte pentru copii și din multe ori și pentru oameni",
    "pl" -> "nie wiem czy się uda ale przez tego czasu nie mogę",
    "cs" -> "pro mnoho lidí je soused velmi dobrý a most přes řeku a zpět",
    "hu" -> "egy szép napon meg kell nézni hogy mire jó a szerencse",
    "fi" -> "tässä talossa voi istua mukavalla tuolilla ja katsella maisemia",
    "tr" -> "bunlar için bir şey yapmak istiyor ve onlar da geliyor",
    "id" -> "orang yang ada di dalam rumah itu sedang membaca dan menulis",
    "vi" -> "một người không được nói về của cải và tiền bạc",
    "ru" -> "это очень хорошо что при работе есть много возможностей",
    "uk" -> "від цього питання є враження що не можна зробити",
    "el" -> "και αυτό είναι που λένε την ιστορία της πόλης τους",
    "ar" -> "هذا من الماء في البيت وقد قالت لها الكثير",
    "he" -> "זה את הספר של הילדים ואת המים על השולחן",
    "hi" -> "यह किताब है और वह मेरे घर में का काम से की है",
    "zh" -> "这是一个很好的地方我们都在这里有人来了",
    "ja" -> "これは日本のです私たちにはをたくさんあります",
    "ko" -> "이것은 우리의 집이다 그리고 하늘을 보고 있다",
    "th" -> "การที่ของเราและในบ้านไม่ได้มีอะไร",
    // round-12 additions (profiles widened 27→50)
    "no" -> "jeg har en god følelse på denne stasjonen og det er ikke så langt å gå",
    "is" -> "það er ekki gott að vera einn um kvöldið og maður þarf að fara inn",
    "ca" -> "aquest és un dels llibres que també parlen amb molta atenció dels nens",
    "et" -> "see on üks asi mis oli olemas ja mida tuleb teha kui on vaja ning kõik on läinud koju",
    "lt" -> "tai yra geras dalykas kad žmonės gali dirbti namuose ir miestuose visą laiką",
    "lv" -> "tā ir laba diena un cilvēkiem patīk iet ar draugiem kas arī dzīvo šeit",
    "sk" -> "som rád že môžem pracovať a nie je to zlé pre ľudí ktorí sa boja o svoje zdravie",
    "sl" -> "to je lepo mesto in mislim da lahko tudi mi pridemo tja ki smo želeli potovanje v hribe",
    "hr" -> "to nije prije bilo pitanje koje ima smisla jer su ljudi koji rade morali doći i ako mogu ostati i to su pitanja bez kraja",
    "bg" -> "градът е хубав и хората искат да се разходят на улицата през деня и да видят новите неща",
    "sr" -> "ово је прича о људима који су живели у малим местима и да се зна шта је било прије него што су дошли ту",
    "be" -> "гэта вельмі добра што ў горадзе ёсць месца дзе можна пайсці і паглядзець на новыя рэчы і жыццё людзей",
    "fa" -> "این کتاب های خوب است که می توان با پدر و مادر در گلستان خواند",
    "ur" -> "یہ کتاب میرے گھر میں ہے اور اس کے اندر بہت سی اچھی باتیں لکھی ہیں ڈاکٹر نے بھی پڑھا",
    "bn" -> "আমাদের দেশের মানুষেরা খুব ভালো করে কাজ করছে এবং তারা নতুন কিছু শিখছে",
    "ta" -> "அவர்கள் நாட்டில் நல்ல வேலைகளை செய்கிறார்கள் மற்றும் புதியவற்றை கற்றுக்கொள்கிறார்கள்",
    "te" -> "ప్రజలు తమ దేశంలో మంచి పనులను చేస్తున్నారు మరియు కొత్త విషయాలను నేర్చుకుంటున్నారు",
    "ml" -> "ആളുകൾ അവരുടെ രാജ്യത്ത് നല്ല ജോലികൾ ചെയ്യുന്നു ഒപ്പം പുതിയ കാര്യങ്ങൾ പഠിക്കുന്നു",
    "kn" -> "ಜನರು ತಮ್ಮ ದೇಶದಲ್ಲಿ ಒಳ್ಳೆಯ ಕೆಲಸಗಳನ್ನು ಮಾಡುತ್ತಿದ್ದಾರೆ ಮತ್ತು ಹೊಸ ವಿಷಯಗಳನ್ನು ಕಲಿಯುತ್ತಿದ್ದಾರೆ",
    "ka" -> "ეს არის კარგი ადგილი სადაც ხალხს შეუძლია იმუშაოს და ისწავლოს რომ ცხოვრება უკეთესი იყოს ქვეყანაში",
    "hy" -> "սա լավ տեղ է որտեղ մարդիկ կարող են աշխատել և սովորել նոր բաներ իրենց կյանքում ամեն օր",
    "am" -> "ይህ ጥሩ ቦታ ነው ሰዎች የሚሰሩበት እና አዲስ ነገር የሚማሩበት በየቀኑ ላይ",
    "km" -> "នេះគឺជាកន្លែងល្អដែលមនុស្សអាចធ្វើការនិងរៀនអ្វីថ្មីនៅក្នុងជីវិតរបស់ពួកគេបាន",
    "und" -> "zzz qqq xw vjq kkk")

  /** Oracle for q_langid_ngram, generated from [[langIdPlants]]: the
    * expected label per planted row is a literal CASE — falsifiable
    * (a wrong winner or an und-regression mismatches) and immune to
    * drift between the plant list and the replay. */
  private val langIdNgramOracleSql: String = {
    val n = langIdPlants.size
    val cases = langIdPlants.zipWithIndex.map { case ((lang, _), i) =>
      s"WHEN $i THEN '$lang'" }.mkString(" ")
    s"""SELECT doc_id, CASE CAST(doc_id % $n AS INT) $cases
        END AS lang_pred FROM documents"""
  }

  /** The shared planted-variant union behind q_dedup_normalized: each
    * doc 0-49 plus a case/punctuation variant (+100000) and a
    * digit-shifted variant (+200000); all three must collapse to ONE
    * normalized key (digit counts are kept equal — digit→0 preserves
    * length, so `3`≢`10`). */
  private val dedupNormalizedUnionSql =
    """u AS (
        SELECT doc_id, text || ' Page ' || CAST(doc_id % 10 AS VARCHAR)
          || ' of 99.' AS t
        FROM documents WHERE doc_id < 50
        UNION ALL
        SELECT doc_id + 100000, '¡' || upper(text) || '! page '
          || CAST(doc_id % 10 AS VARCHAR) || ' of 99'
        FROM documents WHERE doc_id < 50
        UNION ALL
        SELECT doc_id + 200000, text || ' page '
          || CAST((doc_id + 3) % 10 AS VARCHAR) || ' of 42;'
        FROM documents WHERE doc_id < 50)"""

  /** tok/ln/sig CTE chain replaying [[graft.functions.TextAnalysis
    * .gopherSignals]]'s rule arithmetic over a `raw(doc_id, t)` CTE —
    * shared by q_gopher_signals (adversarial injected text) and
    * q_gopher_pipeline (raw corpus text) so the replay cannot drift
    * between the unit-altitude and pipeline-altitude gates.
    *
    * KNOWN ORACLE/ENGINE DIVERGENCE (documented, not currently
    * reachable): DuckDB regexes are RE2, the engine's are java.util
    * .regex, and they disagree on exactly two character classes —
    * (a) RE2 `\s` excludes vertical tab U+000B, which Java `\s`
    * includes (affects every `^\s+|\s+$` edge-trim replay in this
    * file), and (b) RE2 `$` does not match before a bare final line
    * terminator the way Java `rlike`'s `$` does for `\r`, U+0085,
    * U+2028, U+2029 (affects the bullet `[-*]( |$)` and ellipsis
    * `(\.\.\.|…)$` anchors below). The driver corpora and every
    * injected fixture in this file are free of all five characters
    * (U+000B, bare U+000D, U+0085, U+2028, U+2029) — guarded by
    * OracleDivergenceSpec — so the gates compare the
    * engines only where they agree; a future corpus containing them
    * would need the oracle made explicit (strip trailing `\r` before
    * anchoring, add `\x0B` to the trim class) rather than widened. */
  private val gopherSigCtes: String =
    """tok AS (SELECT doc_id, t,
        CASE WHEN length(regexp_replace(t, '^\s+|\s+$', '', 'g'))
            = 0 THEN []::VARCHAR[]
          ELSE string_split_regex(
            regexp_replace(t, '^\s+|\s+$', '', 'g'), '\s+') END
          AS toks FROM raw),
      ln AS (SELECT doc_id,
        list_filter(string_split_regex(t, '\r?\n'),
          l -> length(trim(l)) > 0) AS lines FROM raw),
      sig AS (SELECT tok.doc_id AS doc_id,
        len(toks) AS n_words,
        CASE WHEN len(toks) = 0 THEN 0.0
          ELSE CAST(list_aggregate(list_transform(toks,
            w -> length(w)), 'sum') AS DOUBLE) / len(toks) END
          AS mwl,
        CASE WHEN len(toks) = 0 THEN 0.0
          ELSE CAST(len(regexp_extract_all(t, '#')) AS DOUBLE)
            / len(toks) END AS hr,
        CASE WHEN len(toks) = 0 THEN 0.0
          ELSE CAST(len(regexp_extract_all(t, '\.\.\.'))
            + len(regexp_extract_all(t, '…')) AS DOUBLE)
            / len(toks) END AS er,
        CASE WHEN len(toks) = 0 THEN 0.0
          ELSE CAST(len(list_filter(toks,
            w -> regexp_matches(w, '\p{L}'))) AS DOUBLE)
            / len(toks) END AS af,
        CASE WHEN len(lines) = 0 THEN 0.0
          ELSE CAST(len(list_filter(lines, l -> regexp_matches(
            trim(l), '^([•‣◦·–]|[-*]( |$))'))) AS DOUBLE)
            / len(lines) END AS bf,
        CASE WHEN len(lines) = 0 THEN 0.0
          ELSE CAST(len(list_filter(lines, l -> regexp_matches(
            trim(l), '(\.\.\.|…)$'))) AS DOUBLE)
            / len(lines) END AS ef,
        len(list_intersect(list_distinct(list_transform(toks,
          w -> regexp_replace(lower(w),
            '^[\p{P}\p{S}]+|[\p{P}\p{S}]+$', '', 'g'))),
          ['the','be','to','of','and','that','have','with']))
          AS sh
        FROM tok JOIN ln ON tok.doc_id = ln.doc_id)"""

  /** The combined Gopher keep decision over [[gopherSigCtes]]'s sig
    * columns, parameterized on the word-count floor. */
  private def gopherKeepSql(minWords: Int): String =
    s"""CASE WHEN n_words BETWEEN $minWords AND 100000
        AND mwl BETWEEN 3.0 AND 10.0
        AND hr <= 0.1 AND er <= 0.1
        AND bf <= 0.9 AND ef <= 0.3
        AND af >= 0.8 AND sh >= 2
        THEN 1 ELSE 0 END"""

  private val round11: Seq[Q] = Seq(

    // full Gopher/MassiveText rule set over adversarial injected
    // structure (bullets incl. bare '-', ellipsis line endings, hash
    // spam, CRLF + tab-leading + punctuation-adjacent stopwords) so
    // every rule tier fires somewhere; the oracle replays the whole
    // rule arithmetic in SQL
    Q("q_gopher_signals",
      (s, d) => {
        val variants = array(
          lit("• first point\n- second point\n* third\n‣ fourth\n– dash\n-"),
          lit("to be continued...\nand then…\nthe end comes later..."),
          lit("## tagged ### content #### with # extra # tags #"),
          lit("\tthe, cat. (with) [of] {and} !that!\r\nplain line\r\n"))
        val injected = concat(substring(col("text"), 1, 60), lit("\n"),
          element_at(variants, (col("doc_id") % 4 + 1).cast("int")))
        graft.functions.TextAnalysis.gopherSignals(
          s.read.parquet(pq(d, "documents"))
            .select(col("doc_id"), injected.as("text")),
          "doc_id", "text", minWords = 5)
      },
      Some(s"""WITH raw AS (SELECT doc_id,
                substr(text, 1, 60) || chr(10) ||
                  (CASE CAST(doc_id % 4 AS INT)
                    WHEN 0 THEN '• first point' || chr(10) ||
                      '- second point' || chr(10) || '* third' || chr(10)
                      || '‣ fourth' || chr(10) || '– dash' || chr(10) || '-'
                    WHEN 1 THEN 'to be continued...' || chr(10) ||
                      'and then…' || chr(10) || 'the end comes later...'
                    WHEN 2 THEN '## tagged ### content #### with # extra'
                      || ' # tags #'
                    ELSE chr(9) || 'the, cat. (with) [of] {and} !that!'
                      || chr(13) || chr(10) || 'plain line' || chr(13)
                      || chr(10) END) AS t
                FROM documents),
              $gopherSigCtes
              SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                ROUND(mwl, 4) AS mean_word_len,
                ROUND(hr, 4) AS hash_ratio,
                ROUND(er, 4) AS ellipsis_ratio,
                ROUND(af, 4) AS alpha_word_frac,
                ROUND(bf, 4) AS bullet_line_frac,
                ROUND(ef, 4) AS ellipsis_line_frac,
                CAST(sh AS BIGINT) AS stop_hits,
                ${gopherKeepSql(5)} AS keep
              FROM sig""")),

    // char-ngram language ID over the 28 planted rows (27 languages
    // across 9 scripts + one out-of-profile row): expected labels are
    // literal — the q_fix_mojibake pattern
    Q("q_langid_ngram",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        val plants = array(langIdPlants.map(p => lit(p._2)): _*)
        s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"),
            graft.plans.NativeFunctions.langIdNgramNative(
              element_at(plants,
                (col("doc_id") % langIdPlants.size + 1).cast("int")))
              .as("lang_pred"))
      },
      Some(langIdNgramOracleSql)),

    // CCNet key normalization ∘ exact dedup: 50 docs × 3 planted
    // variants (case+punctuation, shifted digits) must collapse to one
    // key each; the oracle replays the normalization chain verbatim
    // (written RE2-portable for exactly this)
    Q("q_dedup_normalized",
      (s, d) => {
        import graft.functions.TextAnalysis
        val base = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 50).select(col("doc_id"), col("text"))
        val t0 = base.select(col("doc_id"),
          concat(col("text"), lit(" Page "),
            (col("doc_id") % 10).cast("string"), lit(" of 99."))
            .as("t"))
        val t1 = base.select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("¡"), upper(col("text")), lit("! page "),
            (col("doc_id") % 10).cast("string"), lit(" of 99")).as("t"))
        val t2 = base.select((col("doc_id") + 200000L).as("doc_id"),
          concat(col("text"), lit(" page "),
            ((col("doc_id") + 3) % 10).cast("string"), lit(" of 42;"))
            .as("t"))
        val all = t0.unionAll(t1).unionAll(t2)
          .select(col("doc_id"),
            TextAnalysis.normalizeForDedup(col("t")).as("norm"))
        graft.operators.Dedup.exactSummary(all, "norm", "doc_id")
      },
      Some(s"""WITH $dedupNormalizedUnionSql,
              n AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
                regexp_replace(lower(t), '\\p{Nd}', '0', 'g'),
                '[\\p{P}\\p{S}]', '', 'g'), '\\s+', ' ', 'g')) AS k
                FROM u)
              SELECT md5(k) AS text_hash, COUNT(*) AS n_copies,
                MIN(doc_id) AS keep_id
              FROM n GROUP BY k""")),

    // ingestion admission with NORMALIZED exact keys (keyOf =
    // normalizeForDedup): same pipeline as q_ingest_admission, but the
    // batch's docs 25-49 are case-/punctuation-reformatted copies of
    // history — invisible to the raw exact hash AND to raw-text
    // shingle signatures (case changes every shingle), so only the
    // normalized key path can reject them. Docs 0-24 are exact copies
    // (plain path still rejects); 400-449 novel (admitted minus
    // natural ≥0.95-jaccard twins, same replay as q_ingest_admission)
    Q("q_ingest_admission_normalized",
      (s, d) => {
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("text"))
        val history = docs.where(col("doc_id") < 400)
        val batch = docs.where(col("doc_id") < 25)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
          .unionAll(docs.where(col("doc_id").between(25, 49))
            .select((col("doc_id") + 100000L).as("doc_id"),
              concat(lit("¡"), upper(col("text")), lit("!!!")).as("text")))
          .unionAll(docs.where(col("doc_id").between(400, 449))
            .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        graft.operators.Dedup.ingestAdmission(batch, history,
          "doc_id", "text", expectedItems = 10000L, numBits = 1L << 17,
          minJaccard = 0.95,
          keyOf = graft.functions.TextAnalysis.normalizeForDedup)
          .select(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, text FROM documents
                WHERE doc_id < 400),
              b AS (SELECT doc_id + 100000 AS doc_id, text
                  FROM documents WHERE doc_id < 25
                UNION ALL
                SELECT doc_id + 100000, '¡' || upper(text) || '!!!'
                  FROM documents WHERE doc_id BETWEEN 25 AND 49
                UNION ALL
                SELECT doc_id + 100000, text
                  FROM documents WHERE doc_id BETWEEN 400 AND 449),
              hn AS (SELECT trim(regexp_replace(regexp_replace(
                  regexp_replace(lower(text), '\p{Nd}', '0', 'g'),
                  '[\p{P}\p{S}]', '', 'g'), '\s+', ' ', 'g')) AS k
                FROM h),
              bn AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
                  regexp_replace(lower(text), '\p{Nd}', '0', 'g'),
                  '[\p{P}\p{S}]', '', 'g'), '\s+', ' ', 'g')) AS k
                FROM b),
              hs AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(toks) - 3, 0)),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
                FROM (SELECT doc_id, string_split_regex(
                  regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')
                  AS toks FROM h)),
              bs AS (SELECT doc_id, list_distinct(list_transform(
                  generate_series(0, greatest(len(toks) - 3, 0)),
                  i -> array_to_string(toks[i+1:i+3], ' '))) AS sh
                FROM (SELECT doc_id, string_split_regex(
                  regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')
                  AS toks FROM b)),
              near AS (SELECT DISTINCT bs.doc_id FROM bs JOIN hs ON
                CAST(len(list_intersect(bs.sh, hs.sh)) AS DOUBLE) /
                  (len(bs.sh) + len(hs.sh) -
                    len(list_intersect(bs.sh, hs.sh))) >= 0.95)
              SELECT bn.doc_id FROM bn
              WHERE bn.k NOT IN (SELECT k FROM hn)
                AND NOT EXISTS (SELECT 1 FROM bn b2
                  WHERE b2.k = bn.k AND b2.doc_id < bn.doc_id)
                AND bn.doc_id NOT IN (SELECT doc_id FROM near)""")),

    // curation capstone with the FULL Gopher keep decision as the
    // quality gate (pipeline altitude for gopherSignals, the
    // q_curation_pipeline shape): gopher gate → per-source cap →
    // deterministic split. The synthetic corpus vocabulary contains
    // "the" but none of the other seven Gopher function words, so the
    // ≥2-of-8 rule would reject EVERY raw doc (verified: 0 hits at
    // sf0.01) — docs with doc_id % 3 != 2 get a function-word preamble
    // so the gate discriminates and both outcomes flow into the
    // cap/split stages; the oracle replays the whole rule arithmetic
    Q("q_gopher_pipeline",
      (s, d) => {
        import graft.functions.TextAnalysis
        import graft.operators.Sampling
        val pre = "it has to be that good with and of all them "
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 3 =!= 2,
              concat(lit(pre), col("text")))
              .otherwise(col("text")).as("text"))
        val sig = TextAnalysis.gopherSignals(docs, "doc_id", "text",
          minWords = 10)
        val kept = docs.select(col("doc_id"), col("source"))
          .join(sig.where(col("keep") === 1)
            .select(col("doc_id"), col("n_words"), col("stop_hits")),
            "doc_id")
        val capped = Sampling.capPerGroup(kept, "source", "doc_id",
          cap = 40)
        Sampling.splitAssign(capped, "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "gopher")
          .select(col("doc_id"), col("source"), col("n_words"),
            col("stop_hits"), col("split"))
      },
      Some(s"""WITH raw AS (SELECT doc_id,
                CASE WHEN CAST(doc_id % 3 AS INT) <> 2
                  THEN 'it has to be that good with and of all them '
                    || text
                  ELSE text END AS t
                FROM documents),
              $gopherSigCtes,
              kept AS (SELECT d.doc_id, d.source,
                  CAST(s.n_words AS BIGINT) AS n_words,
                  CAST(s.sh AS BIGINT) AS stop_hits
                FROM documents d JOIN sig s ON d.doc_id = s.doc_id
                WHERE ${gopherKeepSql(10)} = 1),
              capped AS (SELECT doc_id, source, n_words, stop_hits
                FROM (SELECT doc_id, source, n_words, stop_hits,
                    ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      AS rk
                  FROM kept)
                WHERE rk <= 40)
              SELECT doc_id, source, n_words, stop_hits,
                CASE WHEN substr(md5('gopher'
                    || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5('gopher'
                    || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END AS split
              FROM capped""")),

    // spectral-peak constellation audio dedup (Wang 2003) over planted
    // TIME-OFFSET copies — the case q_audio_fp_dedup's ZCR profile
    // provably misses (MultimodalSpec pins that miss on this exact
    // fixture): ids 1000+c are id c's melody behind 16 hops of
    // silence. Offset voting puts every planted pair at 290 votes and
    // chance tone collisions at ≤24 (deterministic fixture), so the
    // 100-vote gate selects exactly the planted pairs — pure id
    // arithmetic for the oracle
    Q("q_audio_constellation",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.audioConstellationMatches(
          Multimodal.syntheticShiftedAudioCorpus(s, nContents = 20,
            nShifted = 10), minVotes = 100)
          .select(col("id_a"), col("id_b"))
      },
      Some("""SELECT i AS id_a, i + 1000 AS id_b
              FROM generate_series(0, 9) t(i)""")),

    // tempo/pitch-robust constellation (round 12): 10 planted
    // RESAMPLED copies (rate 1.1 — pitch and tempo scale together, the
    // re-upload model) that the absolute-bin landmarks provably miss
    // (every peak bin and frame delta scales; MultimodalSpec pins the
    // miss) and the frequency-ratio hashes + event-sequence verify
    // catch exactly — the default two-stage gate returns precisely the
    // planted pair set (measured: copies at match_frac 1.0 / votes
    // 85-113, best chance pair 0.61 / 36)
    Q("q_audio_constellation_ratio",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.audioConstellationRatioMatches(
          Multimodal.syntheticResampledAudioCorpus(s, nContents = 20,
            nResampled = 10))
          .select(col("id_a"), col("id_b"))
      },
      Some("""SELECT i AS id_a, i + 2000 AS id_b
              FROM generate_series(0, 9) t(i)""")),

    // incremental constellation probe: history clips (ids 0-19) are
    // landmark-indexed ONCE; the batch (their 16-hop-delayed copies,
    // ids 1000-1009) probes the index — per-batch cost is the touched
    // index rows, history audio never re-decoded. Planted arithmetic
    // oracle like q_audio_constellation
    Q("q_audio_constellation_incremental",
      (s, d) => {
        import graft.multimodal.Multimodal
        val corpus = Multimodal.syntheticShiftedAudioCorpus(s,
          nContents = 20, nShifted = 10)
        val history = corpus.filter(_.media_id < 1000L)
        val batch = corpus.filter(_.media_id >= 1000L)
        Multimodal.audioConstellationProbeIndex(batch,
          Multimodal.audioConstellationHashes(history), minVotes = 100)
          .select(col("new_id"), col("seen_id"))
      },
      Some("""SELECT i + 1000 AS new_id, i AS seen_id
              FROM generate_series(0, 9) t(i)""")),

    // the COMPLETE MassiveText filter: the shuffle-free Gopher rule
    // tier (gopherSignals) AND the repetition tier (repetitionStats —
    // the one that genuinely needs a shuffle) composed into one keep
    // decision. Thresholds chosen where the corpus discriminates both
    // ways (dup_word_frac median 0.54, top_bigram_frac p90 0.069 at
    // sf0.01); the same stopword preamble as q_gopher_pipeline keeps
    // the rule tier non-degenerate. Oracle replays BOTH tiers
    Q("q_gopher_full",
      (s, d) => {
        import graft.functions.TextAnalysis
        val pre = "it has to be that good with and of all them "
        val docs = s.read.parquet(pq(d, "documents"))
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            when(col("doc_id") % 3 =!= 2,
              concat(lit(pre), col("text")))
              .otherwise(col("text")).as("text"))
        val rules = TextAnalysis.gopherSignals(docs, "doc_id", "text",
          minWords = 10).select(col("doc_id"), col("keep"))
        val rep = TextAnalysis.repetitionStats(docs, "doc_id", "text")
        rules.join(rep, "doc_id")
          .select(col("doc_id"), col("keep").as("keep_rules"),
            ((col("dup_word_frac") <= 0.5) &&
              (col("top_bigram_frac") <= 0.08)).cast("int")
              .as("keep_rep"),
            ((col("keep") === 1) && (col("dup_word_frac") <= 0.5) &&
              (col("top_bigram_frac") <= 0.08)).cast("int").as("keep"))
      },
      Some(s"""WITH raw AS (SELECT doc_id,
                CASE WHEN CAST(doc_id % 3 AS INT) <> 2
                  THEN 'it has to be that good with and of all them '
                    || text
                  ELSE text END AS t
                FROM documents),
              $gopherSigCtes,
              rt AS (SELECT doc_id,
                string_split_regex(
                  regexp_replace(t, '^\\s+|\\s+$$', '', 'g'), '\\s+')
                  AS toks FROM raw),
              rb AS (SELECT doc_id, len(toks) AS n,
                len(list_distinct(toks)) AS nd,
                list_transform(generate_series(1, len(toks)-1),
                  i -> toks[i] || ' ' || toks[i+1]) AS bgs FROM rt),
              re AS (SELECT doc_id, unnest(bgs) AS bg FROM rb),
              rc AS (SELECT doc_id, bg, count(*) AS c FROM re
                GROUP BY doc_id, bg),
              rm AS (SELECT doc_id, max(c) AS mx,
                CAST(sum(c) AS BIGINT) AS tot FROM rc GROUP BY doc_id),
              rep AS (SELECT rb.doc_id AS doc_id,
                ROUND(CAST(1.0 AS DOUBLE) - CAST(nd AS DOUBLE)/n, 4)
                  AS dwf,
                COALESCE(ROUND(CAST(mx AS DOUBLE)/tot, 4),
                  CAST(0.0 AS DOUBLE)) AS tbf
                FROM rb LEFT JOIN rm ON rb.doc_id = rm.doc_id)
              SELECT sig.doc_id AS doc_id,
                ${gopherKeepSql(10)} AS keep_rules,
                CASE WHEN dwf <= 0.5 AND tbf <= 0.08 THEN 1 ELSE 0 END
                  AS keep_rep,
                CASE WHEN ${gopherKeepSql(10)} = 1
                  AND dwf <= 0.5 AND tbf <= 0.08 THEN 1 ELSE 0 END
                  AS keep
              FROM sig JOIN rep ON sig.doc_id = rep.doc_id""")),

    // accent-folded dedup keys (the full CCNet recipe): composed,
    // decomposed AND accentless re-typings of the same phrase — plus
    // digit/punct/case noise — must collapse to ONE key per source
    // doc; plain normalizeForDedup provably keeps the accentless copy
    // apart (TextAnalysisSpec pins that contrast). 20 planted groups
    // of 3 → pure arithmetic oracle; an under-folding breaks
    // n_copies, an over-merging breaks the row count
    Q("q_dedup_accent_fold",
      (s, d) => {
        import graft.functions.TextAnalysis
        graft.plans.NativeFunctions.register(s)
        val base = s.read.parquet(pq(d, "documents"))
          .where(col("doc_id") < 20)
          .select(col("doc_id"), substring(col("text"), 1, 30).as("p"))
        val digit = (col("doc_id") % 10).cast("string")
        val t0 = base.select(col("doc_id"),
          concat(col("p"), lit(" Caf\u00e9 pi\u00f1ata R\u00e9sum\u00e9 No. "),
            digit).as("t"))
        val t1 = base.select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("p"), lit(" Cafe\u0301 pin\u0303ata" +
            " Re\u0301sume\u0301 no "), digit).as("t"))
        val t2 = base.select((col("doc_id") + 200000L).as("doc_id"),
          concat(upper(col("p")), lit(" CAFE PINATA RESUME NO "),
            ((col("doc_id") + 7) % 10).cast("string")).as("t"))
        val all = t0.unionAll(t1).unionAll(t2)
          .select(col("doc_id"),
            TextAnalysis.normalizeForDedupFolded(col("t")).as("k"))
        graft.operators.Dedup.exactSummary(all, "k", "doc_id")
          .select(col("keep_id"), col("n_copies"))
      },
      Some("""SELECT i AS keep_id, CAST(3 AS BIGINT) AS n_copies
              FROM generate_series(0, 19) t(i)""")),

    // frame-sequence video dedup with offset voting — the video
    // analog of q_audio_constellation: ids 1000+c are id c's 8-frame
    // clip behind a 3-frame intro; every content frame recurs at
    // offset 3 (8 votes), chance exact-pHash collisions are zero on
    // this fixture, and the middle-frame fingerprint provably misses
    // the copies (MultimodalSpec pins both)
    Q("q_video_sequence",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.videoSequenceMatches(
          Multimodal.syntheticShiftedVideoCorpus(s, nContents = 12,
            nShifted = 6), minVotes = 5)
          .select(col("id_a"), col("id_b"))
      },
      Some("""SELECT i AS id_a, i + 1000 AS id_b
              FROM generate_series(0, 5) t(i)""")),

    // its incremental form: history frame-hash index built once, the
    // intro-prepended copies probe it
    Q("q_video_sequence_incremental",
      (s, d) => {
        import graft.multimodal.Multimodal
        val corpus = Multimodal.syntheticShiftedVideoCorpus(s,
          nContents = 12, nShifted = 6)
        Multimodal.videoSequenceProbeIndex(
          corpus.filter(_.media_id >= 1000L),
          Multimodal.videoFrameHashes(
            corpus.filter(_.media_id < 1000L)), minVotes = 5)
          .select(col("new_id"), col("seen_id"))
      },
      Some("""SELECT i + 1000 AS new_id, i AS seen_id
              FROM generate_series(0, 5) t(i)""")),

    // language-ID at pipeline altitude: native char-ngram classifier
    // feeds the mixture rebalancer (the q_gopher_pipeline move for
    // langid) — planted multilingual corpus, target blend en/zh/ru/ar
    // 40/30/20/10, every other language dropped. The oracle replays
    // the classifier as the planted CASE, the scarcest-source-binds
    // fraction plan, and the deterministic sampler's md5 threshold
    Q("q_langid_mixture",
      (s, d) => {
        graft.plans.NativeFunctions.register(s)
        val plants = array(langIdPlants.map(p => lit(p._2)): _*)
        val docs = s.read.parquet(pq(d, "documents"))
          .select(col("doc_id"),
            graft.plans.NativeFunctions.langIdNgramNative(
              element_at(plants,
                (col("doc_id") % langIdPlants.size + 1).cast("int")))
              .as("lang_pred"))
          .withColumn("w", lit(1L))
        graft.operators.Mixture.rebalance(docs, "doc_id", "lang_pred",
          "w", Map("en" -> 0.4, "zh" -> 0.3, "ru" -> 0.2, "ar" -> 0.1),
          salt = "lang")
          .groupBy(col("lang_pred")).agg(count(lit(1)).as("n_kept"))
      },
      Some {
        val n = langIdPlants.size
        val cases = langIdPlants.zipWithIndex.map { case ((l, _), i) =>
          s"WHEN $i THEN '$l'" }.mkString(" ")
        s"""WITH lp AS (SELECT doc_id, CASE CAST(doc_id % $n AS INT)
              $cases END AS lang_pred FROM documents),
            m AS (SELECT lang_pred, COUNT(*) AS mass FROM lp
              GROUP BY lang_pred),
            w AS (SELECT * FROM (VALUES ('en', CAST(0.4 AS DOUBLE)),
              ('zh', CAST(0.3 AS DOUBLE)), ('ru', CAST(0.2 AS DOUBLE)),
              ('ar', CAST(0.1 AS DOUBLE))) t(lang_pred, share)),
            f AS (SELECT m.lang_pred, LEAST(1.0, w.share *
                (SELECT MIN(m2.mass / w2.share) FROM m m2
                  JOIN w w2 USING (lang_pred)) / m.mass) AS frac
              FROM m JOIN w USING (lang_pred)),
            thr AS (SELECT lang_pred,
              CASE WHEN frac >= 1.0 - 1e-12 THEN 'g'
                ELSE printf('%04x', CAST(LEAST(floor(frac * 65536),
                  65535) AS INTEGER)) END AS th FROM f)
            SELECT lp.lang_pred, COUNT(*) AS n_kept
            FROM lp JOIN thr USING (lang_pred)
            WHERE substr(md5('lang' || CAST(lp.doc_id AS VARCHAR)), 1, 4)
              < thr.th
            GROUP BY lp.lang_pred"""
      }))

  private val registry: Seq[Q] =
    parity ++ extensions ++ pipelines ++ round3 ++ round6 ++ round11

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Whitespace runs collapse to one space — INCLUDING inside string
    * literals, so multi-space literals must be built as expressions
    * (`repeat(' ', 2)`, the BPE oracles). No `stripMargin`: it was a
    * no-op for every legitimate literal and destructively ate the
    * first pipe of any line-leading `||` (bit two round-8 oracles;
    * RegistrySpec's lone-pipe guard keeps the class out). */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o =>
      q.name -> o.replaceAll("\\s+", " ").trim)).toMap
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SparkEntry._

/** Parity queries: the reference's own surface, via AggregateEngine —
  * split out of SparkEntry in round 12 (mechanical; the registry is
  * assembled in SparkEntry, counts unchanged). */
private[graft] object RegistryParity {

  private def ae(
      dims: Seq[String],
      measures: Seq[Seq[String]],
      filters: Seq[Filter] = Nil,
      table: String = "lineitem",
      aggregate: Boolean = true)(s: SparkSession, dir: String): DataFrame =
    AggregateEngine.aggregatePq(s, pq(dir, table), dims, measures,
      dataFilter = filters, aggregate = aggregate)

  val entries: Seq[Q] = Seq(
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

}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import SparkEntry._

/** Extensions: joins / windows / sorts / set ops / scalar functions —
  * absent from the reference (SURVEY.md §2.4-2.8), first-class here. */
private[graft] object RegistryExtensions {

  val entries: Seq[Q] = Seq(
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
        // SHUFFLE_HASH on orders (optimization round 19, guide §3.1):
        // the projected orders side is a quarter of the fact table —
        // hash-building it per partition replaces sorting both sides
        // of the only shuffled join (measured −0.4 s at sf0.1); AQE
        // partition sizing keeps the per-partition build bounded at
        // scale
        li.join(o.hint("SHUFFLE_HASH"), li("l_orderkey") === o("o_orderkey"))
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

}

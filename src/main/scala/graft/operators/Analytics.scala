package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dashboard / query surface (SURVEY.md §2 #12-17) — the "storing and
  * querying" purpose of the reference (/root/reference/README.md:3).
  * Every query is declarative (Catalyst does pushdown + join
  * planning), aggregates are decimal-exact (order-independent at any
  * cluster size), and outputs carry a deterministic total order.
  */
object Analytics {

  /** #12 Group-by aggregate pack (TPC-H Q1 shape): one shuffle on the
    * group keys, map-side partial aggregation, filter pushed to scan. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("sum_disc_price"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** #13 Filtered scan: date-range + quantity predicates and a narrow
    * projection — both must reach the parquet reader (asserted in
    * PlanSpec: PushedFilters + 4-column ReadSchema). */
  def filterScan(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00") &&
        col("l_shipdate") < lit("1995-04-01 00:00:00") &&
        col("l_quantity") < 10d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** #14 Fact⋈dims with broadcast: lineitem⋈orders shuffles on the
    * join key; customer/nation/region are broadcast (explicit hint for
    * the two tiny dims; AQE picks broadcast for customer at test SF,
    * and at 100 TB customer exceeds the threshold and correctly
    * shuffles). Revenue per region × order priority. */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val cust = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val nat = Tables.load(spark, dir, "nation")
    val reg = Tables.load(spark, dir, "region")
    // One pass over the fact: narrow projections joined up the dim
    // chain (AQE broadcasts orders/customer at small SF and falls
    // back to sort-merge at 100 TB; nation/region are always-tiny
    // explicit broadcasts), then a single aggregation whose map-side
    // partials collapse to |regions|×|priorities| rows per task. A
    // pre-aggregation on l_orderkey would shuffle the same lineitem
    // bytes the join shuffle costs, plus an extra stage — measured
    // slower at every SF.
    // rev rides the joins as the 6-dp unscaled LONG (8 bytes, no
    // BigDecimal) and the final sum is the 128-bit exact kernel —
    // value parity with sum(cast(… as decimal(28,6))) is exact.
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        Num.unscaled6(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(Num.dsumUnscaled(col("rev")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "o_orderpriority")
  }

  /** #15 Top-k by aggregate: planned as TakeOrderedAndProject —
    * per-partition partial top-k, no global sort of the full set.
    * Deterministic tiebreak on the key. The fact joins a two-column
    * projection of orders directly (broadcast at small SF, sort-merge
    * at scale — and the bucketed warehouse variant, #36, runs it
    * exchange-free); a pre-aggregation on l_orderkey would shuffle
    * the same lineitem bytes it saves, so it buys nothing here. */
  def topkRevenue(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
    // rev joins as the 6-dp unscaled long; exact 128-bit final sum
    // (see joinBroadcast) — half the join-payload bytes, no
    // BigDecimal per row.
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        Num.unscaled6(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust_id"))
      .agg(Num.dsumUnscaled(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("cust_id").asc)
      .limit(10)
  }

  /** #16 Tumbling time-window aggregate — hourly rollup of the event
    * stream (the reference's minute/hour cadence, README.md:24). */
  def windowTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("bucket_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("sum_value"))
      .orderBy("bucket_hour", "event_type")

  /** #17 Semi/anti join: customers with vs without an urgent order.
    * Both buckets come from ONE pass — deduplicate the urgent
    * custkeys, left-join, and bucket on match — instead of a
    * semi-join pipeline plus an anti-join pipeline scanning customer
    * twice and unioning. Same EXISTS/NOT-EXISTS semantics (the
    * distinct makes the join at-most-one-match, so no row
    * multiplication), half the stages. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left")
      .withColumn("bucket",
        when(col("o_custkey").isNotNull, "with_urgent")
          .otherwise("without_urgent"))
      .groupBy("bucket", "c_mktsegment").agg(count(lit(1)).as("n_cust"))
      .orderBy("bucket", "c_mktsegment")
  }

  /** #101 Ratio-to-total window: each ticker's share of its day's
    * trade volume plus the day rank — the market-share dashboard
    * slice. One aggregate to (day, ticker) rows, then window sums
    * over the AGGREGATED table (|days|×|tickers| rows — tiny relative
    * to the stream, so the unbounded frame costs nothing at any SF).
    * Volumes are exact longs: the share division's operands are
    * integer-exact in both engines. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date").as("day"),
        col("user_id").as("ticker_id"))
      .agg(count(lit(1)).as("n_trades"),
        sum(length(col("props")).cast("long")).as("volume"))
    val byDay = Window.partitionBy("day")
    val rank = Window.partitionBy("day")
      .orderBy(col("volume").desc, col("ticker_id").asc)
    daily
      .withColumn("day_volume", sum(col("volume")).over(byDay))
      .withColumn("share", round(col("volume").cast("double") /
        col("day_volume").cast("double"), 6))
      .withColumn("day_rank", row_number().over(rank).cast("long"))
      .select("day", "ticker_id", "n_trades", "volume", "share", "day_rank")
      .orderBy("day", "day_rank")
  }

  /** #143 Market-basket co-occurrence — the top co-ordered part pairs
    * with support and lift, the "frequently bought together" report.
    * Pair generation is basket-bounded: lines first collapse to
    * DISTINCT (order, part) — which also makes the metric invariant
    * under corpus duplication — then self-join on the order key, so
    * the explode is Σ basket² (~7² per order), never catalog². Lift's
    * numerator/denominator are exact integers; one terminal round.
    *
    * Scale: the order-keyed self-join co-shuffles once on l_orderkey;
    * pair support is a hash aggregate on (part_a, part_b); the top-20
    * is TakeOrdered (no global sort materialized). A mega-basket is
    * the skew exposure and gets capped upstream in a real feed. */
  /** Smoothing pseudo-count for [[targetEncode]] (the standard
    * empirical-Bayes m-estimate). */
  val EncodeSmoothM = 20L

  /** #194 Smoothed target encoding — the ML feature-engineering
    * primitive: each category (brand) replaced by its
    * smoothed-toward-global mean target,
    * enc = (Σy_c + m·μ) / (n_c + m), so rare categories shrink to
    * the prior instead of memorizing noise. Engine-exact without
    * ever materializing μ: enc = (N·Σy_c + m·Σy) / (N·(n_c + m)) —
    * exact decimal integers, ONE terminal double division (and the
    * raw mean beside it for the shrinkage audit).
    *
    * Scale: one fact scan + broadcast dim + brand-grain map-side
    * aggregate; the global totals are a broadcast 1-row reduction of
    * the SAME collapsed table (never a second fact scan). */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), Num.unscaled6(col("l_extendedprice"))
        .as("y"))
    val p = Tables.load(spark, dir, "part")
      .select("p_partkey", "p_brand").distinct()
    val perBrand = li
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        (Num.dsum128Raw(col("y")) * lit(1000000L)).cast(dec).as("sy"))
      .localCheckpoint() // pinned: feeds rows + the 1-row totals
    val totals = perBrand
      .agg(sum(col("n")).as("nn"), sum(col("sy")).cast(dec).as("syt"))
    perBrand.crossJoin(broadcast(totals))
      .select(col("p_brand"), col("n"),
        round(col("sy").cast("double") / col("n").cast("double") / 1e6,
          6).as("mean_raw"),
        round((col("nn").cast(dec) * col("sy")
            + lit(EncodeSmoothM).cast(dec) * col("syt")).cast("double")
          / (col("nn").cast(dec) * (col("n") + lit(EncodeSmoothM))
            * lit(1000000L)).cast("double"), 6).as("encoding"))
      .orderBy("p_brand")
  }

  /** #191 Item-item collaborative-filtering scores — cosine
    * similarity over the co-purchase incidence matrix,
    * sim(a,b) = c_ab / √(c_a·c_b): the normalized "customers who
    * bought X also bought Y" ranking (the lift twin is #143 — lift
    * favors rare coincidences, cosine favors consistent pairing;
    * a recommender reads both). Same basket-bounded DISTINCT
    * (order, part) collapse; √ of an exact integer product is
    * IEEE-correctly-rounded on every platform, so the 6 dp-rounded
    * score is engine-exact; top-20 with a deterministic tiebreak
    * via TakeOrderedAndProject. */
  def itemCf(spark: SparkSession, dir: String): DataFrame = {
    val lines = Components.basketLines(spark, dir)
    val partCnt = lines.groupBy("l_partkey")
      .agg(count(lit(1)).as("c"))
    // the pinned counted-pair artifact (round 15) — no per-call
    // self-join
    val pairs = Components.basketPairCounts(spark, dir)
    pairs
      .join(partCnt.select(col("l_partkey").as("pa"), col("c").as("ca")),
        "pa")
      .join(partCnt.select(col("l_partkey").as("pb"), col("c").as("cb")),
        "pb")
      .select(col("pa"), col("pb"), col("support"), col("ca"), col("cb"),
        round(col("support").cast("double") /
          sqrt((col("ca") * col("cb")).cast("double")), 6)
          .as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("pa").asc, col("pb").asc)
      .limit(20)
  }

  def coOccurrence(spark: SparkSession, dir: String): DataFrame = {
    // pinned: the distinct collapse feeds the order count, the part
    // counts and BOTH sides of the pair self-join — lazy, each
    // consumer re-scans + re-distincts the fact table
    val lines = Components.basketLines(spark, dir)
    val nOrders = lines.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val partCnt = lines.groupBy("l_partkey")
      .agg(count(lit(1)).as("c"))
    // the pinned counted-pair artifact (round 15) — no per-call
    // self-join
    val pairs = Components.basketPairCounts(spark, dir)
    pairs
      .join(partCnt.select(col("l_partkey").as("pa"), col("c").as("ca")),
        "pa")
      .join(partCnt.select(col("l_partkey").as("pb"), col("c").as("cb")),
        "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("support"), col("ca"), col("cb"),
        round((col("support") * col("n_orders")).cast("double") /
          (col("ca") * col("cb")).cast("double"), 6).as("lift"))
      .orderBy(col("support").desc, col("pa").asc, col("pb").asc)
      .limit(20)
  }

  /** #144 Referential-integrity audit — the cross-table contract a
    * warehouse checks on every load (single-table nulls/ranges are
    * #60's dq_checks): orphaned facts (lineitem→orders, orders→
    * customer, customer→nation), duplicate primary keys, and null
    * foreign keys, one row per check — all six checks ONE unioned
    * lazy plan, one action.
    *
    * Every check runs at KEY grain, never row grain: each table
    * collapses once to (key → row count [, null-FK count]) — the
    * map-side combine — then orphan checks anti-join the collapsed
    * key tables and SUM the carried counts back to row-exact answers.
    * At ×100 the row-grain anti-join form (60M-row probe vs 150M-row
    * build, plus a re-scan per total) measured 4.7× the DuckDB twin;
    * key grain shrinks every join input to the distinct-key domain
    * and derives totals/dup-PK/null counts from the SAME collapsed
    * tables, which are localCheckpoint-pinned so no check re-scans a
    * fact table. A null key groups alone, never joins, and is
    * counted orphan — exactly the row-grain LEFT ANTI (and the
    * oracle's NOT EXISTS) semantics. */
  /** Corpus-keyed (key → row count) collapses — the shared input of
    * the key-grain audit/report family (#144 ref_audit, #145
    * join_cardinality, which between them re-derived seven of these
    * per round-14 call pair): each (table, key) grain pinned once per
    * corpus (bounded by the distinct-key domain — the basketLines
    * discipline). The lineitem/l_orderkey grain also carries its
    * null-partkey count so ref_audit's null-FK rule rides the same
    * collapse. */
  private val keyCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]

  private[graft] def keyCounts(spark: SparkSession, dir: String,
      table: String, key: String): DataFrame = {
    def compute: DataFrame = {
      val base = Tables.load(spark, dir, table)
      val agg =
        if (table == "lineitem" && key == "l_orderkey")
          base.groupBy(col(key).as("k"))
            .agg(count(lit(1)).as("cnt"),
              sum(col("l_partkey").isNull.cast("long")).as("n_null_part"))
        else base.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
      agg.localCheckpoint()
    }
    Pctl.key(dir, table, s"key_counts_$key") match {
      case Some(k) => graft.CorpusCache.df(keyCountCache, k, spark)(compute)
      case None => compute
    }
  }

  def refAudit(spark: SparkSession, dir: String): DataFrame = {
    // pinned shared key grains (bounded: distinct-key rows)
    val kli = keyCounts(spark, dir, "lineitem", "l_orderkey")
      .select(col("k").as("l_orderkey"), col("cnt"), col("n_null_part"))
    val ko = keyCounts(spark, dir, "orders", "o_orderkey")
      .select(col("k").as("o_orderkey"), col("cnt"))
    val koc = keyCounts(spark, dir, "orders", "o_custkey")
      .select(col("k").as("o_custkey"), col("cnt"))
    val kc = keyCounts(spark, dir, "customer", "c_nationkey")
      .select(col("k").as("c_nationkey"), col("cnt"))
    val cKeys = keyCounts(spark, dir, "customer", "c_custkey")
      .select(col("k").as("c_custkey"))
    val nKeys = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"))
    // bad rows = Σcnt over anti-joined keys; total = Σcnt over the
    // same pinned key table (a tiny second agg, no table re-scan)
    def orphan(name: String, bad: DataFrame, keyTable: DataFrame)
        : DataFrame =
      bad.agg(coalesce(sum(col("cnt")), lit(0L)).as("n_bad"))
        .crossJoin(keyTable.agg(sum(col("cnt")).as("n_total")))
        .select(lit(name).as("check_name"), col("n_bad"), col("n_total"))
    Seq(
      orphan("lineitem_orphan_order",
        kli.join(ko.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti"), kli),
      orphan("orders_orphan_customer",
        koc.join(cKeys.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti"), koc),
      orphan("customer_orphan_nation",
        kc.join(nKeys.select(col("n_nationkey").as("c_nationkey")),
          Seq("c_nationkey"), "left_anti"), kc),
      ko.agg((sum(col("cnt")) - count(lit(1))).as("n_bad"),
          sum(col("cnt")).as("n_total"))
        .select(lit("orders_dup_pk").as("check_name"), col("n_bad"),
          col("n_total")),
      koc.agg(coalesce(sum(when(col("o_custkey").isNull, col("cnt"))),
            lit(0L)).as("n_bad"), sum(col("cnt")).as("n_total"))
        .select(lit("orders_null_custkey").as("check_name"),
          col("n_bad"), col("n_total")),
      kli.agg(sum(col("n_null_part")).as("n_bad"),
          sum(col("cnt")).as("n_total"))
        .select(lit("lineitem_null_partkey").as("check_name"),
          col("n_bad"), col("n_total")))
      .map(df => df.select(col("check_name"),
        col("n_bad").cast("long").as("n_bad"),
        col("n_total").cast("long").as("n_total")))
      .reduce(_.unionByName(_))
      .orderBy("check_name")
  }

  /** #145 Join-cardinality report — the pre-flight a planner (or an
    * engineer) runs before a 100 TB join: for each declared join
    * edge, both sides' row and distinct-key counts, the EXACT output
    * cardinality Σ cL·cR, and the single worst key with its
    * contribution. Computed at key grain (both sides collapse to
    * (key, count) first), so the "estimate" costs two aggregates and
    * a distinct-key-domain join — never the join itself. The worst
    * key is a max-of-struct aggregate (map-side partial); at 100 TB
    * a top contributor owning a large share of Σ cL·cR is the signal
    * to salt (#58) before running the real join.
    *
    * All counts and products are exact integers (decimal(38,0) for
    * the Σ), so the report is hash-oracled. */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame = {
    def edge(name: String, leftGrain: (String, String),
        rightGrain: (String, String)): DataFrame = {
      // the pinned shared key grains (see keyCounts): each collapse
      // feeds the match join AND its side's totals, across BOTH
      // report queries, built once per corpus
      val kl = keyCounts(spark, dir, leftGrain._1, leftGrain._2)
        .select(col("k"), col("cnt").as("cl"))
      val kr = keyCounts(spark, dir, rightGrain._1, rightGrain._2)
        .select(col("k"), col("cnt").as("cr"))
      kl.join(kr, "k")
        .select(col("k"), (col("cl") * col("cr")).as("prod"),
          col("cl"), col("cr"))
        .agg(sum(col("prod").cast("decimal(38,0)")).as("est_rows"),
          count(lit(1)).as("n_match_keys"),
          max(struct(col("prod"), col("k"))).as("m"))
        .crossJoin(kl.agg(sum(col("cl")).as("n_left"),
          count(lit(1)).as("d_left")))
        .crossJoin(kr.agg(sum(col("cr")).as("n_right"),
          count(lit(1)).as("d_right")))
        .select(lit(name).as("join_edge"),
          col("n_left").cast("long").as("n_left"),
          col("d_left").cast("long").as("d_left"),
          col("n_right").cast("long").as("n_right"),
          col("d_right").cast("long").as("d_right"),
          col("n_match_keys"),
          col("est_rows").cast("long").as("est_rows"),
          col("m.k").as("top_key"),
          col("m.prod").cast("long").as("top_contrib"))
    }
    Seq(
      edge("lineitem_orders",
        ("lineitem", "l_orderkey"), ("orders", "o_orderkey")),
      edge("lineitem_part",
        ("lineitem", "l_partkey"), ("part", "p_partkey")),
      edge("orders_customer",
        ("orders", "o_custkey"), ("customer", "c_custkey")))
      .reduce(_.unionByName(_))
      .orderBy("join_edge")
  }

  /** #159 OLS price model per brand (closed-form simple regression):
    * l_extendedprice ~ l_quantity fit per p_brand from the five
    * classical sums — n, Σx, Σy, Σxy, Σx², Σy² — every one an EXACT
    * decimal sum of integer-quantized terms (x = quantity, integral
    * by data contract; y = price through the 6 dp unscaled-long
    * kernel, micro-units). slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and
    * intercept = (ΣyΣx²−ΣxΣxy)/(nΣx²−(Σx)²) are evaluated as exact
    * decimal numerators/denominators cast to double for the ONE
    * terminal division (deterministic IEEE on identical operands —
    * never a float accumulation), r² likewise from the same sums.
    *
    * Distributed shape: one lineitem scan, broadcast part dim, one
    * brand-grain hash aggregate with map-side partials (sums are
    * associative decimals) — |brands| output rows at any corpus
    * size; the regression itself is O(1) arithmetic per group. */
  def olsBrand(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    // one-decimal-sum-per-row was 8× the DuckDB twin at ×100 (Spark's
    // Sum over >18-digit decimals leaves the long fast path); every
    // per-row term here FITS a long, so all seven sums ride the
    // codegen 128-bit kernel. y² alone would overflow (micro-units²,
    // ~10²² for a 10⁵ price), so it is split against base 10⁶ —
    // y = a·10⁶ + b ⇒ Σy² = Σa²·10¹² + Σ2ab·10⁶ + Σb², three
    // long-summable components recombined in decimal at GROUP grain
    // (|brands| rows — free). Identical exact integers either way.
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("x"),
        Num.unscaled6(col("l_extendedprice")).as("y"))
      .withColumn("a", expr("y div 1000000")) // integral long division
      .withColumn("b", col("y") % lit(1000000L))
    // distinct collapse on the dim BEFORE the join (the co_occurrence
    // lesson): a duplicated dim (replayed load, or the multiplied
    // bench corpus) would otherwise fan every fact row out per copy —
    // on a unique dim the collapse is a broadcast-sized no-op
    val p = Tables.load(spark, dir, "part")
      .select("p_partkey", "p_brand").distinct()
    // Σ(long)/10⁶ as exact decimal(38,6) — rescale to the raw
    // integer sum at group grain
    def s128(c: Column): Column =
      (Num.dsum128Raw(c) * lit(1000000L)).cast(dec)
    val sums = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        s128(col("x")).as("sx"),
        s128(col("y")).as("sy"),
        s128(col("x") * col("y")).as("sxy"),
        s128(col("x") * col("x")).as("sx2"),
        ((s128(col("a") * col("a")) * lit(1000000L) * lit(1000000L))
          .cast(dec)
          + (s128(col("a") * col("b") * 2) * lit(1000000L)).cast(dec)
          + s128(col("b") * col("b"))).cast(dec).as("sy2"))
    sums.select(col("p_brand"), col("n"),
        // numerators/denominator exact in decimal, ONE double divide
        (col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
          .as("num"),
        (col("n").cast(dec) * col("sx2") - col("sx") * col("sx"))
          .as("den"),
        (col("sy") * col("sx2") - col("sx") * col("sxy")).as("inum"),
        (col("n").cast(dec) * col("sy2") - col("sy") * col("sy"))
          .as("sst"))
      .select(col("p_brand"), col("n"),
        round(col("num").cast("double") / col("den").cast("double")
          / 1e6, 6).as("slope"),
        round(col("inum").cast("double") / col("den").cast("double")
          / 1e6, 6).as("intercept"),
        round((col("num").cast("double") / col("den").cast("double"))
          * (col("num").cast("double") / col("sst").cast("double")), 6)
          .as("r2"))
      .orderBy("p_brand")
  }

  /** Revenue band width for [[abcAnalysis]]'s two-level cumulative
    * sum (10⁴ dollars in micro-units): bands are monotone in revenue,
    * so (band desc, revenue desc, key asc) ≡ the global order. */
  val AbcBandUs = 10000000000L

  /** #167 ABC / Pareto analysis of part revenue: parts ranked by
    * revenue, classed A (cumulative share ≤ 80%), B (≤ 95%), C —
    * the inventory-concentration report ("which 20% of the catalog
    * is 80% of revenue").
    *
    * Per-part revenue is one key-grain 128-bit-long aggregate; the
    * cumulative sum over the revenue-ranked catalog is TWO-LEVEL
    * (the #126/#155 decomposition over monotone revenue bands —
    * block-local running sums + band-total offsets), so no task ever
    * sorts the whole catalog; class thresholds are exact decimal
    * cross-multiplications (5·cum ≤ 4·total etc. — never a float
    * share compare). The single-window form is the oracle. */
  def abcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val rev = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        Num.unscaled6(col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .as("rev_u"))
      .groupBy("l_partkey")
      .agg((Num.dsum128Raw(col("rev_u")) * lit(1000000L)).cast("long")
        .as("rev"))
      .withColumn("band", expr(s"rev div $AbcBandUs"))
    val wLoc = Window.partitionBy("band")
      .orderBy(col("rev").desc, col("l_partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the band table is |bands|-row bounded: partitionBy(lit(0))
    // names the intended single partition (documentation only — the
    // WindowExec warning survives constant folding, ADVICE r21), and
    // `total` rides it as a wN-style whole-set sum —
    // round 21: the previous `rev.agg(sum).head()` driver action ran
    // a SECOND full lineitem aggregate job per call (JobProfile:
    // two identical ~530 taskMs scan+agg jobs) just to fetch one
    // scalar the offsets table already knows. Σ band-totals of exact
    // longs ≡ the global sum, so every value is unchanged.
    val wBand = Window.partitionBy(lit(0)).orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(0))
    val offsets = rev.groupBy("band").agg(sum(col("rev")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wBand), lit(0L)))
      .withColumn("total", sum(col("btot")).over(wAll))
      .select("band", "off", "total")
    rev.withColumn("lcum", sum(col("rev")).over(wLoc))
      .join(broadcast(offsets), "band")
      .withColumn("cum", col("lcum") + col("off"))
      .withColumn("abc_class",
        when(col("cum").cast(dec) * 5 <= col("total").cast(dec) * 4, "A")
          .when(col("cum").cast(dec) * 20 <= col("total").cast(dec) * 19,
            "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("rev")).cast("double") / 1e6, 6).as("revenue"),
        round(sum(col("rev")).cast("double") /
          max(col("total")).cast("double"), 6).as("share"))
      .orderBy("abc_class")
  }

  /** #171 Chi-square independence test — market segment × order
    * priority contingency: is the priority mix independent of the
    * customer segment? Counts and marginals are exact integers; each
    * cell's (n−e)²/e term — e = r·c/N a deterministic double of
    * three exact longs — is 9 dp-quantized before the exact decimal
    * sum (the psi discipline), one terminal 6 dp round. One fact
    * scan + broadcast distinct dim join + a |segments|×|priorities|
    * cell aggregate; everything after the cells is free at any
    * corpus size. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment").distinct()
    val cells = Tables.load(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rTot = cells.groupBy("seg").agg(sum(col("n")).as("r"))
    val cTot = cells.groupBy("prio").agg(sum(col("n")).as("c"))
    val n = cells.agg(sum(col("n"))).head().getLong(0)
    val terms = cells.join(broadcast(rTot), "seg")
      .join(broadcast(cTot), "prio")
      .withColumn("e",
        (col("r") * col("c")).cast("double") / lit(n.toDouble))
      .withColumn("t", round((col("n").cast("double") - col("e"))
        * (col("n").cast("double") - col("e")) / col("e"), 9)
        .cast("decimal(28,9)"))
    terms.agg(
        countDistinct(col("seg")).as("n_segments"),
        countDistinct(col("prio")).as("n_priorities"),
        round(sum(col("t")).cast("double"), 6).as("chi2"))
      .select(lit(n).as("n_obs"), col("n_segments"),
        col("n_priorities"),
        ((col("n_segments") - 1) * (col("n_priorities") - 1)).as("dof"),
        col("chi2"))
  }

  /** Snapshot instant for [[backlogAging]]: the corpus midpoint
    * keeps both open and shipped orders populated at any SF. */
  /** #212 Order-backlog aging snapshot — "as of date D, which orders
    * are not yet fully shipped, and how old are they": the
    * fulfillment-backlog report a commerce warehouse serves beside
    * #168's completed-lag SLA. An order is OPEN at D iff it was
    * placed on/before D and has at least one line shipping after D;
    * aged into integer 7-day buckets of D − orderdate, with open
    * line counts and exact decimal open value.
    *
    * Point-in-time correctness without a time-travel store: shipdate
    * > D membership is evaluated per LINE and collapsed to order
    * grain with conditional aggregates (one fact⋈fact equi-join on
    * the order key — hash at scale), never by filtering the order
    * table alone. D derives deterministically from the corpus — the
    * integer epoch-day midpoint of the order-date RANGE,
    * (min+max) div 2 (NOT a median: on a non-uniform date
    * distribution the two differ; the range midpoint is chosen
    * because it needs only the min/max bounds probe) — so both
    * engines compute the identical instant. */
  def backlogAging(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) div 86400000000").as("oday"))
      .localCheckpoint() // pinned: bounds probe + the join
    val d = o.agg(expr("(min(oday) + max(oday)) div 2")).head().getLong(0)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("unix_micros(l_shipdate) div 86400000000").as("sday"),
        Num.unscaled6(col("l_extendedprice")).as("pu"))
    o.filter(col("oday") <= d)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderpriority", "oday")
      .agg(sum((col("sday") > d).cast("long")).as("open_lines"),
        Num.dsum128Raw(when(col("sday") > d, col("pu"))
          .otherwise(lit(null))).as("open_dec"))
      .filter(col("open_lines") > 0)
      .groupBy(col("o_orderpriority"),
        expr(s"(${d}L - oday) div 7").as("age_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("open_lines")).as("open_lines"),
        round(sum(col("open_dec")).cast("double"), 6).as("open_value"))
      .orderBy("o_orderpriority", "age_bucket")
  }

  /** #210 Frequent 3-itemsets — top part TRIPLES by order support
    * (association mining one level above #143's pairs; distinct from
    * #166's triangles, which count pairwise co-occurrence closures —
    * a frequent triple requires all three in ONE basket): per order,
    * C(basket, 3) triples from the DISTINCT collapse — cost
    * Σ C(b,3), bounded by basket size cubed over orders, never
    * catalog³; deterministic top-20. */
  def itemset3(spark: SparkSession, dir: String): DataFrame = {
    // Round 22 (VERDICT r21 #5, guide §3/§4): the triple self-join
    // hashed the basket collapse three ways and probed the
    // C(basket,2)-scale intermediate twice to emit each C(basket,3)
    // triple. One basket-grain aggregate + the Combinations3 kernel
    // generates the same ordered triples IN-STAGE (sorted distinct
    // parts per order → every pa < pb < pc triple exactly once —
    // join-identical by construction), so the only exchanges left
    // are the basket collapse and the final support aggregate.
    // Basket arrays are order-line bounded (single digits), so the
    // per-row C(b,3) materialization is trivially bounded too.
    val lines = Components.basketLines(spark, dir)
    val baskets = lines.groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_partkey"))).as("parts"))
    val triples = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.expressions.Combinations3(
        org.apache.spark.sql.GraftSqlBridge.expression(col("parts"))))
    baskets.select(explode(triples).as("t"))
      .select(col("t.a").as("pa"), col("t.b").as("pb"),
        col("t.c").as("pc"))
      .groupBy("pa", "pb", "pc")
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("pa").asc, col("pb").asc,
        col("pc").asc)
      .limit(20)
  }

  /** #208 Order-invariant table fingerprint — one row per table:
    * row count plus a content checksum that any engine can recompute
    * and compare (replication / migration / backup verification —
    * the cheap "are these two copies the same table?" handshake, the
    * whole-table cousin of #158's row-level diff).
    *
    * Checksum = Σ over rows of the portable md5 tail-32 of the row's
    * canonical string (every column length-prefixed via [[canonField]]
    * and '|'-joined), summed as plain longs — ADDITION is
    * commutative, so the fingerprint is independent of row order,
    * partitioning and engine. Canonicalization pins the fragile
    * spots: timestamps via unix_micros (never engine string
    * formats), doubles via the 6 dp decimal cast; NULL fields render
    * as the explicit marker 'N' (Spark's concat_ws silently SKIPS
    * nulls and SQL '||' nullifies the whole row — either would make
    * the two engines disagree the moment any field is NULL), and the
    * length prefix makes a '|' inside text/props unable to alias a
    * field boundary. Row-linear, one
    * map-side-combinable aggregate per table, all three tables ONE
    * unioned lazy plan. */
  /** NULL-safe, boundary-proof canonical rendering of one field:
    * `<char-length>:<string-value>`, NULL → the marker `N`. Shared by
    * the batch fingerprint, the streaming twin
    * (EventStream.fingerprintFeed) and the DuckDB oracle
    * (SparkEntry.canonFieldSql), which must stay character-identical. */
  def canonField(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull, lit("N"))
      .otherwise(concat(length(s).cast("string"), lit(":"), s))
  }

  /** The fingerprint's full canonical row for the events feed —
    * shared with the streaming twin so batch and stream can never
    * drift. */
  def eventCanon: Column =
    concat_ws("|", canonField(col("event_id")),
      canonField(unix_micros(col("ts"))), canonField(col("user_id")),
      canonField(col("event_type")),
      canonField(Num.unscaled6(col("value"))), canonField(col("props")))

  def tableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    def fp(name: String, canon: DataFrame): DataFrame =
      canon
        .select(conv(substring(md5(col("canon")), 25, 8), 16, 10)
          .cast("long").as("h"))
        // exact decimal sum (a plain long Σ overflows at ~10¹² rows),
        // published mod 1e9+7 so the fingerprint is a plain bigint
        .agg(count(lit(1)).as("n_rows"),
          expr("cast(sum(cast(h as decimal(38,0))) % 1000000007" +
            " as bigint)").as("checksum"))
        .select(lit(name).as("table"), col("n_rows"), col("checksum"))
    val ev = Tables.load(spark, dir, "events").select(eventCanon.as("canon"))
    val ords = Tables.load(spark, dir, "orders")
      .select(concat_ws("|", canonField(col("o_orderkey")),
        canonField(col("o_custkey")), canonField(col("o_orderstatus")),
        canonField(Num.unscaled6(col("o_totalprice"))),
        canonField(unix_micros(col("o_orderdate"))),
        canonField(col("o_orderpriority"))).as("canon"))
    val docs = Tables.load(spark, dir, "documents")
      .select(concat_ws("|", canonField(col("doc_id")),
        canonField(col("text")), canonField(col("lang")),
        canonField(col("source")), canonField(col("n_chars")))
        .as("canon"))
    fp("documents", docs)
      .unionByName(fp("events", ev))
      .unionByName(fp("orders", ords))
      .orderBy("table")
  }

  /** #197 Mutual information of the segment × priority contingency —
    * the dependence MAGNITUDE beside #171's χ² significance test
    * (and the feature-selection score ML pipelines rank categorical
    * features by): MI = Σ (n_xy/N)·ln(n_xy·N/(r_x·c_y)) in nats,
    * with the per-cell pointwise MI reported beside the total.
    *
    * Exactness: every ratio operand is an exact integer; ln applied
    * to ONE deterministic double ratio per cell; each MI term
    * 9 dp-quantized before the exact decimal sum (the drift_psi
    * discipline), total rounded 6 dp. Same one-scan + broadcast-dim
    * + |cells| shape as [[chiSquare]]. */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment").distinct()
    val cells = Tables.load(spark, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rTot = cells.groupBy("seg").agg(sum(col("n")).as("r"))
    val cTot = cells.groupBy("prio").agg(sum(col("n")).as("c"))
    val n = cells.agg(sum(col("n"))).head().getLong(0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    cells.join(broadcast(rTot), "seg")
      .join(broadcast(cTot), "prio")
      .withColumn("pmi",
        log((col("n").cast("double") * lit(n.toDouble))
          / (col("r") * col("c")).cast("double")))
      .withColumn("term9",
        round(col("n").cast("double") / lit(n.toDouble) * col("pmi"), 9)
          .cast("decimal(28,9)"))
      .withColumn("mi_nats",
        round(sum(col("term9")).over(wAll).cast("double"), 6))
      .select(col("seg"), col("prio"), col("n"),
        round(col("pmi"), 6).as("pmi"), col("mi_nats"))
      .orderBy("seg", "prio")
  }

  /** #168 Shipping-lag SLA report: order-date → ship-date lag in
    * whole days per order priority — n, min/max, exact interpolated
    * p50/p90 (the #39 percentile contract), and the exact-integer
    * mean. One fact⋈fact equi-join on the order key (broadcast at
    * small SF, sort-merge at scale), |priorities| output rows. The
    * percentiles route through [[Pctl.grouped]] (VERDICT r13 #1) —
    * one-agg exact below the size gate, blocked-exact above it (the
    * lag re-read re-runs the equi-join, trading a second pruned pass
    * for O(block) task memory — the right side of that trade at any
    * hot-priority cardinality). */
  def shipLag(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val lagged = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days",
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
    val pc = Pctl.grouped(lagged, Seq("o_orderpriority"), col("lag_days"),
        Seq(0.5, 0.9), Seq("plo", "phi"),
        Pctl.key(dir, "lineitem", "ship_lag"))
      .select(col("o_orderpriority"),
        round(col("plo"), 6).as("p50_days"),
        round(col("phi"), 6).as("p90_days"))
    lagged
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        min(col("lag_days")).as("min_days"),
        max(col("lag_days")).as("max_days"),
        // exact integer sum, one terminal double division
        round(sum(col("lag_days")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_days"))
      .join(broadcast(pc), "o_orderpriority")
      .select(col("o_orderpriority"), col("n"), col("min_days"),
        col("max_days"), col("p50_days"), col("p90_days"),
        col("avg_days"))
      .orderBy("o_orderpriority")
  }
}

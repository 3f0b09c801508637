package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-set export operators (SURVEY.md §2 L) — the last mile of
  * a 100 TB curation pipeline, where a cleaned corpus becomes the
  * artifact a training job actually consumes: leakage-safe splits,
  * a rebalanced source mix, and deterministically shuffled shards.
  *
  * Everything here is a pure function of row identity (Knuth
  * multiplicative hashes / md5-affine keys — the same portable-hash
  * toolkit as [[Sampling]] and the LSH oracles), never of an RNG
  * stream or partition layout: the exported dataset is bit-identical
  * on every run, engine, and cluster size, which is what makes a
  * training run reproducible and an oracle comparison possible.
  */
object TrainExport {

  // ---------------------------------------------------------------
  // #121 leakage-safe cluster split
  // ---------------------------------------------------------------

  /** #121 Leakage-safe train/val/test split: assignment at near-dup
    * CLUSTER granularity, not document granularity. A naive per-doc
    * hash split leaks—two near-duplicate documents land in train and
    * test and the eval set is contaminated (the decontamination
    * problem, self-inflicted). Here the unit of assignment is the
    * connected component of the near-dup graph
    * ([[Components.dedupComponents]]'s fixed point), and the split is
    * a pure hash of the component id, so EVERY member of a dup
    * cluster — and therefore every pair of near-duplicates — shares
    * one split by construction.
    *
    * Scale: the components fixed point is the O(rounds × |E|)
    * min-label propagation already audited at #75; the split label
    * adds a per-row projection on top. No new shuffle beyond the
    * component computation itself. */
  def clusterSplit(spark: SparkSession, dir: String): DataFrame =
    Components.nearDupComponents(spark, dir)
      .select(col("id").as("doc_id"), col("comp").as("comp_id"),
        Sampling.splitLabel(col("comp")).as("split"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // #122 deterministic corpus shuffle + shard export
  // ---------------------------------------------------------------

  val ShuffleSeed = 42L
  val NumShards = 8

  /** Seeded pseudorandom permutation key: md5 of "seed:id", tail 8
    * hex chars as a long — the engine-portable 32-bit hash the LSH
    * oracles established (`conv(substr(md5(x),25,8),16,10)` in Spark
    * ≡ `('0x'||substr(md5(x),25,8))::UBIGINT` in DuckDB). Changing
    * the seed yields an independent permutation; the same seed
    * yields the same corpus order everywhere. */
  private def shuffleKey(id: Column, seed: Long): Column =
    conv(substring(md5(concat_ws(":", lit(seed), id)), 25, 8), 16, 10)
      .cast("long")

  /** Scratch root for the exported shards (a derived artifact,
    * rewritten on every call — the write IS the operator). */
  private def shardRoot(dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_shuffle_${graft.sources.StagePath.key(dir)}").getPath

  /** #122 Deterministic corpus shuffle + balanced shard export, with
    * the round trip verified: a training job wants the corpus in
    * pseudorandom order (no crawl/source runs — a locality-ordered
    * corpus biases every gradient step early in an epoch) and cut
    * into shards a dataloader can stream independently.
    *
    *  - order: the seeded md5-affine [[shuffleKey]] — a reproducible
    *    permutation, NOT `rand()` (partition-layout dependent) and
    *    NOT `repartition` round-robin (cluster-size dependent);
    *  - shard = key mod [[NumShards]]: hash-balanced, and a doc's
    *    shard is a pure function of (seed, doc_id);
    *  - position within shard: row_number over the key order —
    *    computed BEFORE the write and persisted into the files, so
    *    the on-disk shards carry their own ordering contract;
    *  - layout: `partitionBy(shard)` directory tree (one directory
    *    per shard, the same partitioned-table layout AppendSink
    *    uses), rows within each shard file sorted by key.
    *
    * The returned summary is computed FROM THE WRITTEN FILES — shard
    * sizes, exact char totals, and a position-weighted checksum
    * Σ pos·(doc_id mod 1000003) that any reordering, loss, or
    * duplication of rows breaks. The DuckDB oracle recomputes the
    * closed form from the source table, so a hash match certifies
    * the whole write→read round trip, ordering included.
    *
    * Scale: one window per shard (parallel across shards — there is
    * no global row_number), one partitioned write. At 100 TB the
    * shard count rises with the corpus (shards of ~1 GB), the shape
    * is unchanged. */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame = {
    val root = shardRoot(dir)
    val perShard = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        shuffleKey(col("doc_id"), ShuffleSeed).as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(NumShards.toLong)))
      .withColumn("pos", row_number().over(perShard).cast("long"))
      .repartition(col("shard"))
      // (shard, skey): satisfies the dynamic-partition writer's
      // required shard sort (which it would otherwise re-add, with
      // no stability guarantee over skey) AND fixes the in-file key
      // order by construction
      .sortWithinPartitions("shard", "skey")
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    spark.read.parquet(root)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("pos") * pmod(col("doc_id"), lit(1000003L)))
          .as("ord_checksum"))
      .orderBy("shard")
  }

  // ---------------------------------------------------------------
  // #123 temperature-weighted language mix
  // ---------------------------------------------------------------

  /** Mix target: half the corpus. */
  val MixFraction = 0.5
  /** Membership-threshold resolution (rates quantized to 1e-6). */
  val MixScale = 1000000L

  /** Decorrelated full-width sampling key reduced to [0, MixScale) —
    * [[Sampling.sampleBucket]]'s multiplier (NOT the split hash's:
    * mixing must compose independently with train/val/test
    * assignment), full 1e9+7 width first so the mod-1e6 reduction
    * stays uniform. */
  private def mixKey(id: Column): Column =
    pmod(pmod(pmod(id, lit(1000000007L)) * lit(2246822519L),
      lit(1000000007L)), lit(MixScale))

  /** #123 Temperature-weighted language mixing (α = 0.5): the
    * standard multilingual-pretraining rebalance — sampling weights
    * w_l ∝ n_l^α flatten the head (English downsampled hardest)
    * while preserving rank, and the realized mix hits a target
    * budget of [[MixFraction]]·N documents in expectation.
    *
    * Determinism contract: the per-language keep rate collapses to
    * an INTEGER threshold in [0, 1e6] — `floor(min(1, T·w_l/n_l)
    * ·1e6)` — compared against the integer [[mixKey]], so membership
    * never tests raw floating point. The only float inputs are
    * sqrt(n) (IEEE-correctly-rounded in both engines) rounded to 6
    * dp BEFORE the exact decimal(18,6) sum (partition-order
    * independent, the [[Num]] discipline), so the threshold — and
    * therefore the kept set — is bit-identical in Spark and DuckDB.
    *
    * Scale: two scans (one to count languages — a |langs|-row
    * broadcast model — one to filter) and a per-language summary
    * aggregate; membership is a per-row projection. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val perLang = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_lang"),
        round(sqrt(count(lit(1)).cast("double")), 6)
          .cast("decimal(18,6)").as("w_raw"))
    val totals = perLang.agg(
      sum(col("n_lang")).as("n_total"),
      sum(col("w_raw")).cast("double").as("w_sum"))
    val rates = perLang.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_lang"),
        floor(least(lit(1.0),
          floor(col("n_total").cast("double") * lit(MixFraction))
            * col("w_raw").cast("double") / col("w_sum")
            / col("n_lang").cast("double"))
          * lit(MixScale.toDouble)).as("thr"))
    docs.join(broadcast(rates), "lang")
      .filter(mixKey(col("doc_id")) < col("thr"))
      .groupBy(col("lang"))
      .agg(max(col("n_lang")).as("n_lang"), max(col("thr")).as("thr"),
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_checksum"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------
  // #130 balanced token bucketing
  // ---------------------------------------------------------------

  /** Number of inference workers to balance across. */
  val NumBuckets = 16L

  /** #130 Balanced token bucketing — batch-inference scheduling: B
    * workers each get a document set whose TOKEN total is near-equal,
    * so no worker straggles (wall-clock = the max bucket, not the
    * mean). Distinct from [[Packing.packSequences]], which
    * concatenates docs into fixed-budget sequences; this partitions
    * the corpus into B near-equal-cost piles.
    *
    * Assignment is LPT-shaped and deterministic: docs ranked by
    * (token count DESC, doc_id ASC), bucket = snake order over the
    * rank (rank mod 2B folded back), which bounds any two buckets'
    * token totals to within one document of each other per 2B-doc
    * round — the classic round-robin-with-reversal schedule,
    * expressible as pure arithmetic on the rank (no sequential
    * greedy state, so it distributes).
    *
    * The global rank rides the same two-level decomposition as
    * [[Curation.qualityFilter]]: block-local row_number (blocks =
    * token-count ranges, bounded windows) + broadcast cumulative
    * offsets — no single task sorts the corpus. Output is the
    * per-bucket schedule summary; the DuckDB oracle recomputes it
    * with a single global window, verifying the decomposition AND
    * the snake arithmetic. */
  def balanceBuckets(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val t = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCounts(col("text")).getField("ws")
          .cast("long").as("n_tok"))
      .withColumn("blk", floor(col("n_tok") / lit(32L)).cast("long"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("blk").orderBy(col("n_tok").desc, col("doc_id").asc)
    val local = t.withColumn("lrnk", row_number().over(wLocal).cast("long"))
    // single-partition window — deliberately: it runs over the
    // per-BLOCK counts table (≤ max_doc_tokens/32 rows, e.g. ~31k
    // rows even for million-token documents), never over data rows;
    // partitionBy(lit(0)) names that intent (documentation only —
    // the WindowExec warning survives constant folding, ADVICE r21)
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0))
      .orderBy(col("blk").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offsets = t.groupBy("blk").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(wOff), lit(0L)))
      .select("blk", "off")
    val ranked = local.join(broadcast(offsets), "blk")
      .withColumn("rnk", col("off") + col("lrnk") - 1L) // 0-based
    // snake: fold rank mod 2B back onto [0, B): 0..B-1 then B-1..0
    val m = pmod(col("rnk"), lit(2L * NumBuckets))
    val bucket = when(m < NumBuckets, m)
      .otherwise(lit(2L * NumBuckets) - 1L - m)
    ranked.withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        max(col("n_tok")).as("max_doc_tokens"),
        sum(col("rnk") * pmod(col("doc_id"), lit(1000003L)))
          .as("sched_checksum"))
      .orderBy("bucket")
  }

  /** Seed for the [[assignIds]] ordering key. */
  val IdSeed = 101L

  /** #211 User feature-store export — the per-entity wide feature
    * table a churn/LTV model trains on: lifetime span, active-day
    * count, per-type event counts, exact-decimal purchase revenue,
    * recency, and an integer activity-rate ppm.
    *
    * CASCADED aggregation (round 13, VERDICT r12 #7): a direct
    * user-grain `countDistinct(day)` forces Spark's two-phase
    * distinct expansion — every row duplicated into the expand, two
    * full exchanges (measured 4.8× vs DuckDB at ×100). Instead the
    * scan collapses to (user, day) grain first (map-side combinable
    * partials: per-day counts, per-type counts, exact unscaled
    * revenue partial, max instant), and the user-grain pass then
    * counts ROWS for active_days and re-sums the partials — two
    * thin hash aggregates, no expand, both skew-immune. The revenue
    * re-sum is the exact 128-bit micro-unit sum of exact per-day
    * long partials, so the published double is bit-identical to the
    * single-pass decimal sum (the salted phase-1 discipline). */
  def userFeatures(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"unix_micros(ts) div $dayUs").as("day"),
        unix_micros(col("ts")).as("us"), col("value"))
    def nOf(t: String) =
      sum((col("event_type") === t).cast("long")).as(s"n_$t")
    val perDay = ev.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        nOf("click"), nOf("view"), nOf("purchase"), nOf("signup"),
        nOf("error"),
        sum(Num.unscaled6(when(col("event_type") === "purchase",
          col("value")))).as("rev_u"),
        max(col("us")).as("last_us"))
    // recency anchor: a broadcast one-row max over a ts-pruned second
    // scan (VERDICT r14 #5 — no driver action). A/B'd at ×100 against
    // deriving the anchor from a localCheckpoint'd user table: the
    // checkpoint materialization costs MORE than the pruned scan it
    // saves (1.33 s vs 1.05 s), so the broadcast form ships. The
    // whole query sits BELOW the q1_agg bare-scan floor (1.05 vs
    // 1.14 s same session) — no plan work remains.
    val maxUs = ev.agg(max(col("us")).as("__max_us"))
    val users = perDay.groupBy("user_id")
      .agg(sum(col("n_events")).as("n_events"),
        (max(col("day")) - min(col("day")) + 1L).as("lifetime_days"),
        count(lit(1)).as("active_days"),
        sum(col("n_click")).as("n_click"),
        sum(col("n_view")).as("n_view"),
        sum(col("n_purchase")).as("n_purchase"),
        sum(col("n_signup")).as("n_signup"),
        sum(col("n_error")).as("n_error"),
        Num.dsumUnscaled(col("rev_u")).as("purchase_revenue"),
        max(col("last_us")).as("last_us"))
    users
      .crossJoin(broadcast(maxUs))
      .withColumn("recency_days",
        expr(s"(__max_us - last_us) div $dayUs"))
      .withColumn("activity_ppm",
        expr("active_days * 1000000 div lifetime_days"))
      .drop("last_us", "__max_us")
      .orderBy("user_id")
  }

  /** Hashed feature-space width for [[featureHashing]]. */
  val HashBuckets = 64L

  /** #203 Feature hashing (the "hashing trick") — fixed-width
    * featurization of unbounded categorical domains: every
    * (feature, value) pair maps to one of [[HashBuckets]] buckets
    * via the portable md5 hash, so the model's input width is fixed
    * no matter how many users or event types exist. Reported as the
    * bucket-occupancy audit (row mass + DISTINCT source pairs per
    * bucket — the collision count that tells you whether the width
    * is adequate BEFORE training on it).
    *
    * Three features of the event stream: event_type, a 1000-ary
    * user shard, and the 50-wide value bin. All hashing integer/
    * md5-portable; one scan, 3-cell explode, two bounded-grain
    * aggregates. */
  def featureHashing(spark: SparkSession, dir: String): DataFrame = {
    val triples = Tables.load(spark, dir, "events")
      .select(explode(array(
        concat_ws("=", lit("event_type"), col("event_type")),
        concat_ws("=", lit("user_shard"),
          pmod(col("user_id"), lit(1000L))),
        concat_ws("=", lit("value_bin"),
          when(col("value").isNotNull,
            floor(col("value") / 50.0).cast("long"))))).as("fv"))
      .select(col("fv"),
        pmod(conv(substring(md5(col("fv")), 25, 8), 16, 10).cast("long"),
          lit(HashBuckets)).as("bucket"))
    // (bucket, fv) grain first: both outputs derive map-side
    val grain = triples.groupBy("bucket", "fv")
      .agg(count(lit(1)).as("n"))
    grain.groupBy("bucket")
      .agg(sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_values"))
      .select(col("bucket"), col("n_rows"), col("n_values"),
        (col("n_values") > 1L).cast("long").as("has_collision"))
      .orderBy("bucket")
  }

  /** #184 Stable dense-ordinal assignment — distributed zipWithIndex
    * with an append contract: every document gets a gap-free global
    * ordinal 1..N in a deterministic md5-keyed order, and ordinals
    * are assigned base-first (the "already registered" rows, modeled
    * here as doc_id ≢ 0 mod 3) so appending the new batch EXTENDS
    * the sequence — existing ordinals are reproduced bit-identically,
    * never rewritten. The primitive behind stable row ids for
    * training-example references, delta exports, and resumable
    * epoch bookkeeping (Spark's `monotonically_increasing_id` is
    * partition-dependent and neither dense nor stable).
    *
    * The global rank is [[Rank.twoLevelRank]] per cohort (no task
    * sorts the corpus); the new cohort's offset is the base count,
    * broadcast from the rank's own offsets table. */
  def assignIds(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        (pmod(col("doc_id"), lit(3L)) === 0L).cast("long").as("is_new"),
        conv(substring(md5(concat_ws(":", lit(IdSeed), col("doc_id"))),
          25, 8), 16, 10).cast("long").as("skey"))
    // ONE global rank over (is_new, skey, doc_id): base-first order
    // makes the rank ITSELF the ordinal — base rows take 1..n_base
    // and appended rows continue at n_base+1 with no offset join
    // (per-cohort rank + broadcast base count measured 2.84 s at
    // ×100; this form 1.1 s two-level / 0.6 s single-window)
    val order = Seq(col("is_new").asc, col("skey").asc,
      col("doc_id").asc)
    val ranked =
      if (docs.count() <= Rank.SingleTaskMax) {
        // adaptive plan (the scd2_lookup pattern; footer-only count)
        val W = org.apache.spark.sql.expressions.Window
        docs.withColumn("ordinal",
          row_number().over(W.orderBy(order: _*)).cast("long"))
      } else
        Rank.twoLevelRank(docs, Seq.empty,
          (col("is_new") * lit(256L)) + expr("skey div 16777216"),
          blkAscending = true, order, "ordinal", "nn")
    ranked.select("doc_id", "is_new", "ordinal").orderBy("doc_id")
  }
}

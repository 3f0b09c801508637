package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Work-list acquisition connector (SURVEY.md §2 #118) — the
  * reference's external-fetch layer re-expressed as a Spark operator:
  * a sharded ticker work-list fanned out to per-item HTTP pulls with
  * a bare try/except skip
  * (/root/reference/dags/stock_data_to_gcp.py:27-51 — 5 index
  * shards × 100 tickers, `yf.Ticker(...).info` per item,
  * `except: print(...); continue`;
  * /root/reference/dags/news_data_to_gcp.py fetches per-ticker news
  * the same way).
  *
  * Spark-first shape: the work-list is a DataFrame, the fan-out is
  * `repartition(maxConcurrency)` (the reference's hardcoded 5-shard
  * split is a special case), and the per-item imperative fetch loop
  * is `mapPartitions` — the documented last-resort tier, correct
  * here because an external RPC is genuinely per-item imperative
  * side-effecting work no Catalyst expression can model. Everything
  * around the RPC is engine-grade where the reference was ad hoc:
  *
  *  - **Quarantine, not skip**: a failed item becomes a `failed` row
  *    carrying its error and attempt count (the reference loses the
  *    item and prints). Same philosophy as CsvIngest/JsonIngest.
  *  - **Bounded retry with exponential backoff** per item — transient
  *    upstream errors (the dominant yfinance failure mode) are
  *    retried `maxRetries` times before quarantining.
  *  - **Per-partition rate limiting** (token-interval): external APIs
  *    meter per client; `maxConcurrency` × `minIntervalMs` gives a
  *    global request-rate ceiling that holds on any cluster size
  *    because the partition count — not the executor count — bounds
  *    concurrent pullers.
  *  - **Idempotent resume**: `remaining` anti-joins the work-list
  *    against already-acquired keys, so a re-run after a partial
  *    failure fetches only the missing items (compose with
  *    VersionedTable/Backfill for exactly-once landing).
  *
  * The transport is injectable (and the container has no egress), so
  * tests and the oracled `acquire_fetch` query use
  * [[Acquire.arithmeticFake]] — a deterministic closed-form fake
  * whose success/attempt/payload contract DuckDB recomputes exactly;
  * the Spark side still executes the real retry/rate-limit/quarantine
  * machinery to produce those rows. Clock/sleeper are injectable the
  * same way, so specs assert pacing without wall-clock sleeps.
  */
object Acquire {

  /** One fetch attempt for `key` (1-based `attempt`); throw to signal
    * a retryable failure. Implementations must be serializable — the
    * transport ships to executors. */
  trait Transport extends Serializable {
    def fetch(key: Long, attempt: Int): Array[Byte]
  }

  /** Injectable pacing hooks. The default sleeps for real; specs pass
    * a recording no-op so pacing is asserted, not waited on. */
  trait Pacer extends Serializable {
    def sleep(ms: Long): Unit
  }
  object RealPacer extends Pacer {
    def sleep(ms: Long): Unit = if (ms > 0) Thread.sleep(ms)
  }

  /** @param maxConcurrency fetch-partition count — the global
    *   parallel-puller bound (NOT executor count; see scaladoc)
    * @param maxRetries retries after the first attempt (reference's
    *   Airflow `retries: 2` default-arg, applied per item)
    * @param minIntervalMs per-partition floor between request starts
    * @param backoffBaseMs first retry delay; doubles per retry */
  case class Config(
      maxConcurrency: Int = 8,
      maxRetries: Int = 2,
      minIntervalMs: Long = 0L,
      backoffBaseMs: Long = 0L,
      pacer: Pacer = RealPacer)

  /** Outcome row: `status` is `ok` or `failed`; `attempts` counts
    * fetch calls made; `payload` is null iff failed; `error` is the
    * last failure message iff failed. */
  case class Result(key: Long, status: String, attempts: Int,
      payload: Array[Byte], error: String)

  /** Fetch every work-list key through `transport`. One output row
    * per input key, success or not — acquisition never throws for an
    * item failure. `rateWaits`/`backoffWaits` (optional accumulators)
    * observe pacing for specs. */
  def acquire(workList: Dataset[java.lang.Long], transport: Transport,
      cfg: Config, rateWaits: Option[LongAccumulator] = None,
      backoffWaits: Option[LongAccumulator] = None): Dataset[Result] = {
    val spark = workList.sparkSession
    import spark.implicits._
    workList.repartition(cfg.maxConcurrency)
      .mapPartitions { keys =>
        // token-interval limiter: next request starts no sooner than
        // minIntervalMs after the previous one STARTED (request-rate
        // metering, the external-API contract; durations don't earn
        // extra tokens)
        var lastStart = Long.MinValue
        keys.map { boxedKey =>
          val key = boxedKey.longValue()
          var attempt = 0
          var done: Result = null
          while (done == null) {
            attempt += 1
            val now = System.nanoTime() / 1000000L
            val wait = if (lastStart == Long.MinValue) 0L
              else cfg.minIntervalMs - (now - lastStart)
            if (wait > 0) {
              rateWaits.foreach(_.add(wait))
              cfg.pacer.sleep(wait)
            }
            lastStart = math.max(now, lastStart + cfg.minIntervalMs)
            try {
              val bytes = transport.fetch(key, attempt)
              done = Result(key, "ok", attempt, bytes, null)
            } catch {
              case e: Exception if attempt <= cfg.maxRetries =>
                val backoff = cfg.backoffBaseMs << (attempt - 1)
                if (backoff > 0) {
                  backoffWaits.foreach(_.add(backoff))
                  cfg.pacer.sleep(backoff)
                }
              case e: Exception =>
                done = Result(key, "failed", attempt, null,
                  Option(e.getMessage).getOrElse(e.getClass.getName))
            }
          }
          done
        }
      }
  }

  /** Keys still to fetch: the work-list minus already-acquired keys
    * (left anti join — at scale both sides shuffle on `key` only).
    * `acquire(remaining(...), ...)` is the partial-failure resume. */
  def remaining(workList: DataFrame, acquired: DataFrame): DataFrame =
    workList.join(acquired.select("key").distinct(), Seq("key"),
      "left_anti")

  /** Deterministic closed-form fake transport (no egress in the
    * container — same policy as the multimodal decode stubs): key
    * `k` fails `k % 4` times transiently before succeeding, and a
    * success returns `100 + (k % 7) * 13` bytes (content = the key's
    * decimal digits cycled). With `maxRetries = 2`, keys with
    * `k % 4 == 3` exhaust their 3 attempts and quarantine — every
    * field of the output is SQL-recomputable, which is what lets the
    * DuckDB oracle hash-verify the connector's retry/quarantine
    * machinery end-to-end. */
  def arithmeticFake: Transport = new Transport {
    def fetch(key: Long, attempt: Int): Array[Byte] = {
      val transientFailures = (key % 4).toInt
      if (attempt <= transientFailures)
        throw new java.io.IOException(s"transient[$key/$attempt]")
      val n = (100 + (key % 7) * 13).toInt
      val digits = java.lang.Long.toString(key)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      Array.tabulate[Byte](n)(i => digits(i % digits.length))
    }
  }

  /** The oracled `acquire_fetch` query: the BOOTSTRAPPED work list
    * ([[Worklist.workKeys]] — parsed constituent members minus the
    * exclusion list, round 14; the reference feeds
    * `get_top500_companies()` straight into its fetch shards),
    * fetched through the arithmetic fake with the reference's retry
    * budget. Output is the acquisition ledger (status / attempts /
    * payload size), hash-verified by a closed-form DuckDB twin. */
  def acquireFetch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val work = Worklist.workKeys(spark, dir)
      .as[java.lang.Long]
    acquire(work, arithmeticFake, Config(maxConcurrency = 8,
        maxRetries = 2))
      .select(col("key"), col("status"),
        col("attempts").cast("long").as("attempts"),
        when(col("payload").isNotNull, length(col("payload")))
          .cast("long").as("payload_len"))
      .orderBy("key")
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (every key below
  * traces to a numbered inventory row) and §6 (oracle strategy). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Multi-table: fact⋈fact⋈dim⋈broadcast-dims revenue cube. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.joinBroadcast(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A reference pipeline surface
    "ingest_typed" -> (StockOps.ingestTyped _),
    "csv_ingest" -> (graft.sources.CsvIngest.csvIngestQuery _),
    "json_ingest" -> (graft.sources.JsonIngest.jsonIngestQuery _),
    "acquire_fetch" -> (graft.sources.Acquire.acquireFetch _),
    "worklist_bootstrap" -> (graft.sources.Worklist.worklistBootstrap _),
    "alert_feed" -> (graft.pipeline.Alerts.alertFeed _),
    "skew_agg" -> (Skew.skewAgg _),
    "shard_union" -> (StockOps.shardUnion _),
    "append_roundtrip" -> (StockOps.appendRoundtrip _),
    "versioned_commits" -> (graft.sinks.VersionedTable.versionedCommits _),
    "versioned_changes" -> (graft.sinks.VersionedTable.versionedChanges _),
    "cdc_incremental" -> (graft.sinks.VersionedTable.incrementalCdcAgg _),
    "backfill_range" -> (graft.pipeline.Backfill.backfillRange _),
    "bucketed_join" -> (graft.sinks.BucketedWarehouse.bucketedJoin _),
    "zorder_scan" -> (graft.sinks.ZOrderLayout.zorderScan _),
    "snapshot_proj" -> (StockOps.snapshotProjection _),
    "latest_per_key" -> (StockOps.latestPerKey _),
    "fin_ratio" -> (StockOps.finRatio _),
    "fin_statement" -> (StockOps.finStatement _),
    "news_dateparse" -> (StockOps.newsDateParse _),
    "incremental_batch" -> (StockOps.incrementalBatch _),
    "json_extract" -> (StockOps.jsonExtract _),
    "dq_checks" -> (StockOps.dqChecks _),
    "vwap" -> (StockOps.vwap _),
    "ohlc_bars" -> (StockOps.ohlcBars _),
    "merge_upsert" -> (StockOps.mergeUpsert _),
    "multimodal_chunks" -> (Multimodal.multimodalChunks _),
    // §2.B analytics surface
    "q1_agg" -> (Analytics.q1Agg _),
    "filter_scan" -> (Analytics.filterScan _),
    "join_broadcast" -> (Analytics.joinBroadcast _),
    "topk_revenue" -> (Analytics.topkRevenue _),
    "window_tumbling" -> (Analytics.windowTumbling _),
    "semi_anti" -> (Analytics.semiAnti _),
    "asof_join" -> (AsOfJoin.clicksAsOfPurchases _),
    "market_share" -> (Analytics.marketShare _),
    // §2.C LLM-data-pipeline operators
    "dedup_exact" -> (Dedup.exact _),
    "dedup_minhash" -> (Dedup.minhashLshPortable _),
    "dedup_simhash" -> (Dedup.simhashPortable _),
    "ngram_jaccard" -> (Dedup.ngramJaccard _),
    "cosine_pairs" -> (Similarity.cosinePairs _),
    "dedup_embed" -> (Similarity.dedupEmbed _),
    "ann_brute" -> (Similarity.annBrute _),
    "ann_lsh" -> (Similarity.annLsh _),
    "ann_ivf" -> (Similarity.annIvf _),
    "ann_ivf_exact" -> (Similarity.annIvfExact _),
    "ann_indexed" -> (Similarity.annIndexed _),
    "ann_append" -> (Similarity.annAppend _),
    "ann_filtered" -> (Similarity.annFiltered _),
    "ann_quant" -> (Similarity.annQuant _),
    "ann_pq" -> (Similarity.annPq _),
    "ann_ivfpq" -> (Similarity.annIvfPq _),
    "semantic_dedup" -> (Similarity.semanticDedup _),
    "label_centroids" -> (Similarity.labelCentroids _),
    "centroid_assign" -> (Similarity.centroidAssign _),
    // §2.F dedup clustering + keyword search + curation (round 8)
    "dedup_components" -> (Components.dedupComponents _),
    "term_stats" -> (Search.termStats _),
    "bm25_search" -> (Search.bm25Search _),
    "incremental_dedup" -> (Dedup.incrementalDedup _),
    "approx_percentiles" -> (Olap.approxPercentiles _),
    "approx_percentiles_exact" -> (Olap.approxPercentilesExact _),
    "curation_pipeline" -> (Curation.curationPipeline _),
    // §2.G time-series / warehouse / packing (round 9)
    "resample_ffill" -> (TimeSeries.resampleFfill _),
    "anomaly_zscore" -> (TimeSeries.anomalyZscore _),
    "corr_matrix" -> (TimeSeries.corrMatrix _),
    "scd2_dim" -> (Dimensional.scd2Dim _),
    "drawdown" -> (TimeSeries.drawdown _),
    "ewma_smooth" -> (TimeSeries.ewmaSmooth _),
    "funnel_stages" -> (Dimensional.funnelStages _),
    "pack_sequences" -> (Packing.packSequences _),
    "grouping_sets" -> (Olap.groupingSetsAgg _),
    "heavy_hitters" -> (Frequency.heavyHitters _),
    "retention_cohorts" -> (Dimensional.retentionCohorts _),
    "pps_sample" -> (Sampling.ppsSample _),
    "quantile_bins" -> (Olap.quantileBins _),
    "tfidf_docsim" -> (Search.tfidfDocsim _),
    // §2.B OLAP / sequence extensions (round 3)
    "rollup_agg" -> (Olap.rollupAgg _),
    "pivot_wide" -> (Olap.pivotWide _),
    "percentiles" -> (Olap.percentiles _),
    "approx_distinct" -> (Olap.approxDistinct _),
    "sessionize" -> (Sessions.sessionize _),
    "window_lag" -> (Sessions.windowLag _),
    "range_join" -> (Sessions.rangeJoin _),
    "sample_hash" -> (Sampling.hashSplit _),
    "stratified_sample" -> (Sampling.stratifiedSample _),
    "group_cap" -> (Sampling.groupCap _),
    "topk_per_group" -> (Olap.topkPerGroup _),
    "histogram" -> (Olap.histogram _),
    "pii_scrub" -> (TextOps.piiScrub _),
    "lang_id" -> (TextOps.langIdQuery _),
    "quality_score" -> (TextOps.qualityQuery _),
    "token_count" -> (TextOps.tokenCountQuery _),
    "fingerprint" -> (TextOps.fingerprintQuery _),
    "sentiment_docs" -> (TextOps.sentimentDocs _),
    "sentiment_daily" -> (TextOps.sentimentDaily _),
    "chunk_docs" -> (TextOps.chunkDocs _),
    "repetition_score" -> (TextOps.repetitionScore _),
    "contamination" -> (TextOps.contaminationCheck _),
    "contamination_bloom" -> (TextOps.contaminationBloom _),
    "corpus_stats" -> (TextOps.corpusStats _),
    "multimodal_meta" -> (Multimodal.multimodalMeta _),
    "multimodal_features" -> (Multimodal.multimodalFeatures _),
    "multimodal_features_text" -> (Multimodal.multimodalFeaturesText _),
    "multimodal_audio" -> (Multimodal.multimodalAudio _),
    "multimodal_video" -> (Multimodal.multimodalVideo _),
    "bpe_stats" -> (Bpe.bpeStats _),
    // §2.L training-set export (round 12)
    "cluster_split" -> (TrainExport.clusterSplit _),
    "corpus_shuffle" -> (TrainExport.corpusShuffle _),
    "mixture_sample" -> (TrainExport.mixtureSample _),
    "curation_audit" -> (Curation.curationAudit _),
    "quality_filter" -> (Curation.qualityFilter _),
    "gap_report" -> (TimeSeries.gapReport _),
    "asof_tolerance" -> (AsOfJoin.clicksAsOfFresh _),
    "realized_vol" -> (StockOps.realizedVol _),
    "balance_buckets" -> (TrainExport.balanceBuckets _),
    "hybrid_search" -> (Search.hybridSearch _),
    // §2.M robust stats, attribution, linkage, decomposition (round 13)
    "rolling_beta" -> (StockOps.rollingBeta _),
    "paragraph_dedup" -> (TextOps.paragraphDedup _),
    "attribution" -> (Dimensional.attribution _),
    "experiment_stats" -> (Dimensional.experimentStats _),
    "fuzzy_join" -> (Dedup.fuzzyLinkage _),
    "seasonal_decomp" -> (TimeSeries.seasonalDecomp _),
    "robust_outliers" -> (TimeSeries.robustOutliers _),
    "skew_report" -> (Skew.skewReport _),
    "cms_freq" -> (Frequency.cmsFreq _),
    "embed_stats" -> (Similarity.embedStats _),
    "co_occurrence" -> (Analytics.coOccurrence _),
    "ref_audit" -> (Analytics.refAudit _),
    "join_cardinality" -> (Analytics.joinCardinality _),
    "pagerank" -> (Components.pageRank _),
    "trending" -> (StockOps.trendingActivity _),
    "drift_psi" -> (Olap.driftPsi _),
    "funnel_times" -> (Dimensional.funnelTimes _),
    "attribution_linear" -> (Dimensional.attributionLinear _),
    // §2.N statistical quality gates + temporal ops (round 14)
    "gopher_rules" -> (LmFilter.gopherRules _),
    "lm_perplexity" -> (LmFilter.lmPerplexity _),
    "interval_merge" -> (Intervals.intervalMerge _),
    "concurrency_peak" -> (Intervals.concurrencyPeak _),
    "event_transitions" -> (Sessions.eventTransitions _),
    "scd2_lookup" -> (Dimensional.scd2Lookup _),
    "snapshot_diff" -> (Dimensional.snapshotDiff _),
    "ols_brand" -> (Analytics.olsBrand _),
    "column_profile" -> (Olap.columnProfile _),
    "session_paths" -> (Sessions.sessionPaths _),
    "user_growth" -> (Dimensional.userGrowth _),
    "canonical_docs" -> (Components.canonicalDocs _),
    "triangle_count" -> (Components.triangleCount _),
    "abc_analysis" -> (Analytics.abcAnalysis _),
    "ship_lag" -> (Analytics.shipLag _),
    "pmi_collocations" -> (LmFilter.pmiCollocations _),
    "growth_accounting" -> (Dimensional.growthAccounting _),
    "chi_square" -> (Analytics.chiSquare _),
    "frame_sample" -> (Multimodal.frameSample _),
    "purchase_gaps" -> (StockOps.purchaseGaps _),
    "band_migration" -> (StockOps.bandMigration _),
    "dedup_curve" -> (Similarity.dedupCurve _),
    // §2.O segmentation, stats, graph, sampling (round 15)
    "rfm_segments" -> (Dimensional.rfmSegments _),
    "autocorr" -> (TimeSeries.autocorr _),
    "khop_reach" -> (Components.khopReach _),
    "winsorize" -> (Olap.winsorize _),
    "zipf_fit" -> (LmFilter.zipfFit _),
    "lexical_diversity" -> (LmFilter.lexicalDiversity _),
    "session_entry_exit" -> (Sessions.sessionEntryExit _),
    "cusum_alerts" -> (TimeSeries.cusumAlerts _),
    "systematic_sample" -> (Sampling.systematicSample _),
    "assign_ids" -> (TrainExport.assignIds _),
    "random_projection" -> (Similarity.randomProjection _),
    "rp_moments" -> (Similarity.rpMoments _),
    "embed_outliers" -> (Similarity.embedOutliers _),
    "lsh_eval" -> (Dedup.lshEval _),
    "stickiness" -> (Dimensional.stickiness _),
    "item_cf" -> (Analytics.itemCf _),
    "containment" -> (Dedup.containmentPairs _),
    "containment_content" -> (Dedup.containmentContent _),
    "benford_screen" -> (Olap.benfordScreen _),
    "target_encode" -> (Analytics.targetEncode _),
    "novelty_score" -> (TextOps.noveltyScore _),
    "wilson_funnel" -> (Dimensional.wilsonFunnel _),
    "mutual_info" -> (Analytics.mutualInfo _),
    "cube_agg" -> (Olap.cubeAgg _),
    "ltv_curve" -> (Dimensional.ltvCurve _),
    "date_dim" -> (Olap.dateDim _),
    "survival_curve" -> (Dimensional.survivalCurve _),
    "keyword_extract" -> (Search.keywordExtract _),
    "feature_hashing" -> (TrainExport.featureHashing _),
    "text_clean" -> (TextOps.textClean _),
    "balance_downsample" -> (Sampling.balanceDownsample _),
    "heatmap_2d" -> (Olap.heatmap2d _),
    "quality_curve" -> (Curation.qualityCurve _),
    "table_fingerprint" -> (Analytics.tableFingerprint _),
    "itemset_3" -> (Analytics.itemset3 _),
    "user_features" -> (graft.operators.TrainExport.userFeatures _),
    "backlog_aging" -> (Analytics.backlogAging _)
  )

  private val Dec = "decimal(28,6)"
  private def dsum(x: String) = s"cast(sum(cast($x as $Dec)) as double)"

  /** DuckDB twin of Analytics.canonField — length-prefixed canonical
    * field with NULL rendered as the marker 'N'. Must stay
    * character-identical to the Spark side. */
  private def cf(x: String) =
    s"CASE WHEN ($x) IS NULL THEN 'N' ELSE length(cast(($x) AS varchar))" +
      s" || ':' || cast(($x) AS varchar) END"

  /** Exact cosine top-5 per query vector — the oracle for BOTH
    * `ann_brute` and `ann_ivf_exact` (exhaustive IVF degenerates to
    * brute force; see Similarity.annIvfExact). */
  private val AnnExactTopkSql =
    """WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.q_id, e.vec_id AS cand_id,
      |    list_cosine_similarity(q.qv, e.v) AS cos
      |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, cand_id, cos, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, cand_id ASC) AS rnk FROM scored)
      |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
      |  round(cos, 6) AS cos_sim
      |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  /** Portable sign-LSH band keys as SQL CTEs (the DuckDB twin of the
    * PortableSignBandKeys kernel): integer md5-affine hyperplanes
    * (h32('hp|p|j') − 2^31), 6 dp-quantized components via
    * floor(x·10⁶ + 0.5) ≡ Java Math.round, exact integer dot signs.
    * Emits `planes/qcomp/dots/keys`; `keys(vec_id, band, kb)`. */
  private def lshKeysCtes(bands: Int, bits: Int): String =
    s"""planes AS (SELECT p, j,
       |    CAST(('0x' || substr(md5('hp|' || cast(p AS varchar) ||
       |      '|' || cast(j AS varchar)), 25, 8))::UBIGINT AS BIGINT)
       |      - 2147483648 AS w
       |  FROM range(${bands * bits}) rp(p) CROSS JOIN range(64) rj(j)),
       |qcomp AS (SELECT vec_id, j,
       |    CAST(floor(cast(embedding[j + 1] AS double) * 1000000 + 0.5)
       |      AS BIGINT) AS qc
       |  FROM embeddings CROSS JOIN range(64) rj(j)),
       |dots AS (SELECT vec_id, p, sum(qc * w) AS dot
       |  FROM qcomp JOIN planes USING (j) GROUP BY 1, 2),
       |keys AS (SELECT vec_id, p // $bits AS band,
       |    cast(sum(CASE WHEN dot > 0 THEN (1::BIGINT << (p % $bits))
       |      ELSE 0 END) AS BIGINT) AS kb
       |  FROM dots GROUP BY 1, 2)""".stripMargin

  /** The portable Lloyd loop as SQL: seed = 32 rows ordered by the
    * md5 tail-32 of the id string (Similarity.trainCentroidsOf),
    * then `iters` unrolled assign/recompute rounds — assignment
    * argmax on the 6 dp-ROUNDED cosine with c_id tiebreak, means via
    * the exact decimal(28,6) sum / double count (the davg identity
    * the label_centroids oracle already pins). Emits c0..c{iters},
    * each `(c_id, cvec)`; callers read `c$iters`. Requires an `e`
    * CTE of (vec_id, v double[]). */
  private def kmeansCtes(iters: Int, cells: Int): String = {
    val seed =
      s"""c0 AS (SELECT vec_id AS c_id, v AS cvec FROM (
         |  SELECT vec_id, v,
         |    CAST(('0x' || substr(md5(cast(vec_id AS varchar)), 25, 8))
         |      ::UBIGINT AS BIGINT) AS h
         |  FROM e ORDER BY h, vec_id LIMIT $cells))""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""a$i AS (SELECT e.vec_id, e.v, c.c_id,
         |    list_cosine_similarity(e.v, c.cvec) AS cs
         |  FROM e CROSS JOIN c${i - 1} c),
         |b$i AS (SELECT vec_id, v, c_id, row_number() OVER (
         |    PARTITION BY vec_id ORDER BY round(cs, 6) DESC, c_id)
         |    AS rn FROM a$i),
         |m$i AS (SELECT c_id, j,
         |    cast(sum(cast(v[j + 1] AS decimal(28,6))) AS double)
         |      / cast(count(*) AS double) AS m
         |  FROM b$i CROSS JOIN range(64) rj(j) WHERE rn = 1
         |  GROUP BY 1, 2),
         |c$i AS (SELECT c_id, list(m ORDER BY j) AS cvec
         |  FROM m$i GROUP BY 1)""".stripMargin
    }
    (seed +: rounds).mkString(",\n")
  }

  /** The portable PQ training + encoding as SQL CTEs (the DuckDB twin
    * of Similarity.trainedPqCodebooks / pqEncoded / pqQuerySide —
    * round 15): seed = first PqK vectors by the md5 tail-32 id order
    * (shared across all m), then PqIters unrolled L2 Lloyd rounds with
    * the 6 dp-rounded argmax, then the code/LUT layer in EXACT integer
    * micro-units (order-free sums). Emits `sub/ph/pq0..pq{iters}/pcn/
    * pcode/enc/plut/qn`; requires an `e` CTE of (vec_id, v double[]).
    * Names are disjoint from kmeansCtes' so ann_ivfpq composes both. */
  private def pqCtes: String = {
    val S = graft.operators.Similarity
    val M = S.PqM; val K = S.PqK; val sd = S.PqSubDim; val it = S.PqIters
    val head =
      s"""sub AS (SELECT vec_id, m,
         |    list_slice(v, m * $sd + 1, m * $sd + $sd) AS sv
         |  FROM e CROSS JOIN range($M) rm(m)),
         |ph AS (SELECT vec_id, row_number() OVER (ORDER BY
         |    CAST(('0x' || substr(md5(cast(vec_id AS varchar)), 25, 8))
         |      ::UBIGINT AS BIGINT), vec_id) - 1 AS cid FROM e),
         |pq0 AS (SELECT s.m, p.cid, s.sv AS cvec
         |  FROM sub s JOIN ph p USING (vec_id) WHERE p.cid < $K)""".stripMargin
    val rounds = (1 to it).map { i =>
      s"""pa$i AS (SELECT s.vec_id, s.m, s.sv, c.cid,
         |    round(list_dot_product(s.sv, c.cvec)
         |      - list_dot_product(c.cvec, c.cvec) / 2.0, 6) AS sc
         |  FROM sub s JOIN pq${i - 1} c USING (m)),
         |pb$i AS (SELECT vec_id, m, sv, cid, row_number() OVER (
         |    PARTITION BY vec_id, m ORDER BY sc DESC, cid) AS rn
         |  FROM pa$i),
         |pm$i AS (SELECT m, cid, j,
         |    cast(sum(cast(sv[j + 1] AS decimal(28,6))) AS double)
         |      / cast(count(*) AS double) AS mu
         |  FROM pb$i CROSS JOIN range($sd) rj(j) WHERE rn = 1
         |  GROUP BY 1, 2, 3),
         |pq$i AS (SELECT m, cid, list(mu ORDER BY j) AS cvec
         |  FROM pm$i GROUP BY 1, 2)""".stripMargin
    }
    val enc =
      s"""pcn AS (SELECT m, cid, cvec,
         |    list_dot_product(cvec, cvec) AS cn2,
         |    CAST(round(list_dot_product(cvec, cvec) * 1000000)
         |      AS BIGINT) AS cn2i
         |  FROM pq$it),
         |pea AS (SELECT s.vec_id, s.m, c.cid, c.cn2i,
         |    round(list_dot_product(s.sv, c.cvec) - c.cn2 / 2.0, 6) AS sc
         |  FROM sub s JOIN pcn c USING (m)),
         |peb AS (SELECT vec_id, m, cid, cn2i, row_number() OVER (
         |    PARTITION BY vec_id, m ORDER BY sc DESC, cid) AS rn
         |  FROM pea),
         |pcode AS (SELECT vec_id, m, cid FROM peb WHERE rn = 1),
         |enc AS (SELECT vec_id, sum(cn2i) AS rnorm2i
         |  FROM peb WHERE rn = 1 GROUP BY 1),
         |plut AS (SELECT s.vec_id AS q_id, s.m, c.cid,
         |    CAST(round(list_dot_product(s.sv, c.cvec) * 1000000)
         |      AS BIGINT) AS lv
         |  FROM sub s JOIN pcn c USING (m) WHERE s.vec_id < 8),
         |qn AS (SELECT vec_id AS q_id, sqrt(list_dot_product(v, v)) AS qn
         |  FROM e WHERE vec_id < 8)""".stripMargin
    (head +: rounds :+ enc).mkString(",\n")
  }

  /** ADC scan → shortlist → exact re-rank as SQL, over a candidate
    * CTE named `icand(q_id, cand_id)` — shared by the ann_pq (full
    * corpus) and ann_ivfpq (probed cells) oracles. The ADC sum, its
    * /1e6 unscale and the qn·√rnorm2 denominator replay pqRank's
    * exact op order; the shortlist ranks on the 6 dp-rounded approx
    * with NULLS LAST (degenerate rnorm2/qn rows sort behind). */
  private def pqRankSql: String = {
    val S = graft.operators.Similarity
    s"""adc AS (SELECT ic.q_id, ic.cand_id, sum(l.lv) AS adci
       |  FROM icand ic JOIN pcode pc ON pc.vec_id = ic.cand_id
       |  JOIN plut l ON l.q_id = ic.q_id AND l.m = pc.m
       |    AND l.cid = pc.cid
       |  GROUP BY 1, 2),
       |appr AS (SELECT a.q_id, a.cand_id,
       |    CASE WHEN en.rnorm2i > 0 AND q.qn > 0 THEN
       |      round((cast(a.adci AS double) / 1000000.0)
       |        / (q.qn * sqrt(cast(en.rnorm2i AS double) / 1000000.0)),
       |        6)
       |    END AS approx
       |  FROM adc a JOIN enc en ON en.vec_id = a.cand_id
       |  JOIN qn q ON q.q_id = a.q_id),
       |shortl AS (SELECT q_id, cand_id FROM (SELECT q_id, cand_id,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY approx DESC NULLS LAST, cand_id) AS srn
       |  FROM appr) WHERE srn <= ${S.PqShortlist}),
       |rer AS (SELECT s.q_id, s.cand_id,
       |    round(list_cosine_similarity(a.v, b.v), 6) AS cos
       |  FROM shortl s JOIN e a ON a.vec_id = s.q_id
       |  JOIN e b ON b.vec_id = s.cand_id),
       |rr AS (SELECT q_id, cand_id, cos, row_number() OVER (
       |    PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rnk
       |  FROM rer)""".stripMargin
  }

  /** The trained-IVF assignment + adaptive probe as SQL, over
    * kmeansCtes' final `c{iters}` centroids — shared by the ann_ivf
    * and ann_ivfpq oracles. Emits `fa/iasg/qp/iprobes`; every rank,
    * best-cell anchor and margin compare is on the 6 dp-rounded
    * centroid cosine (ivfSearch's round-15 discipline). */
  private def ivfProbeCtes: String = {
    val S = graft.operators.Similarity
    s"""fa AS (SELECT e.vec_id, c.c_id,
       |    list_cosine_similarity(e.v, c.cvec) AS cs
       |  FROM e CROSS JOIN c${S.IvfKmeansIters} c),
       |iasg AS (SELECT vec_id, c_id AS cell FROM (
       |    SELECT vec_id, c_id, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY round(cs, 6) DESC, c_id)
       |      AS rn FROM fa) WHERE rn <= ${S.IvfAssign}),
       |qp AS (SELECT vec_id AS q_id, c_id, round(cs, 6) AS cs6,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY round(cs, 6) DESC, c_id) AS rn,
       |    max(round(cs, 6)) OVER (PARTITION BY vec_id) AS best
       |  FROM fa WHERE vec_id < 8),
       |iprobes AS (SELECT q_id, c_id AS cell FROM qp
       |  WHERE rn <= ${S.IvfProbe}
       |    OR (cs6 >= best - ${S.IvfProbeMargin}
       |        AND rn <= ${S.IvfProbeMax}))""".stripMargin
  }

  /** The near-dup connected-components fixed point (blocked
    * trigram-Jaccard edges ≥ 0.5, min-label recursive closure) up to
    * `c(id, comp)` — shared by the `dedup_components` oracle and the
    * `cluster_split` oracle, which assigns train/val/test on top of
    * the SAME component ids. */
  private val NearDupComponentsCte =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, lang, source, n_chars, n_chars // 20 AS blk,
      |    list_distinct(list_transform(
      |      range(greatest(length(lower(text)) - 2, 0)),
      |      i -> substr(lower(text), cast(i + 1 AS int), 3))) AS grams
      |  FROM documents),
      |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
      |    CASE WHEN len(x.grams) + len(y.grams)
      |              - len(list_intersect(x.grams, y.grams)) > 0
      |      THEN cast(len(list_intersect(x.grams, y.grams)) AS double)
      |        / cast(len(x.grams) + len(y.grams)
      |               - len(list_intersect(x.grams, y.grams)) AS double)
      |      ELSE 0.0 END AS jac
      |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
      |    AND abs(x.blk - y.blk) <= 1 AND x.doc_id < y.doc_id
      |    AND abs(x.n_chars - y.n_chars) <= 20),
      |e AS (SELECT a, b FROM p WHERE jac >= 0.5),
      |sym AS (SELECT a AS src, b AS dst FROM e
      |  UNION ALL SELECT b AS src, a AS dst FROM e),
      |r AS (
      |  SELECT doc_id AS id, doc_id AS comp FROM documents
      |  UNION
      |  SELECT s.dst AS id, r.comp AS comp
      |  FROM r JOIN sym s ON s.src = r.id WHERE r.comp < s.dst),
      |c AS (SELECT id, min(comp) AS comp FROM r GROUP BY id)""".stripMargin

  private val ContaminationSql =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |      x -> x <> '') AS toks
      |  FROM documents),
      |s AS (SELECT doc_id,
      |    unnest([array_to_string(list_slice(toks, i + 1, i + 8), ' ')
      |      for i in range(len(toks) - 7)]) AS sh
      |  FROM t),
      |b AS (SELECT DISTINCT sh FROM s WHERE doc_id < 50),
      |c AS (SELECT DISTINCT doc_id, sh FROM s WHERE doc_id >= 50)
      |SELECT c.doc_id, count(*) AS n_shared
      |FROM c JOIN b USING (sh) GROUP BY 1 ORDER BY 1""".stripMargin

  // EWMA twin assembled from the SAME Scala-computed weight doubles
  // the operator folds (shortest-round-trip literals parse back to
  // identical doubles in DuckDB), same l0..l9 fold order.
  private val EwmaSql: String = {
    val ws = (0 until operators.TimeSeries.EwmaLags)
      .map(i => math.pow(operators.TimeSeries.EwmaAlpha, i))
    val lags = ws.indices.map {
      case 0 => "value AS l0"
      case i => s"lag(value, $i) OVER w AS l$i"
    }.mkString(",\n    ")
    val num = ws.indices.map(i => s"coalesce(l$i * ${ws(i)}, 0.0)")
      .mkString(" + ")
    val den = ws.indices.map(i =>
      s"(CASE WHEN l$i IS NOT NULL THEN ${ws(i)} ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT event_id, user_id, ts, value,
       |    $lags
       |  FROM events WHERE event_type = 'purchase'
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_id, user_id AS ticker_id, ts, value AS price,
       |  round(($num) / ($den), 6) AS ewma
       |FROM t ORDER BY event_id""".stripMargin
  }

  /** BM25 top-20 oracle — shared verbatim by `bm25_search` and the
    * `hybrid_search` fusion twin's lexical CTE. */
  private val Bm25Sql: String =
    """WITH t AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |pd AS (SELECT doc_id, count(*) AS dl,
        |    sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END) AS tf0,
        |    sum(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS tf1,
        |    sum(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS tf2
        |  FROM t GROUP BY 1),
        |st AS (SELECT cast(sum(dl) AS double) AS sum_dl,
        |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM pd),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |sc AS (SELECT pd.doc_id, pd.dl,
        |    ln(1.0 + (cast(n.n_docs - st.df0 AS double) + 0.5) /
        |        (cast(st.df0 AS double) + 0.5))
        |      * (cast(pd.tf0 AS double) * (1.2 + 1.0))
        |      / (cast(pd.tf0 AS double) + 1.2 * (1.0 - 0.75 + 0.75 *
        |          (cast(pd.dl AS double) /
        |           (st.sum_dl / cast(n.n_docs AS double)))))
        |    + ln(1.0 + (cast(n.n_docs - st.df1 AS double) + 0.5) /
        |        (cast(st.df1 AS double) + 0.5))
        |      * (cast(pd.tf1 AS double) * (1.2 + 1.0))
        |      / (cast(pd.tf1 AS double) + 1.2 * (1.0 - 0.75 + 0.75 *
        |          (cast(pd.dl AS double) /
        |           (st.sum_dl / cast(n.n_docs AS double)))))
        |    + ln(1.0 + (cast(n.n_docs - st.df2 AS double) + 0.5) /
        |        (cast(st.df2 AS double) + 0.5))
        |      * (cast(pd.tf2 AS double) * (1.2 + 1.0))
        |      / (cast(pd.tf2 AS double) + 1.2 * (1.0 - 0.75 + 0.75 *
        |          (cast(pd.dl AS double) /
        |           (st.sum_dl / cast(n.n_docs AS double)))))
        |    AS score
        |  FROM pd, st, n),
        |r AS (SELECT doc_id, dl, score, row_number() OVER (
        |    ORDER BY score DESC, doc_id ASC) AS rnk FROM sc)
        |SELECT cast(rnk AS bigint) AS rnk, doc_id,
        |  round(score, 6) AS score, dl
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** DuckDB oracle SQL per query (same parquet tables, same column
    * names — SURVEY.md §6). Only genuinely engine-private statistics
    * (BPE's sampled merge table, the CRC-bearing multimodal float
    * feature, the tuned persisted-index probes) remain rows-only;
    * every hash-portable pipeline — minhash, simhash, sign-LSH, the
    * full Lloyd k-means behind semantic dedup / IVF / PQ, the
    * relational HLL, the exact-regime GK sketch — carries a full
    * oracle. */
  def oracleSql: Map[String, String] = Map(
    // Portable relational HLL twin (round 15): identical md5 register
    // hash, exact integer bit-length rho (bin() is minimal-width in
    // both engines), order-free integer Z accumulator, the same
    // estimator formula (shared double literals) with the
    // linear-counting branch.
    "approx_distinct" -> {
      val m = graft.operators.Olap.HllRegisters
      val wb = graft.operators.Olap.HllWindowBits + 1
      val hs = graft.operators.Olap.HllHashStart
      val hl = graft.operators.Olap.HllHashLen
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      s"""WITH ev AS (SELECT event_type,
         |    CAST(('0x' || substr(md5('hll|' || CAST(user_id AS VARCHAR)),
         |      $hs, $hl))::UBIGINT AS BIGINT) AS h
         |  FROM events),
         |rg AS (SELECT event_type, h % $m AS reg, h // $m AS w FROM ev),
         |rr AS (SELECT event_type, reg,
         |    CASE WHEN w > 0 THEN $wb - length(bin(w)) ELSE $wb END
         |      AS rho
         |  FROM rg),
         |mx AS (SELECT event_type, reg, max(rho) AS mxr, count(*) AS c
         |  FROM rr GROUP BY 1, 2),
         |g AS (SELECT event_type,
         |    sum(CASE WHEN reg IS NOT NULL
         |      THEN (1::BIGINT << ($wb - mxr)) ELSE 0 END) AS zi,
         |    sum(CASE WHEN reg IS NOT NULL THEN 1 ELSE 0 END) AS nreg,
         |    sum(c) AS n_events
         |  FROM mx GROUP BY 1),
         |est AS (SELECT event_type, n_events, $m - nreg AS v,
         |    cast(zi + ($m - nreg) * ${1L << wb} AS double)
         |      / ${(1L << wb).toDouble} AS z
         |  FROM g)
         |SELECT event_type,
         |  round(CASE WHEN (CAST($alpha AS DOUBLE)
         |          * ${(m.toLong * m).toDouble} / z)
         |        <= ${2.5 * m} AND v > 0
         |      THEN ${m.toDouble} * ln(${m.toDouble} / cast(v AS double))
         |      ELSE CAST($alpha AS DOUBLE)
         |        * ${(m.toLong * m).toDouble} / z END, 6)
         |    AS approx_users,
         |  cast(n_events AS bigint) AS n_events
         |FROM est ORDER BY event_type""".stripMargin
    },
    // Exact-regime GK twin (round 15; split out of approx_percentiles
    // in round 16, ADVICE r15 #1): on the 1-in-97 md5 slice every
    // group is far below accuracy/2 rows, where the sketch is
    // lossless and query(p) returns the ceil(p·n)-th smallest value —
    // replayed here as an explicit rank pick. Every corpus group is
    // emitted (left join); an empty slice carries NULL percentiles.
    "approx_percentiles_exact" ->
      """WITH s AS (SELECT event_type, value FROM events
        |  WHERE value IS NOT NULL AND
        |    CAST(('0x' || substr(md5('apx|' || CAST(event_id AS VARCHAR)),
        |      25, 8))::UBIGINT AS BIGINT) % 97 = 0),
        |r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value)
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM s),
        |q AS (SELECT event_type,
        |  round(max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
        |    THEN value END), 6) AS p25,
        |  round(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |    THEN value END), 6) AS p50,
        |  round(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
        |    THEN value END), 6) AS p90,
        |  round(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
        |    THEN value END), 6) AS p99
        |FROM r GROUP BY 1)
        |SELECT g.event_type, q.p25, q.p50, q.p90, q.p99
        |FROM (SELECT DISTINCT event_type FROM events) g
        |LEFT JOIN q USING (event_type) ORDER BY 1""".stripMargin,
    // Portable sign-LSH twin (round 13): integer hyperplane banding
    // (lshKeysCtes ≡ PortableSignBandKeys), bucket probe on
    // (band, key), exact 6 dp-rounded cosine re-rank.
    "ann_lsh" ->
      s"""WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
         |  FROM embeddings),
         |${lshKeysCtes(graft.operators.Similarity.LshBands,
             graft.operators.Similarity.LshBitsPerBand)},
         |pairs AS (SELECT DISTINCT q.vec_id AS q_id,
         |    k.vec_id AS cand_id
         |  FROM keys q JOIN keys k
         |    ON q.band = k.band AND q.kb = k.kb
         |  WHERE q.vec_id < 8 AND k.vec_id <> q.vec_id),
         |scored AS (SELECT p.q_id, p.cand_id,
         |    round(list_cosine_similarity(a.v, b.v), 6) AS cos
         |  FROM pairs p JOIN e a ON a.vec_id = p.q_id
         |  JOIN e b ON b.vec_id = p.cand_id),
         |ranked AS (SELECT q_id, cand_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
         |  cos AS cos_sim
         |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // Near-dup sign-LSH twin: 12-bit bands, capped buckets
    // (Dedup.bucketPairs' 2..cap membership), ranked rounded cosine.
    "dedup_embed" ->
      s"""WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
         |  FROM embeddings),
         |${lshKeysCtes(graft.operators.Similarity.LshBands,
             graft.operators.Similarity.NearDupBitsPerBand)},
         |ok AS (SELECT * FROM (SELECT *, count(*) OVER (
         |    PARTITION BY band, kb) AS cnt FROM keys)
         |  WHERE cnt BETWEEN 2 AND
         |    ${graft.operators.Similarity.EmbBucketCap}),
         |pairs AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |  FROM ok x JOIN ok y ON x.band = y.band AND x.kb = y.kb
         |    AND x.vec_id < y.vec_id),
         |scored AS (SELECT p.a, p.b,
         |    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
         |  FROM pairs p JOIN e ea ON ea.vec_id = p.a
         |  JOIN e eb ON eb.vec_id = p.b)
         |SELECT a, b, cos_sim FROM scored
         |ORDER BY cos_sim DESC, a, b LIMIT 100""".stripMargin,
    // SemDeDup twin: the FULL portable k-means (8 unrolled Lloyd
    // rounds — kmeansCtes ≡ Similarity.kmeansRefine) + one final
    // rounded-argmax assignment, capped within-cell pairs, threshold
    // + best-smaller-id verdict.
    "semantic_dedup" -> {
      val iters = graft.operators.Similarity.IvfKmeansIters
      s"""WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
         |  FROM embeddings),
         |${kmeansCtes(iters, graft.operators.Similarity.IvfCells)},
         |fa AS (SELECT e.vec_id, c.c_id,
         |    list_cosine_similarity(e.v, c.cvec) AS cs
         |  FROM e CROSS JOIN c$iters c),
         |assigned AS (SELECT vec_id, c_id AS cell FROM (
         |    SELECT vec_id, c_id, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY round(cs, 6) DESC, c_id)
         |      AS rn FROM fa) WHERE rn = 1),
         |ok AS (SELECT * FROM (SELECT *, count(*) OVER (
         |    PARTITION BY cell) AS cnt FROM assigned)
         |  WHERE cnt BETWEEN 2 AND
         |    ${graft.operators.Similarity.SemCellCap}),
         |pairs AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |  FROM ok x JOIN ok y ON x.cell = y.cell
         |    AND x.vec_id < y.vec_id),
         |scored AS (SELECT p.a, p.b,
         |    round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
         |  FROM pairs p JOIN e ea ON ea.vec_id = p.a
         |  JOIN e eb ON eb.vec_id = p.b
         |  WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >=
         |    ${graft.operators.Similarity.SemThreshold}),
         |verd AS (SELECT b AS vec_id, a AS dup_of, cos,
         |    row_number() OVER (PARTITION BY b ORDER BY cos DESC, a)
         |      AS rn FROM scored)
         |SELECT s.vec_id, s.cell, v.dup_of,
         |  v.cos AS max_cos,
         |  CASE WHEN v.dup_of IS NULL THEN 'keep' ELSE 'drop' END
         |    AS verdict
         |FROM assigned s LEFT JOIN (SELECT * FROM verd WHERE rn = 1) v
         |  ON s.vec_id = v.vec_id
         |ORDER BY s.vec_id""".stripMargin
    },
    "ingest_typed" ->
      """SELECT event_id, ts, cast(user_id AS double) AS ticker_fl,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,
    "csv_ingest" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  ${dsum("value")} AS sum_value,
         |  max(ts) AS max_ts
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-02 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "json_ingest" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  ${dsum("value")} AS sum_value,
         |  max(ts) AS max_ts
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-03 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Closed-form twin of Acquire.arithmeticFake under maxRetries=2:
    // key k fails k%4 times transiently (k%4==3 exhausts the 3-call
    // budget → quarantined), a success returns 100+(k%7)*13 bytes.
    // The Spark side EXECUTES the retry/rate-limit/quarantine loop;
    // the oracle recomputes the contract it must land on.
    // #213 twin: the oracle recomputes the fabricate→parse→exclude→
    // shard contract closed-form (the acquire_fetch pattern — Spark
    // executes the real document build + regexp parse, DuckDB pins
    // what it must land on)
    "worklist_bootstrap" ->
      s"""WITH w AS (SELECT DISTINCT user_id AS key FROM events
         |  WHERE user_id IS NOT NULL AND user_id >= 0),
         |o AS (SELECT key, 'T' || CAST(key AS VARCHAR) AS symbol,
         |    CAST(('0x' || substr(md5('${graft.sources.Worklist.Seed}:'
         |      || key), 25, 8))::UBIGINT AS BIGINT) AS skey
         |  FROM w),
         |p AS (SELECT key, symbol,
         |    CAST(row_number() OVER (ORDER BY skey, key) AS BIGINT)
         |      AS pos,
         |    CASE WHEN symbol IN ('T3', 'T7') THEN 'excluded'
         |      ELSE 'included' END AS status
         |  FROM o),
         |i AS (SELECT pos, CAST(least((row_number() OVER
         |      (ORDER BY pos) - 1) // 100, 4) AS BIGINT) AS shard
         |  FROM p WHERE status = 'included')
         |SELECT p.pos, p.symbol, p.key, p.status, i.shard
         |FROM p LEFT JOIN i ON p.pos = i.pos
         |ORDER BY p.pos""".stripMargin,
    // #214 twin: every arm closed-form — the acquire quarantine
    // contract (k%4==3 exhausts the 3-attempt budget, last error
    // message is attempt 3's), the dq gate over the same aggregate
    // dq_checks pins, and the CONSTANT halt trail of a total outage
    // on day 3 of a 4-day depends_on_past chain (days 1-2 commit for
    // real on the Spark side; the oracle sees only the alert rows)
    "alert_feed" ->
      """WITH b AS (SELECT DISTINCT user_id AS key FROM events
        |  WHERE user_id IS NOT NULL AND user_id >= 0
        |    AND user_id NOT IN (3, 7)),
        |a AS (SELECT
        |  sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS null_id,
        |  count(event_id) - count(DISTINCT event_id) AS dup_id,
        |  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user,
        |  sum(CASE WHEN event_type NOT IN
        |    ('click','error','purchase','signup','view')
        |    THEN 1 ELSE 0 END) AS bad_type,
        |  sum(CASE WHEN value < 0 OR value IS NULL THEN 1 ELSE 0 END)
        |    AS bad_value,
        |  sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
        |    OR ts >= TIMESTAMP '2025-01-01 00:00:00' OR ts IS NULL
        |    THEN 1 ELSE 0 END) AS bad_ts
        |  FROM events),
        |dq AS (
        |  SELECT 'bad_ts' AS rule, cast(bad_ts AS bigint) AS nv FROM a
        |  UNION ALL SELECT 'bad_type', cast(bad_type AS bigint) FROM a
        |  UNION ALL SELECT 'bad_value', cast(bad_value AS bigint) FROM a
        |  UNION ALL SELECT 'dup_id', cast(dup_id AS bigint) FROM a
        |  UNION ALL SELECT 'null_id', cast(null_id AS bigint) FROM a
        |  UNION ALL SELECT 'null_user', cast(null_user AS bigint) FROM a)
        |SELECT 'acquire' AS source, CAST(key AS VARCHAR) AS alert_key,
        |  'error' AS severity, CAST(3 AS BIGINT) AS n,
        |  'transient[' || key || '/3]' AS detail
        |FROM b WHERE key % 4 = 3
        |UNION ALL
        |SELECT 'dq_checks', rule, 'warn', nv,
        |  'rule violations over events'
        |FROM dq WHERE nv > 0
        |UNION ALL
        |SELECT 'backfill', '2024-01-03', 'error', CAST(3 AS BIGINT),
        |  'java.io.IOException: upstream outage 2024-01-03'
        |UNION ALL
        |SELECT 'backfill', '2024-01-04', 'warn', CAST(0 AS BIGINT),
        |  'blocked: earlier date failed (depends_on_past)'
        |ORDER BY source, alert_key""".stripMargin,
    "acquire_fetch" ->
      """WITH b AS (SELECT DISTINCT user_id AS key FROM events
        |  WHERE user_id IS NOT NULL AND user_id >= 0
        |    AND user_id NOT IN (3, 7)),
        |w AS (SELECT key FROM b),
        |f AS (SELECT key, key % 4 AS nf FROM w)
        |SELECT key,
        |  CASE WHEN nf <= 2 THEN 'ok' ELSE 'failed' END AS status,
        |  cast(CASE WHEN nf <= 2 THEN nf + 1 ELSE 3 END AS bigint)
        |    AS attempts,
        |  CASE WHEN nf <= 2 THEN cast(100 + (key % 7) * 13 AS bigint)
        |    ELSE NULL END AS payload_len
        |FROM f ORDER BY key""".stripMargin,
    "skew_agg" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "shard_union" ->
      s"""SELECT count(*) AS n_rows, ${dsum("l_quantity")} AS sum_qty,
         |  count(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin,
    "append_roundtrip" ->
      s"""SELECT cast(ts AS date) AS batch_date, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-02 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "versioned_commits" ->
      s"""SELECT cast(ts AS date) AS batch_date, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-03 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cdc_incremental" ->
      s"""SELECT cast(ts AS date) AS batch_date, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-04 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "backfill_range" ->
      s"""SELECT cast(ts AS date) AS batch_date, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-04 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "versioned_changes" ->
      s"""SELECT cast(ts AS date) AS batch_date, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-04 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "bucketed_join" ->
      s"""SELECT o.o_orderpriority,
         |  ${dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "zorder_scan" ->
      s"""SELECT user_id AS ticker_id, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value, max(ts) AS max_ts
         |FROM events
         |WHERE user_id BETWEEN 10 AND 19
         |  AND ts >= TIMESTAMP '2024-01-02 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-04 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "snapshot_proj" ->
      """SELECT ts AS snap_time, user_id AS ticker_id, value AS price,
        |  cast(length(props) AS bigint) AS volume
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY snap_time, ticker_id, price, volume, event_id""".stripMargin,
    "latest_per_key" ->
      """SELECT user_id AS ticker_id, ts AS latest_ts, value AS latest_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY ticker_id""".stripMargin,
    "fin_ratio" ->
      s"""WITH spend AS (
         |  SELECT o_custkey, count(*) AS order_cnt,
         |    ${dsum("o_totalprice")} AS total_spend
         |  FROM orders GROUP BY 1)
         |SELECT c.c_custkey AS ticker_id, s.order_cnt, s.total_spend,
         |  s.total_spend / cast(s.order_cnt AS double) AS avg_order_value,
         |  CASE WHEN c.c_acctbal <> 0 THEN s.total_spend / c.c_acctbal
         |  END AS spend_to_balance
         |FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
         |ORDER BY ticker_id""".stripMargin,
    "fin_statement" ->
      s"""SELECT o.o_custkey AS ticker_id,
         |  ${dsum("l.l_extendedprice * (1 - l.l_discount)")} AS total_revenue,
         |  ${dsum("l.l_extendedprice * l.l_tax")} AS total_tax,
         |  ${dsum("l.l_quantity")} AS total_qty,
         |  count(*) AS line_cnt,
         |  count(DISTINCT l.l_orderkey) AS order_cnt
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "news_dateparse" ->
      """SELECT event_id, ts AS collected_at, cast(ts AS date) AS news_date,
        |  user_id AS ticker_id, event_type AS title, value AS price
        |FROM events ORDER BY event_id""".stripMargin,
    "incremental_batch" ->
      s"""SELECT date_trunc('hour', ts) AS batch_hour, count(*) AS n_events,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-02 00:00:00'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  ${dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${dsum("l_quantity")} / cast(count(l_quantity) AS double) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "filter_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        |  AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "join_broadcast" ->
      s"""SELECT r.r_name, o.o_orderpriority,
         |  ${dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "topk_revenue" ->
      s"""SELECT o.o_custkey AS cust_id,
         |  ${dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |GROUP BY 1 ORDER BY revenue DESC, cust_id ASC LIMIT 10""".stripMargin,
    "window_tumbling" ->
      s"""SELECT date_trunc('hour', ts) AS bucket_hour, event_type,
         |  count(*) AS n, ${dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "semi_anti" ->
      """SELECT 'with_urgent' AS bucket, c_mktsegment, count(*) AS n_cust
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 2
        |UNION ALL
        |SELECT 'without_urgent' AS bucket, c_mktsegment, count(*) AS n_cust
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 2
        |ORDER BY bucket, c_mktsegment""".stripMargin,
    "asof_join" ->
      """WITH probe AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |build AS (
        |  SELECT user_id, ts, max(value) AS bval FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts, b.bval AS asof_value
        |FROM probe p ASOF LEFT JOIN build b
        |  ON p.user_id = b.user_id AND b.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "market_share" ->
      """WITH d AS (SELECT cast(ts AS date) AS day, user_id AS ticker_id,
        |    count(*) AS n_trades,
        |    cast(sum(length(props)) AS bigint) AS volume
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT day, ticker_id, n_trades, volume,
        |  round(cast(volume AS double) /
        |    cast(sum(volume) OVER (PARTITION BY day) AS double), 6)
        |    AS share,
        |  cast(row_number() OVER (PARTITION BY day
        |    ORDER BY volume DESC, ticker_id ASC) AS bigint) AS day_rank
        |FROM d ORDER BY day, day_rank""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    // Portable-hash LSH (see Dedup.scala round-11 block): md5-derived
    // 32-bit hashes + affine permutations make the WHOLE pipeline
    // SQL-replicable, so these two near-dup operators get full
    // hash-exact oracles instead of rows-only gates.
    "dedup_minhash" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(
        |      string_split_regex(lower(trim(text)), '\\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(list_slice(toks, i + 1, i + 2), ' ')
        |      for i in range(len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(sh), 25, 8))::UBIGINT AS BIGINT) AS h
        |  FROM sh),
        |mh AS (
        |  SELECT doc_id, i,
        |    min((h * ([${Dedup.PortableA.mkString(",")}])[i + 1]
        |         + ([${Dedup.PortableB.mkString(",")}])[i + 1])
        |        % ${Dedup.PortableP}) AS mh
        |  FROM h CROSS JOIN range(${Dedup.PortableK}) r(i) GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, sig, band,
        |    sig[2 * band + 1] || ',' || sig[2 * band + 2] AS key
        |  FROM sig CROSS JOIN range(${Dedup.PortableBands}) r(band)),
        |ok AS (SELECT * FROM (
        |    SELECT *, count(*) OVER (PARTITION BY band, key) AS cnt
        |    FROM banded) WHERE cnt BETWEEN 2 AND ${Dedup.BucketCap}),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |    x.sig AS sa, y.sig AS sb
        |  FROM ok x JOIN ok y
        |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
        |SELECT a, b,
        |  list_sum([CASE WHEN sa[j + 1] = sb[j + 1] THEN 1 ELSE 0 END
        |    for j in range(${Dedup.PortableK})]) / ${Dedup.PortableK}.0
        |    AS est_jaccard
        |FROM pairs
        |ORDER BY est_jaccard DESC, a, b LIMIT ${Dedup.TopPairs}""".stripMargin,
    "dedup_simhash" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(t.t), 25, 8))::UBIGINT AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM t) t),
        |bits AS (
        |  SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
        |  FROM h CROSS JOIN range(32) r(b) GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN s >= 0
        |      THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
        |  FROM bits GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, sig, band, (sig >> (band * 8)) & 255 AS key
        |  FROM sig CROSS JOIN range(4) r(band)),
        |ok AS (SELECT * FROM (
        |    SELECT *, count(*) OVER (PARTITION BY band, key) AS cnt
        |    FROM banded) WHERE cnt BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |    x.sig AS sa, y.sig AS sb
        |  FROM ok x JOIN ok y
        |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
        |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        |FROM pairs
        |ORDER BY hamming, a, b LIMIT 500""".stripMargin,
    "ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, n_chars, n_chars // 20 AS blk,
        |    list_distinct(list_transform(
        |      range(greatest(length(lower(text)) - 2, 0)),
        |      i -> substr(lower(text), cast(i + 1 AS int), 3))) AS grams
        |  FROM documents)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  CASE WHEN len(x.grams) + len(y.grams)
        |            - len(list_intersect(x.grams, y.grams)) > 0
        |    THEN cast(len(list_intersect(x.grams, y.grams)) AS double)
        |      / cast(len(x.grams) + len(y.grams)
        |             - len(list_intersect(x.grams, y.grams)) AS double)
        |    ELSE 0.0 END AS jac
        |FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |  AND abs(x.blk - y.blk) <= 1 AND x.doc_id < y.doc_id
        |  AND abs(x.n_chars - y.n_chars) <= 20
        |ORDER BY jac DESC, a, b LIMIT 200""".stripMargin,
    "cosine_pairs" ->
      """WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id
        |ORDER BY vec_a""".stripMargin,
    "label_centroids" ->
      """WITH s AS (SELECT label, embedding,
        |    unnest(range(len(embedding))) AS pos
        |  FROM embeddings),
        |d AS (SELECT label, pos,
        |    cast(sum(cast(cast(embedding[pos + 1] AS double)
        |      AS decimal(28,6))) AS double) / cast(count(*) AS double) AS m
        |  FROM s GROUP BY 1, 2),
        |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1)
        |SELECT d.label, d.pos, d.m, n.n_vecs
        |FROM d JOIN n USING (label)
        |ORDER BY d.label, d.pos""".stripMargin,
    "centroid_assign" ->
      """WITH s AS (SELECT label, embedding,
        |    unnest(range(len(embedding))) AS pos
        |  FROM embeddings),
        |d AS (SELECT label, pos,
        |    cast(sum(cast(cast(embedding[pos + 1] AS double)
        |      AS decimal(28,6))) AS double) / cast(count(*) AS double) AS m
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT label AS c_label, list(m ORDER BY pos) AS cvec
        |  FROM d GROUP BY 1),
        |e AS (SELECT vec_id, label, cast(embedding AS double[]) AS v
        |  FROM embeddings),
        |scored AS (SELECT e.vec_id, e.label, c.c_label,
        |    list_cosine_similarity(e.v, c.cvec) AS cs
        |  FROM e CROSS JOIN c),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cs DESC, c_label ASC) AS rn FROM scored)
        |SELECT label AS true_label, c_label AS pred_label,
        |  count(*) AS n_vecs,
        |  cast(sum(cast(cs AS decimal(28,6))) AS double) /
        |    cast(count(*) AS double) AS avg_cos
        |FROM ranked WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ann_brute" -> AnnExactTopkSql,
    // Exhaustive IVF ≡ brute force (every cell probed, exact re-rank)
    // — same oracle, proving the IVF machinery lossless end-to-end.
    "ann_ivf_exact" -> AnnExactTopkSql,
    // The TUNED IVF probe, fully oracled (round 15): the portable
    // Lloyd replay (kmeansCtes — the semantic_dedup precedent) +
    // 6 dp-rounded assignment/probe ranks + rounded-cosine re-rank
    // reproduce the adaptive-probe result exactly in SQL.
    "ann_ivf" -> {
      val S = graft.operators.Similarity
      s"""WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
         |  FROM embeddings),
         |${kmeansCtes(S.IvfKmeansIters, S.IvfCells)},
         |$ivfProbeCtes,
         |cand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
         |  FROM iprobes p JOIN iasg a USING (cell)
         |  WHERE a.vec_id <> p.q_id),
         |sc AS (SELECT cd.q_id, cd.cand_id,
         |    round(list_cosine_similarity(q.v, x.v), 6) AS cos
         |  FROM cand cd JOIN e q ON q.vec_id = cd.q_id
         |  JOIN e x ON x.vec_id = cd.cand_id),
         |r AS (SELECT q_id, cand_id, cos, row_number() OVER (
         |    PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rnk
         |  FROM sc)
         |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
         |  cos AS cos_sim
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
    },
    // PQ/ADC ANN, fully oracled (round 15): portable sub-codebook
    // Lloyd (pqCtes) + exact integer-micro ADC + rounded shortlist
    // + rounded-cosine re-rank.
    "ann_pq" ->
      s"""WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
         |  FROM embeddings),
         |$pqCtes,
         |icand AS (SELECT l.q_id, c.vec_id AS cand_id
         |  FROM (SELECT DISTINCT q_id FROM plut) l
         |  CROSS JOIN (SELECT DISTINCT vec_id FROM sub) c
         |  WHERE c.vec_id <> l.q_id),
         |$pqRankSql
         |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
         |  cos AS cos_sim
         |FROM rr WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // IVF∘PQ composition, fully oracled (round 15): the trained-IVF
    // probe CTEs select the candidate cells, the PQ CTEs rank them —
    // both replays already proven portable standalone.
    "ann_ivfpq" -> {
      val S = graft.operators.Similarity
      s"""WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
         |  FROM embeddings),
         |${kmeansCtes(S.IvfKmeansIters, S.IvfCells)},
         |$ivfProbeCtes,
         |$pqCtes,
         |icand AS (SELECT DISTINCT p.q_id, a.vec_id AS cand_id
         |  FROM iprobes p JOIN iasg a USING (cell)
         |  WHERE a.vec_id <> p.q_id),
         |$pqRankSql
         |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
         |  cos AS cos_sim
         |FROM rr WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
    },
    // Exhaustive probe of the PERSISTED index — same oracle again:
    // a lost/corrupted/truncated posting surfaces as a hash mismatch.
    "ann_indexed" -> AnnExactTopkSql,
    // Append-without-retrain: exhaustive probe over base+appended
    // postings degenerates to brute force over the full corpus, so
    // the shared exact-top-k oracle hash-verifies the append path.
    "ann_append" -> AnnExactTopkSql,
    // Filtered ANN: exact within the label-constrained candidate set.
    "ann_filtered" ->
      """WITH e AS (SELECT vec_id, label,
        |    cast(embedding AS double[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label
        |  FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS cand_id,
        |    list_cosine_similarity(q.qv, e.v) AS cos
        |  FROM e JOIN q ON e.label = q.q_label
        |    AND e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, cand_id, cos, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos DESC, cand_id ASC) AS rnk FROM scored)
        |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
        |  round(cos, 6) AS cos_sim
        |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // Int8-quantized ANN: integer dot/norms are exact in both engines,
    // so unlike the float ANN variants this one is fully oracled.
    // Quantization twin: s = ma/127, q_i = floor(v_i/s + 0.5) — the
    // identical IEEE op sequence as the QuantizeI8 kernel.
    "ann_quant" ->
      """WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
        |q AS (SELECT vec_id,
        |    CASE WHEN ma > 0
        |      THEN list_transform(v, x -> floor(x / (ma / 127.0) + 0.5))
        |      ELSE list_transform(v, x -> 0.0) END AS qv
        |  FROM m),
        |qq AS (SELECT vec_id AS q_id, qv AS qvec FROM q WHERE vec_id < 8),
        |sc AS (SELECT qq.q_id, q.vec_id AS cand_id,
        |    list_dot_product(qq.qvec, q.qv) /
        |      (sqrt(list_dot_product(qq.qvec, qq.qvec)) *
        |       sqrt(list_dot_product(q.qv, q.qv))) AS cos
        |  FROM q CROSS JOIN qq WHERE q.vec_id <> qq.q_id),
        |r AS (SELECT q_id, cand_id, cos,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, cand_id ASC) AS rnk FROM sc)
        |SELECT q_id, cast(rnk AS bigint) AS rnk, cand_id,
        |  round(cos, 6) AS cos_q
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // Connected components: recursive min-label propagation — only the
    // component minimum must reach every member (comp < dst prunes the
    // non-min label floods), the same fixed point the Spark loop finds.
    "dedup_components" ->
      s"""$NearDupComponentsCte,
        |sz AS (SELECT comp, count(*) AS comp_size FROM c GROUP BY comp)
        |SELECT c.id AS doc_id, c.comp AS comp_id, sz.comp_size,
        |  cast(CASE WHEN c.id = c.comp THEN 1 ELSE 0 END AS bigint)
        |    AS is_canonical
        |FROM c JOIN sz ON c.comp = sz.comp
        |ORDER BY doc_id""".stripMargin,
    // Leakage-safe split twin: the SAME components fixed point, then
    // the split is sample_hash's Knuth arithmetic on the COMPONENT id
    // — every member of a dup cluster shares its component's split.
    "cluster_split" ->
      s"""$NearDupComponentsCte
        |SELECT c.id AS doc_id, c.comp AS comp_id,
        |  CASE WHEN (c.comp % 1000000007) * 2654435761 % 1000 < 800
        |      THEN 'train'
        |    WHEN (c.comp % 1000000007) * 2654435761 % 1000 < 900
        |      THEN 'val'
        |    ELSE 'test' END AS split
        |FROM c ORDER BY doc_id""".stripMargin,
    // Incremental dedup twin: same blocked pair generation as
    // ngram_jaccard but index×batch sides (index = existing corpus +
    // earlier batch docs); best match realized as row_number
    // (jac DESC, a ASC) = Spark's max(struct(jac, -a)).
    "incremental_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, n_chars, n_chars // 20 AS blk,
        |    list_distinct(list_transform(
        |      range(greatest(length(lower(text)) - 2, 0)),
        |      i -> substr(lower(text), cast(i + 1 AS int), 3))) AS grams
        |  FROM documents),
        |p AS (SELECT y.doc_id AS b, x.doc_id AS a,
        |    CASE WHEN len(x.grams) + len(y.grams)
        |              - len(list_intersect(x.grams, y.grams)) > 0
        |      THEN cast(len(list_intersect(x.grams, y.grams)) AS double)
        |        / cast(len(x.grams) + len(y.grams)
        |               - len(list_intersect(x.grams, y.grams)) AS double)
        |      ELSE 0.0 END AS jac
        |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |    AND abs(x.blk - y.blk) <= 1
        |    AND y.doc_id % 7 = 0
        |    AND (x.doc_id % 7 <> 0 OR x.doc_id < y.doc_id)
        |    AND abs(x.n_chars - y.n_chars) <= 20),
        |r AS (SELECT b, jac, a, row_number() OVER (PARTITION BY b
        |    ORDER BY jac DESC, a ASC) AS rn FROM p),
        |best AS (SELECT b, jac, a FROM r WHERE rn = 1)
        |SELECT t.doc_id,
        |  CASE WHEN best.jac >= 0.5 THEN best.a END AS dup_of,
        |  round(coalesce(best.jac, 0.0), 6) AS best_jac,
        |  CASE WHEN best.jac >= 0.5 THEN 'drop' ELSE 'keep' END AS verdict
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) t
        |LEFT JOIN best ON t.doc_id = best.b
        |ORDER BY t.doc_id""".stripMargin,
    // Curation twin: the composed stage oracles — token gate
    // (token_count's unfiltered split), lang_id's regex cascade,
    // dedup_exact's min-id keep, group_cap's hash order, and
    // sample_hash's split rule — in one statement.
    "curation_pipeline" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    cast(len(string_split_regex(lower(trim(text)), '\s+'))
        |      AS bigint) AS n_tok,
        |    CASE
        |      WHEN regexp_matches(lower(text), '[\x{4e00}-\x{9fff}]')
        |        THEN 'zh'
        |      WHEN regexp_matches(lower(text),
        |        '(^|\s)(the|a|and|of|to|in|is)(\s|$)') THEN 'en'
        |      WHEN regexp_matches(lower(text),
        |        '(^|\s)(el|la|los|de|que|y|en)(\s|$)') THEN 'es'
        |      ELSE 'und' END AS pred_lang
        |  FROM documents),
        |g AS (SELECT * FROM t
        |  WHERE n_tok >= 20 AND pred_lang IN ('en', 'es')),
        |k AS (SELECT min(doc_id) AS doc_id FROM g GROUP BY text),
        |d AS (SELECT g.* FROM g JOIN k USING (doc_id)),
        |c AS (SELECT * FROM (SELECT d.*, row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY (doc_id % 1000000007) * 2654435761 % 1000000007 ASC,
        |        doc_id ASC) AS rnk
        |    FROM d) WHERE rnk <= 20),
        |s AS (SELECT source,
        |    CASE WHEN (doc_id % 1000000007) * 2654435761 % 1000 < 800
        |        THEN 'train'
        |      WHEN (doc_id % 1000000007) * 2654435761 % 1000 < 900
        |        THEN 'val'
        |      ELSE 'test' END AS split, n_tok FROM c)
        |SELECT source, split, count(*) AS n_docs,
        |  cast(sum(n_tok) AS bigint) AS sum_tokens
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "term_stats" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
        |  FROM t GROUP BY 1)
        |SELECT s.term, s.df, s.cf,
        |  round(ln(1.0 + (cast(n.n_docs - s.df AS double) + 0.5) /
        |    (cast(s.df AS double) + 0.5)), 6) AS idf
        |FROM s, n ORDER BY s.term""".stripMargin,
    // BM25 twin: every arithmetic step mirrors Search.bm25Search
    // operation-for-operation (idf, tf*(k1+1), length norm, left-assoc
    // term sum), so the double scores hash-compare exactly.
    "bm25_search" -> Bm25Sql,
    // Hybrid twin: the bm25 CTE verbatim + exact cosine ranks for
    // query vec 0, fused by reciprocal rank (integer ranks; the only
    // floats are two fixed-order IEEE divisions).
    "hybrid_search" ->
      s"""WITH bm AS ($Bm25Sql),
        |e AS (SELECT vec_id, cast(embedding AS double[]) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |vs AS (SELECT e.vec_id AS doc_id,
        |    list_cosine_similarity(e.v, q.qv) AS cos
        |  FROM e, q WHERE e.vec_id <> 0),
        |vr AS (SELECT doc_id, row_number() OVER (
        |    ORDER BY cos DESC, doc_id ASC) AS r_vec
        |  FROM vs ORDER BY cos DESC, doc_id ASC LIMIT 20),
        |f AS (SELECT coalesce(bm.doc_id, vr.doc_id) AS doc_id,
        |    bm.rnk AS r_text, cast(vr.r_vec AS bigint) AS r_vec,
        |    coalesce(1.0 / (60 + bm.rnk), 0.0) +
        |      coalesce(1.0 / (60 + vr.r_vec), 0.0) AS rrf
        |  FROM bm FULL OUTER JOIN vr ON bm.doc_id = vr.doc_id)
        |SELECT cast(row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
        |    AS bigint) AS rnk,
        |  doc_id, round(rrf, 6) AS rrf_score, r_text, r_vec
        |FROM f ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin,
    
    "vwap" ->
      s"""SELECT user_id AS ticker_id, cast(ts AS date) AS day,
         |  ${dsum("value * length(props)")} /
         |    cast(sum(length(props)) AS double) AS vwap,
         |  ${dsum("value")} AS sum_price,
         |  cast(sum(length(props)) AS bigint) AS total_volume,
         |  count(*) AS n_trades
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Spark orders open/close by a (micros, event_id) struct; DuckDB
    // v1.0's arg_min cannot take a struct key, so its twin keeps the
    // zero-padded string form — the ORDERINGS are identical, which is
    // all the arg_min/arg_max results depend on.
    "ohlc_bars" ->
      """WITH t AS (SELECT user_id, ts, value,
        |    lpad(cast(epoch_us(ts) AS varchar), 20, '0') ||
        |      lpad(cast(event_id AS varchar), 20, '0') AS sk
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id AS ticker_id, cast(ts AS date) AS day,
        |  arg_min(value, sk) AS open, max(value) AS high,
        |  min(value) AS low, arg_max(value, sk) AS close,
        |  count(*) AS n_trades
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dq_checks" ->
      """WITH a AS (SELECT
        |  sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS null_id,
        |  count(event_id) - count(DISTINCT event_id) AS dup_id,
        |  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user,
        |  sum(CASE WHEN event_type NOT IN
        |    ('click','error','purchase','signup','view')
        |    THEN 1 ELSE 0 END) AS bad_type,
        |  sum(CASE WHEN value < 0 OR value IS NULL THEN 1 ELSE 0 END)
        |    AS bad_value,
        |  sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
        |    OR ts >= TIMESTAMP '2025-01-01 00:00:00' OR ts IS NULL
        |    THEN 1 ELSE 0 END) AS bad_ts
        |  FROM events)
        |SELECT 'bad_ts' AS rule, cast(bad_ts AS bigint) AS n_violations
        |FROM a
        |UNION ALL SELECT 'bad_type', cast(bad_type AS bigint) FROM a
        |UNION ALL SELECT 'bad_value', cast(bad_value AS bigint) FROM a
        |UNION ALL SELECT 'dup_id', cast(dup_id AS bigint) FROM a
        |UNION ALL SELECT 'null_id', cast(null_id AS bigint) FROM a
        |UNION ALL SELECT 'null_user', cast(null_user AS bigint) FROM a
        |ORDER BY rule""".stripMargin,
    "json_extract" ->
      """SELECT event_type,
        |  count(cast(props->>'k' AS bigint)) AS n_with_k,
        |  cast(sum(cast(props->>'k' AS bigint)) AS bigint) AS sum_k,
        |  min(cast(props->>'k' AS bigint)) AS min_k,
        |  max(cast(props->>'k' AS bigint)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (
        |  SELECT user_id, ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00')
        |  WHERE rn = 1),
        |upd AS (
        |  SELECT user_id, ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts >= TIMESTAMP '2024-01-04 00:00:00'
        |      AND ts < TIMESTAMP '2024-01-05 00:00:00')
        |  WHERE rn = 1)
        |SELECT coalesce(b.user_id, u.user_id) AS user_id,
        |  coalesce(u.ts, b.ts) AS latest_ts,
        |  coalesce(u.value, b.value) AS latest_price,
        |  CASE WHEN b.user_id IS NULL THEN 'inserted'
        |    WHEN u.user_id IS NULL THEN 'unchanged'
        |    ELSE 'updated' END AS merge_status
        |FROM base b FULL OUTER JOIN upd u ON b.user_id = u.user_id
        |ORDER BY user_id""".stripMargin,
    "multimodal_chunks" ->
      """WITH d AS (SELECT doc_id, cast(strlen(text) AS bigint) AS n,
        |    (strlen(text) + 4095) // 4096 AS nc
        |  FROM documents WHERE strlen(text) > 0),
        |e AS (SELECT doc_id, n, unnest(range(nc)) AS chunk_id FROM d)
        |SELECT doc_id, cast(chunk_id AS bigint) AS chunk_id,
        |  least(4096, n - chunk_id * 4096) AS chunk_len
        |FROM e ORDER BY doc_id, chunk_id""".stripMargin,
    // Resample twin: DuckDB's generate_series is inclusive like
    // Spark's sequence(); last_value IGNORE NULLS ≙ last(ignoreNulls)
    "resample_ffill" ->
      """WITH p AS (SELECT user_id, ts, event_id, value,
        |    date_trunc('hour', ts) AS hour
        |  FROM events WHERE event_type = 'purchase'),
        |o AS (SELECT user_id, hour, value AS obs_price FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, hour
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM p) WHERE rn = 1),
        |b AS (SELECT user_id, min(hour) AS h0 FROM p GROUP BY 1),
        |mx AS (SELECT max(hour) AS h1 FROM p),
        |g AS (SELECT user_id,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM b, mx),
        |j AS (SELECT g.user_id, g.hour, o.obs_price
        |  FROM g LEFT JOIN o ON g.user_id = o.user_id AND g.hour = o.hour)
        |SELECT user_id AS ticker_id, hour,
        |  round(last_value(obs_price IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY hour
        |    ROWS UNBOUNDED PRECEDING), 6) AS price,
        |  cast(obs_price IS NOT NULL AS bigint) AS is_observed
        |FROM j ORDER BY ticker_id, hour""".stripMargin,
    // Z-score twin: moments from exact decimal frame sums in the
    // same closed form / IEEE op order as the Spark side; the
    // n_win >= 8 gate keeps every denominator nonzero in both engines
    "anomaly_zscore" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |    count(value) OVER f AS n_win,
        |    cast(sum(cast(value AS decimal(28,6))) OVER f AS double) AS s1,
        |    cast(sum(cast(value * value AS decimal(28,6))) OVER f
        |      AS double) AS s2
        |  FROM p WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT *,
        |    CASE WHEN n_win >= 8 THEN s1 / cast(n_win AS double) END
        |      AS mean_prev,
        |    CASE WHEN n_win >= 8 THEN
        |      (s2 - s1 * s1 / cast(n_win AS double)) /
        |        (cast(n_win AS double) - 1.0) END AS var_prev
        |  FROM w),
        |z AS (SELECT *,
        |    CASE WHEN var_prev > 0 THEN sqrt(var_prev) END AS std_prev
        |  FROM m),
        |zz AS (SELECT *, CASE WHEN std_prev IS NOT NULL
        |    THEN (value - mean_prev) / std_prev END AS z FROM z)
        |SELECT event_id, user_id AS ticker_id, ts, value AS price, n_win,
        |  round(mean_prev, 6) AS mean_prev, round(std_prev, 6) AS std_prev,
        |  round(z, 6) AS z,
        |  coalesce(cast(abs(z) > 3.0 AS bigint), 0) AS is_anomaly
        |FROM zz ORDER BY event_id""".stripMargin,
    // Pearson r assembled from exact pair sums (never the built-in
    // corr, whose co-moment accumulation order is engine-private);
    // radicands guarded before sqrt — see TimeSeries.corrMatrix
    "corr_matrix" ->
      s"""WITH daily AS (SELECT user_id, cast(ts AS date) AS day,
         |    ${dsum("value")} / cast(count(value) AS double) AS p
         |  FROM events WHERE event_type = 'purchase' AND user_id < 8
         |  GROUP BY 1, 2),
         |pr AS (SELECT a.user_id AS ticker_a, b.user_id AS ticker_b,
         |    a.p AS pa, b.p AS pb
         |  FROM daily a JOIN daily b
         |    ON a.day = b.day AND a.user_id < b.user_id),
         |ag AS (SELECT ticker_a, ticker_b, count(*) AS n_days,
         |    ${dsum("pa")} AS sx, ${dsum("pb")} AS sy,
         |    ${dsum("pa * pb")} AS sxy, ${dsum("pa * pa")} AS sxx,
         |    ${dsum("pb * pb")} AS syy
         |  FROM pr GROUP BY 1, 2)
         |SELECT ticker_a, ticker_b, n_days,
         |  round(CASE WHEN cast(n_days AS double) * sxx - sx * sx > 0
         |      AND cast(n_days AS double) * syy - sy * sy > 0
         |    THEN (cast(n_days AS double) * sxy - sx * sy) /
         |      (sqrt(cast(n_days AS double) * sxx - sx * sx) *
         |       sqrt(cast(n_days AS double) * syy - sy * sy)) END, 6)
         |    AS corr
         |FROM ag ORDER BY ticker_a, ticker_b""".stripMargin,
    "drawdown" ->
      """WITH t AS (SELECT user_id, ts, event_id, value,
        |    lpad(cast(epoch_us(ts) AS varchar), 20, '0') ||
        |      lpad(cast(event_id AS varchar), 20, '0') AS sk,
        |    max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS peak
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id AS ticker_id,
        |  round(min((value - peak) / peak), 6) AS max_drawdown,
        |  round(max(peak), 6) AS peak_price,
        |  arg_max(value, sk) AS last_price,
        |  count(*) AS n_trades
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "ewma_smooth" -> EwmaSql,
    "scd2_dim" ->
      """WITH p AS (SELECT user_id, ts, event_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id, value FROM p
        |  WHERE prev_value IS NULL OR value <> prev_value),
        |v AS (SELECT user_id, ts, value,
        |    row_number() OVER w AS version,
        |    lead(ts) OVER w AS effective_to
        |  FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id AS ticker_id, cast(version AS bigint) AS version,
        |  ts AS effective_from, effective_to, value AS price,
        |  cast(effective_to IS NULL AS bigint) AS is_current
        |FROM v ORDER BY ticker_id, version""".stripMargin,
    "funnel_stages" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
        |SELECT '1_signup' AS stage, count(*) AS n_users,
        |  round(cast(sum(cast(cast(epoch_us(t1) - epoch_us(t1) AS double)
        |      / 3600000000.0 AS decimal(28,6))) AS double)
        |    / cast(count(*) AS double), 6) AS avg_hours_from_signup
        |FROM s1
        |UNION ALL
        |SELECT '2_click', count(*),
        |  round(cast(sum(cast(cast(epoch_us(t2) - epoch_us(t1) AS double)
        |      / 3600000000.0 AS decimal(28,6))) AS double)
        |    / cast(count(*) AS double), 6)
        |FROM s2
        |UNION ALL
        |SELECT '3_purchase', count(*),
        |  round(cast(sum(cast(cast(epoch_us(t3) - epoch_us(t1) AS double)
        |      / 3600000000.0 AS decimal(28,6))) AS double)
        |    / cast(count(*) AS double), 6)
        |FROM s3
        |ORDER BY stage""".stripMargin,
    // Packing twin: the two-level prefix sum collapses to plain
    // running sums — block structure changes the EXECUTION shape,
    // not the math. Geometry 512/256 — sync with Packing.SeqBudget
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |    cast(len(string_split_regex(lower(trim(text)), '\s+'))
        |      AS bigint) AS n_tok
        |  FROM documents),
        |o AS (SELECT source, doc_id, n_tok,
        |    cast(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS bigint) AS tok_offset
        |  FROM t)
        |SELECT source, doc_id, n_tok, tok_offset,
        |  tok_offset // 512 AS seq_id,
        |  (tok_offset + greatest(n_tok, 1) - 1) // 512 AS seq_end,
        |  (tok_offset + greatest(n_tok, 1) - 1) // 512
        |    - tok_offset // 512 + 1 AS n_seqs
        |FROM o ORDER BY source, doc_id""".stripMargin,
    // Heavy-hitters oracle covers the EXACT regime (key domain below
    // the sketch capacity → max_err = 0, counts exact); the
    // approximate regime is property-tested in FrequencySpec.
    // Threshold 1/200 — sync with Frequency.HitFraction.
    "heavy_hitters" ->
      """SELECT user_id AS item, count(*) AS est_count,
        |  cast(0 AS bigint) AS max_err
        |FROM events GROUP BY 1
        |HAVING count(*) >= (SELECT count(*) // 200 FROM events)
        |ORDER BY 1""".stripMargin,
    "retention_cohorts" ->
      """WITH c AS (SELECT user_id, min(cast(ts AS date)) AS cohort_day
        |  FROM events GROUP BY 1),
        |sz AS (SELECT cohort_day, count(*) AS cohort_size
        |  FROM c GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, cast(ts AS date) AS day FROM events),
        |r AS (SELECT c.cohort_day,
        |    cast(date_diff('day', c.cohort_day, a.day) AS bigint)
        |      AS day_offset,
        |    count(*) AS n_active
        |  FROM a JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT r.cohort_day, r.day_offset, r.n_active, sz.cohort_size,
        |  round(cast(r.n_active AS double) / cast(sz.cohort_size AS double),
        |    6) AS retention
        |FROM r JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,
    // PPS twin: the keep decision is *,/ arithmetic over the same
    // hash-uniform as sample_hash — no libm in the membership test.
    // k=500 — sync with Sampling.PpsK
    "pps_sample" ->
      s"""WITH s AS (SELECT ${dsum("o_totalprice")} AS sum_w FROM orders),
         |x AS (SELECT o_orderpriority, ${dsum("o_totalprice")}
         |    AS exact_total FROM orders GROUP BY 1),
         |k AS (SELECT o.o_orderpriority, o.o_totalprice,
         |    least(1.0, cast(500 AS double) * o.o_totalprice / s.sum_w) AS p
         |  FROM orders o, s
         |  WHERE cast((o.o_orderkey % 1000000007) * 2654435761 % 1000000007
         |      AS double) / 1000000007.0
         |    < least(1.0, cast(500 AS double) * o.o_totalprice / s.sum_w)),
         |g AS (SELECT o_orderpriority, count(*) AS n_kept,
         |    ${dsum("o_totalprice")} AS sum_kept,
         |    ${dsum("o_totalprice / p")} AS ht_total
         |  FROM k GROUP BY 1)
         |SELECT g.o_orderpriority, g.n_kept, g.sum_kept, g.ht_total,
         |  x.exact_total
         |FROM g JOIN x USING (o_orderpriority)
         |ORDER BY o_orderpriority""".stripMargin,
    "quantile_bins" ->
      s"""WITH b AS (SELECT event_type, value, event_id,
         |    cast(ntile(4) OVER (PARTITION BY event_type
         |      ORDER BY value, event_id) AS bigint) AS bin
         |  FROM events)
         |SELECT event_type, bin, count(*) AS n,
         |  round(min(value), 6) AS lo, round(max(value), 6) AS hi,
         |  ${dsum("value")} AS sum_value
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // TF-IDF doc-doc twin: w = tf·ln(1+N/df) (ln matches — the bm25
    // oracle already hash-matches through ln), pair dots and norms
    // decimal-exact. df cap 100 — sync with Search.SimDfCap
    "tfidf_docsim" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (SELECT tf.doc_id, tf.term, dft.df,
        |    cast(tf.tf AS double) * ln(1.0 + cast(n.n_docs AS double)
        |      / cast(dft.df AS double)) AS w
        |  FROM tf JOIN dft USING (term), n),
        |nrm AS (SELECT doc_id,
        |    sqrt(cast(sum(cast(w * w AS decimal(28,6))) AS double)) AS nrm
        |  FROM w GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    cast(sum(cast(a.w * b.w AS decimal(28,6))) AS double) AS dotw
        |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        |  WHERE a.df <= 100 AND b.df <= 100
        |  GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b,
        |  round(p.dotw / (na.nrm * nb.nrm), 6) AS tfidf_sim
        |FROM p JOIN nrm na ON p.doc_a = na.doc_id
        |  JOIN nrm nb ON p.doc_b = nb.doc_id
        |ORDER BY tfidf_sim DESC, doc_a, doc_b LIMIT 100""".stripMargin,
    "grouping_sets" ->
      s"""SELECT o_orderpriority, o_orderstatus,
         |  cast(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
         |    AS bigint) AS grp_id,
         |  ${dsum("o_totalprice")} AS sum_price, count(*) AS n_orders
         |FROM orders GROUP BY GROUPING SETS ((o_orderpriority,
         |  o_orderstatus), (o_orderpriority), (o_orderstatus), ())
         |ORDER BY grp_id, o_orderpriority NULLS FIRST,
         |  o_orderstatus NULLS FIRST""".stripMargin,
    "rollup_agg" ->
      s"""SELECT o_orderpriority, o_orderstatus,
         |  cast(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
         |    AS bigint) AS grp_id,
         |  ${dsum("o_totalprice")} AS sum_price, count(*) AS n_orders
         |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY grp_id, o_orderpriority NULLS FIRST,
         |  o_orderstatus NULLS FIRST""".stripMargin,
    "pivot_wide" ->
      s"""SELECT user_id,
         |  ${dsum("CASE WHEN event_type = 'click' THEN value END")} AS click,
         |  ${dsum("CASE WHEN event_type = 'error' THEN value END")} AS error,
         |  ${dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
         |  ${dsum("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
         |  ${dsum("CASE WHEN event_type = 'view' THEN value END")} AS view
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "percentiles" ->
      """WITH q AS (SELECT event_type,
        |    quantile_cont(value, [0.25, 0.5, 0.9, 0.99]) AS ps
        |  FROM events GROUP BY event_type)
        |SELECT event_type, round(ps[1], 6) AS p25, round(ps[2], 6) AS p50,
        |  round(ps[3], 6) AS p90, round(ps[4], 6) AS p99
        |FROM q ORDER BY event_type""".stripMargin,
    "sessionize" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |      THEN 1 ELSE 0 END AS new_sess
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (
         |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM g)
         |SELECT user_id, cast(sess_id AS bigint) AS sess_id,
         |  min(ts) AS sess_start, max(ts) AS sess_end,
         |  count(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM s GROUP BY user_id, sess_id
         |ORDER BY user_id, sess_id""".stripMargin,
    "window_lag" ->
      """SELECT event_id, user_id AS ticker_id, ts, value AS price,
        |  round(prev_price, 6) AS prev_price,
        |  round(value - prev_price, 6) AS price_change,
        |  round(CASE WHEN prev_price <> 0
        |    THEN (value - prev_price) / prev_price END, 6) AS pct_change,
        |  round(ma3, 6) AS ma3
        |FROM (
        |  SELECT event_id, user_id, ts, value,
        |    lag(value) OVER w AS prev_price,
        |    avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |      AS ma3
        |  FROM events WHERE event_type = 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |ORDER BY event_id""".stripMargin,
    "range_join" ->
      s"""SELECT c.event_id, c.user_id, c.ts,
         |  count(p.p_user) AS n_purch, ${dsum("p.p_value")} AS sum_purch
         |FROM (SELECT event_id, user_id, ts FROM events
         |      WHERE event_type = 'click') c
         |LEFT JOIN (SELECT user_id AS p_user, ts AS p_ts, value AS p_value
         |      FROM events WHERE event_type = 'purchase') p
         |  ON c.user_id = p.p_user
         |  AND p.p_ts >= c.ts - INTERVAL 1 HOUR AND p.p_ts <= c.ts
         |GROUP BY c.event_id, c.user_id, c.ts
         |ORDER BY c.event_id""".stripMargin,
    "sample_hash" ->
      s"""SELECT event_type,
         |  CASE WHEN (event_id % 1000000007) * 2654435761 % 1000 < 800
         |      THEN 'train'
         |    WHEN (event_id % 1000000007) * 2654435761 % 1000 < 900
         |      THEN 'val'
         |    ELSE 'test' END AS split,
         |  count(*) AS n_events, ${dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "group_cap" ->
      """SELECT source, cast(rnk AS bigint) AS rnk, doc_id
        |FROM (SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY (doc_id % 1000000007) * 2654435761 % 1000000007 ASC,
        |      doc_id ASC) AS rnk
        |  FROM documents)
        |WHERE rnk <= 20 ORDER BY source, rnk""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey AS cust_id, cast(rnk AS bigint) AS rnk,
        |  o_orderkey AS order_id, o_totalprice AS price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY cust_id, rnk""".stripMargin,
    "histogram" ->
      s"""SELECT event_type, cast(floor(value / 10) AS bigint) AS bin,
         |  count(*) AS n, ${dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stratified_sample" ->
      s"""SELECT event_type, count(*) AS n_kept,
         |  ${dsum("value")} AS sum_value
         |FROM events
         |WHERE (event_id % 1000000007) * 2246822519 % 1000 <
         |  CASE event_type WHEN 'view' THEN 50 WHEN 'click' THEN 100
         |    ELSE 1000 END
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // FNV-1a 64 with wrap-around arithmetic, expressed in DuckDB via
    // HUGEINT mod-2^64: fold each UTF-8 byte (hex-pair extraction)
    // with h = (h XOR b) * prime mod 2^64, then re-sign into bigint.
    // Exact twin of the Fnv64 kernel incl. empty text (= offset basis)
    // and multi-byte UTF-8.
    "fingerprint" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    [cast(cast(concat('0x', substr(hex(encode(text)), 2*i+1, 2))
        |       AS int) AS hugeint)
        |     for i in range(octet_length(encode(text)))] AS bytes
        |  FROM documents)
        |SELECT doc_id,
        |  cast(CASE WHEN h >= 9223372036854775808::hugeint
        |            THEN h - 18446744073709551616::hugeint
        |            ELSE h END AS bigint) AS fingerprint
        |FROM (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(14695981039346656037::hugeint, bytes),
        |      (h, b) -> mod(xor(h, b) * 1099511628211::hugeint,
        |                    18446744073709551616::hugeint)) AS h
        |  FROM b)
        |ORDER BY doc_id""".stripMargin,
    "pii_scrub" ->
      """SELECT doc_id,
        |  cast(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS bigint)
        |    AS n_emails,
        |  cast(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
        |    AS bigint) AS n_phones,
        |  regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      """WITH p AS (SELECT CASE
        |    WHEN regexp_matches(lower(text), '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |    WHEN regexp_matches(lower(text),
        |      '(^|\s)(the|a|and|of|to|in|is)(\s|$)') THEN 'en'
        |    WHEN regexp_matches(lower(text),
        |      '(^|\s)(el|la|los|de|que|y|en)(\s|$)') THEN 'es'
        |    ELSE 'und' END AS pred_lang, lang
        |  FROM documents)
        |SELECT pred_lang, count(*) AS n_docs,
        |  cast(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS bigint)
        |    AS n_label_match
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_score" ->
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  cast(length(text) AS bigint) AS n_chars_m,
        |  cast(len(toks) AS bigint) AS n_tokens,
        |  cast(length(text) AS double) / cast(len(toks) AS double)
        |    AS chars_per_token,
        |  cast(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |    AS double) / cast(length(text) AS double) AS punct_ratio,
        |  cast(len(list_filter(toks, x -> x IN ('the','a','and','of','to',
        |    'in','is','el','la','los','de','que','y','en'))) AS double)
        |    / cast(len(toks) AS double) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT source,
        |  cast(sum(len(string_split_regex(lower(trim(text)), '\s+')))
        |    AS bigint) AS ws_tokens,
        |  cast(sum(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS bigint) AS bpe_tokens,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // Sentiment twins filter empty tokens: the codegen'd kernel counts
    // non-empty whitespace tokens (0 for blank text), while a raw
    // string_split_regex yields '' entries for blank/edge-whitespace
    // text — list_filter makes the twin exact for ALL inputs, not just
    // the current clean corpus.
    "sentiment_docs" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    cast(len(list_filter(toks, x -> x IN ('good','great','gain','up',
        |      'fast','big','purchase','signup'))) AS bigint) AS n_pos,
        |    cast(len(list_filter(toks, x -> x IN ('bad','poor','loss','down',
        |      'slow','small','error'))) AS bigint) AS n_neg,
        |    cast(len(toks) AS bigint) AS n_tokens
        |  FROM t)
        |SELECT doc_id, n_pos, n_neg, n_tokens,
        |  cast(n_pos - n_neg AS double) /
        |    cast(greatest(n_tokens, 1) AS double) AS sent_score,
        |  CASE WHEN n_pos > n_neg THEN 'pos'
        |    WHEN n_neg > n_pos THEN 'neg'
        |    ELSE 'neutral' END AS sent_label
        |FROM s ORDER BY doc_id""".stripMargin,
    "sentiment_daily" ->
      """WITH t AS (SELECT user_id, ts,
        |    list_filter(string_split_regex(lower(trim(event_type)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM events),
        |s AS (SELECT user_id, cast(ts AS date) AS day,
        |    cast(len(list_filter(toks, x -> x IN ('good','great','gain','up',
        |      'fast','big','purchase','signup'))) AS bigint) AS n_pos,
        |    cast(len(list_filter(toks, x -> x IN ('bad','poor','loss','down',
        |      'slow','small','error'))) AS bigint) AS n_neg
        |  FROM t)
        |SELECT user_id AS ticker_id, day, count(*) AS n_titles,
        |  cast(sum(n_pos) AS bigint) AS sum_pos,
        |  cast(sum(n_neg) AS bigint) AS sum_neg,
        |  cast(cast(sum(n_pos) AS bigint) - cast(sum(n_neg) AS bigint)
        |    AS double) / cast(count(*) AS double) AS day_score
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Chunking geometry 32/8 (step 24) — sync with TextOps.ChunkTokens
    "chunk_docs" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks, cast(len(toks) AS bigint) AS n_tok,
        |    unnest(range(cast(ceil(greatest(len(toks) - 8, 1) / 24.0)
        |      AS bigint))) AS chunk_id
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id, chunk_id,
        |  cast(least(n_tok - chunk_id * 24, 32) AS bigint) AS n_chunk_tok,
        |  array_to_string(list_slice(toks, chunk_id * 24 + 1,
        |    least(chunk_id * 24 + 32, n_tok)), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "repetition_score" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    [concat(toks[i+1], ' ', toks[i+2], ' ', toks[i+3])
        |     for i in range(len(toks) - 2)] AS tg
        |  FROM t)
        |SELECT doc_id, cast(len(tg) AS bigint) AS n_trigrams,
        |  cast(len(tg) - len(list_distinct(tg)) AS bigint) AS n_dup,
        |  CASE WHEN len(tg) > 0
        |    THEN cast(len(tg) - len(list_distinct(tg)) AS double) /
        |      cast(len(tg) AS double)
        |    ELSE 0.0 END AS dup_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    // Shingle width 8, benchmark = doc_id < 50 — sync with
    // TextOps.ShingleWidth / BenchDocMax
    "contamination" -> ContaminationSql,
    // The Bloom pre-filter admits every true match (no false
    // negatives) and the exact join removes the false positives, so
    // the sketch-accelerated query has the SAME oracle text.
    "contamination_bloom" -> ContaminationSql,
    "corpus_stats" ->
      """WITH t AS (SELECT source, lang, text,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |r AS (SELECT source, lang,
        |    cast(len(toks) AS bigint) AS n_tok,
        |    cast(length(text) AS bigint) AS n_chars,
        |    cast(len(list_filter(toks, x -> x IN ('good','great','gain',
        |      'up','fast','big','purchase','signup'))) AS bigint) AS n_pos,
        |    cast(len(list_filter(toks, x -> x IN ('bad','poor','loss',
        |      'down','slow','small','error'))) AS bigint) AS n_neg,
        |    [concat(toks[i+1], ' ', toks[i+2], ' ', toks[i+3])
        |     for i in range(len(toks) - 2)] AS tg
        |  FROM t),
        |d AS (SELECT *, CASE WHEN len(tg) > 0
        |    THEN cast(len(tg) - len(list_distinct(tg)) AS double) /
        |      cast(len(tg) AS double)
        |    ELSE 0.0 END AS dup_ratio FROM r)
        |SELECT source, lang, count(*) AS n_docs,
        |  cast(sum(n_tok) AS bigint) AS sum_tokens,
        |  cast(sum(cast(cast(n_chars AS double) AS decimal(28,6)))
        |    AS double) / cast(count(*) AS double) AS avg_chars,
        |  cast(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS bigint)
        |    AS short_docs,
        |  cast(sum(n_pos) AS bigint) AS sum_pos,
        |  cast(sum(n_neg) AS bigint) AS sum_neg,
        |  cast(sum(cast(dup_ratio AS decimal(28,6))) AS double) /
        |    cast(count(*) AS double) AS avg_dup_ratio
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Multimodal twin: the Spark side builds a byte-valid PNG/JPEG
    // container per doc (even ids PNG, odd JPEG; header sizes 33 and
    // 30+3·channels) and PARSES the dims back out of the bytes with
    // the ImageMeta kernel; the oracle recomputes the generator's
    // closed form — a parser mis-reading any field hash-mismatches.
    "multimodal_video" ->
      """SELECT doc_id, 'isom' AS brand,
        |  cast(1000 * (1 + strlen(text) % 3) AS bigint) AS timescale,
        |  cast(strlen(text) * 7 AS bigint) AS duration,
        |  cast(1 + strlen(text) % 2 AS bigint) AS n_tracks,
        |  cast((strlen(text) * 7) * 1000
        |    // (1000 * (1 + strlen(text) % 3)) AS bigint) AS duration_ms,
        |  cast(140 + 8 * (1 + strlen(text) % 2) + strlen(text) AS bigint)
        |    AS n_bytes
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "multimodal_audio" ->
      """SELECT doc_id,
        |  cast(1 AS bigint) AS codec,
        |  cast(1 + strlen(text) % 2 AS bigint) AS channels,
        |  cast(8000 + (strlen(text) % 5) * 8000 AS bigint) AS sample_rate,
        |  cast(16 AS bigint) AS bits,
        |  cast(strlen(text) // ((1 + strlen(text) % 2) * 2) AS bigint)
        |    AS n_frames,
        |  cast((strlen(text) // ((1 + strlen(text) % 2) * 2)) * 1000
        |    // (8000 + (strlen(text) % 5) * 8000) AS bigint) AS duration_ms,
        |  cast(strlen(text) + 44 AS bigint) AS n_bytes
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  cast(16 + strlen(text) % 624 AS bigint) AS width,
        |  cast(16 + (strlen(text) * 7) % 464 AS bigint) AS height,
        |  cast(1 + strlen(text) % 3 AS bigint) AS channels,
        |  cast(strlen(text) + CASE WHEN doc_id % 2 = 0 THEN 33
        |    ELSE 30 + 3 * (1 + strlen(text) % 3) END AS bigint) AS n_bytes,
        |  cast((strlen(text) + CASE WHEN doc_id % 2 = 0 THEN 33
        |    ELSE 30 + 3 * (1 + strlen(text) % 3) END + 4095) // 4096
        |    AS bigint) AS n_chunks
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // ByteHistogram portable twin: DuckDB rebuilds each doc's 64-bin
    // byte histogram (bin = byte >> 2) from the raw UTF-8 bytes, the
    // decimal-exact bin-mean centroid (the dsum/davg contract), and
    // the cosine outlier score — hash-verifying the feature kernel.
    "multimodal_features_text" ->
      """WITH nz AS (SELECT doc_id, encode(text) AS eb,
        |    octet_length(encode(text)) AS n
        |  FROM documents
        |  WHERE text IS NOT NULL AND octet_length(encode(text)) > 0),
        |by AS (SELECT doc_id, n,
        |    unnest([cast(concat('0x', substr(hex(eb), 2*i+1, 2)) AS int)
        |      // 4 for i in range(n)]) AS bin
        |  FROM nz),
        |hist AS (SELECT doc_id, n, bin, count(*) AS c
        |  FROM by GROUP BY 1, 2, 3),
        |grid AS (SELECT doc_id, n, j AS bin
        |  FROM nz CROSS JOIN range(64) t(j)),
        |densec AS (SELECT g.doc_id, g.n, g.bin,
        |    coalesce(h.c, 0) AS c
        |  FROM grid g LEFT JOIN hist h
        |    ON g.doc_id = h.doc_id AND g.bin = h.bin),
        |f AS (SELECT doc_id, n,
        |    list(cast(c AS double) / n ORDER BY bin) AS fv
        |  FROM densec GROUP BY doc_id, n),
        |cent AS (SELECT bin,
        |    cast(sum(cast(cast(c AS double) / n AS decimal(28,6)))
        |      AS double) / count(*) AS m
        |  FROM densec GROUP BY bin),
        |cv AS (SELECT list(m ORDER BY bin) AS cvec FROM cent)
        |SELECT doc_id, cast(n AS bigint) AS n_bytes,
        |  cast(list_position(fv, list_max(fv)) - 1 AS bigint) AS top_bin,
        |  round(list_max(fv), 6) AS top_freq,
        |  round(list_cosine_similarity(fv, cvec), 6) AS centroid_cos
        |FROM f, cv ORDER BY doc_id""".stripMargin,
    // Shuffle-export twin: the closed form of what the shards must
    // contain — seeded md5-affine permutation key, key-mod shard,
    // within-shard rank — recomputed from the source table. The
    // Spark side aggregates the WRITTEN files, so a hash match
    // certifies the write→read round trip (ordering included, via
    // the position-weighted checksum).
    "corpus_shuffle" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5('42:' || doc_id), 25, 8))::UBIGINT
        |      AS BIGINT) AS skey
        |  FROM documents),
        |p AS (SELECT doc_id, n_chars, skey, skey % 8 AS shard,
        |    row_number() OVER (PARTITION BY skey % 8
        |      ORDER BY skey, doc_id) AS pos
        |  FROM s)
        |SELECT shard, count(*) AS n_docs,
        |  cast(sum(n_chars) AS bigint) AS sum_chars,
        |  cast(sum(pos * (doc_id % 1000003)) AS bigint) AS ord_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    // Mixture twin: same integer-threshold construction — sqrt(n)
    // rounded to 6 dp BEFORE the exact decimal sum (partition-order
    // independence on the Spark side; same digits here), rate formula
    // in the same operation order, floor to the same 1e-6 grid, and
    // membership as integer-vs-integer compare.
    "mixture_sample" ->
      """WITH pl AS (SELECT lang, count(*) AS n_lang,
        |    cast(round(sqrt(cast(count(*) AS double)), 6)
        |      AS decimal(18,6)) AS w_raw
        |  FROM documents GROUP BY lang),
        |tot AS (SELECT cast(sum(n_lang) AS bigint) AS n_total,
        |    cast(sum(w_raw) AS double) AS w_sum FROM pl),
        |rates AS (SELECT lang, n_lang,
        |    cast(floor(least(1.0,
        |      floor(cast(n_total AS double) * 0.5)
        |        * cast(w_raw AS double) / w_sum
        |        / cast(n_lang AS double)) * 1000000.0) AS bigint) AS thr
        |  FROM pl CROSS JOIN tot)
        |SELECT d.lang, max(r.n_lang) AS n_lang, max(r.thr) AS thr,
        |  count(*) AS n_kept,
        |  cast(sum(d.doc_id) AS bigint) AS kept_checksum
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE (d.doc_id % 1000000007) * 2246822519 % 1000000007
        |    % 1000000 < r.thr
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    // Audit twin: the curation_pipeline CTE chain per doc, with the
    // verdict = first failing stage in pipeline order.
    "curation_audit" ->
      """WITH t AS (SELECT doc_id, source, text,
        |    cast(len(string_split_regex(lower(trim(text)), '\s+'))
        |      AS bigint) AS n_tok,
        |    CASE
        |      WHEN regexp_matches(lower(text), '[\x{4e00}-\x{9fff}]')
        |        THEN 'zh'
        |      WHEN regexp_matches(lower(text),
        |        '(^|\s)(the|a|and|of|to|in|is)(\s|$)') THEN 'en'
        |      WHEN regexp_matches(lower(text),
        |        '(^|\s)(el|la|los|de|que|y|en)(\s|$)') THEN 'es'
        |      ELSE 'und' END AS pred_lang
        |  FROM documents),
        |g AS (SELECT * FROM t
        |  WHERE n_tok >= 20 AND pred_lang IN ('en', 'es')),
        |k AS (SELECT text, min(doc_id) AS keep_id FROM g GROUP BY text),
        |d AS (SELECT DISTINCT g.doc_id, g.source FROM g
        |  JOIN k ON g.text = k.text AND g.doc_id = k.keep_id),
        |c AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (
        |      PARTITION BY source
        |      ORDER BY (doc_id % 1000000007) * 2654435761 % 1000000007 ASC,
        |        doc_id ASC) AS rnk
        |    FROM d) WHERE rnk <= 20),
        |d2 AS (SELECT doc_id FROM d)
        |SELECT t.doc_id, t.source, t.n_tok, t.pred_lang,
        |  CASE WHEN t.n_tok < 20 THEN 'quality'
        |    WHEN t.pred_lang NOT IN ('en', 'es') THEN 'language'
        |    WHEN d2.doc_id IS NULL THEN 'duplicate'
        |    WHEN c.doc_id IS NULL THEN 'source_cap'
        |    ELSE 'kept' END AS verdict
        |FROM t LEFT JOIN d2 USING (doc_id) LEFT JOIN c USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    // Percentile-gate twin: the SINGLE-window global rank — the
    // Spark side's two-level (block-local + broadcast offsets) rank
    // must equal it exactly, which is what the hash verifies.
    "quality_filter" ->
      """WITH t AS (SELECT doc_id, lang,
        |    round(cast(len(list_filter(toks, x -> x IN ('the','a','and',
        |      'of','to','in','is','el','la','los','de','que','y','en')))
        |      AS double) / cast(len(toks) AS double), 6) AS score
        |  FROM (SELECT doc_id, lang,
        |      string_split_regex(lower(trim(text)), '\s+') AS toks
        |    FROM documents)),
        |r AS (SELECT doc_id, lang, score,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY score DESC, doc_id ASC) AS rnk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM t)
        |SELECT doc_id, lang, score, cast(rnk AS bigint) AS rnk,
        |  cast(CASE WHEN rnk <= (3 * n + 4) // 5 THEN 1 ELSE 0 END
        |    AS bigint) AS kept
        |FROM r ORDER BY doc_id""".stripMargin,
    // Gap-report twin: same minute pre-aggregate, same lag-window
    // dark-run arithmetic (leading/internal/trailing).
    "gap_report" ->
      """WITH m AS (SELECT user_id AS ticker_id, cast(ts AS date) AS day,
        |    cast(hour(ts) * 60 + minute(ts) AS bigint) AS mi,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2, 3),
        |g AS (SELECT ticker_id, day, mi, n,
        |    mi - lag(mi) OVER (PARTITION BY ticker_id, day
        |      ORDER BY mi) - 1 AS gap
        |  FROM m)
        |SELECT ticker_id, day, cast(sum(n) AS bigint) AS n_events,
        |  count(*) AS n_minutes,
        |  round(count(*) / 1440.0, 6) AS coverage,
        |  cast(greatest(coalesce(max(gap), 0), min(mi),
        |    1439 - max(mi)) AS bigint) AS max_gap_min
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Bounded-staleness twin: native ASOF picks the freshest ≤-ts
    // match, the CASE nulls it when older than the bound (any older
    // match is staler still); age is exact integer micros.
    "asof_tolerance" ->
      """WITH probe AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |build AS (
        |  SELECT user_id, ts, max(value) AS bval FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts,
        |  CASE WHEN b.ts IS NOT NULL
        |      AND epoch_us(p.ts) - epoch_us(b.ts) <= 1800000000
        |    THEN b.bval END AS asof_value,
        |  CASE WHEN b.ts IS NOT NULL
        |      AND epoch_us(p.ts) - epoch_us(b.ts) <= 1800000000
        |    THEN (epoch_us(p.ts) - epoch_us(b.ts)) // 1000000
        |    END AS age_s
        |FROM probe p ASOF LEFT JOIN build b
        |  ON p.user_id = b.user_id AND b.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    // Realized-vol twin: same minute-close bars (row_number desc ≡
    // max-of-struct), same integer micro-return quantization, exact
    // decimal sum of squares, one terminal round.
    "realized_vol" ->
      """WITH b AS (SELECT ticker_id, day, mi, value AS c FROM (
        |    SELECT user_id AS ticker_id, cast(ts AS date) AS day,
        |      cast(hour(ts) * 60 + minute(ts) AS bigint) AS mi, value,
        |      row_number() OVER (PARTITION BY user_id, cast(ts AS date),
        |        hour(ts) * 60 + minute(ts)
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |r AS (SELECT ticker_id, day, mi, c,
        |    cast(round((c - nullif(lag(c) OVER w, 0))
        |      / nullif(lag(c) OVER w, 0) * 1000000.0,
        |      0) AS bigint) AS k
        |  FROM b WINDOW w AS (PARTITION BY ticker_id, day ORDER BY mi))
        |SELECT ticker_id, day, count(k) AS n_rets,
        |  round(sqrt(cast(sum(cast(k AS decimal(19,0)) * k) AS double))
        |    / 1000000.0, 6) AS rv
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Bucketing twin: single global window rank + the same snake
    // arithmetic — verifies the two-level rank AND the schedule.
    "balance_buckets" ->
      """WITH t AS (SELECT doc_id,
        |    cast(len(string_split_regex(lower(trim(text)), '\s+'))
        |      AS bigint) AS n_tok
        |  FROM documents),
        |r AS (SELECT doc_id, n_tok,
        |    row_number() OVER (ORDER BY n_tok DESC, doc_id ASC) - 1
        |      AS rnk
        |  FROM t),
        |b AS (SELECT doc_id, n_tok, rnk,
        |    CASE WHEN rnk % 32 < 16 THEN rnk % 32
        |      ELSE 31 - rnk % 32 END AS bucket
        |  FROM r)
        |SELECT bucket, count(*) AS n_docs,
        |  cast(sum(n_tok) AS bigint) AS sum_tokens,
        |  cast(max(n_tok) AS bigint) AS max_doc_tokens,
        |  cast(sum(rnk * (doc_id % 1000003)) AS bigint) AS sched_checksum
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // Beta twin: the realized_vol bar/return chain, an unnormalized
    // sum-index per minute, and the exact decimal Σ(k·kM)/Σ(kM²).
    "rolling_beta" ->
      """WITH b AS (SELECT ticker_id, day, mi, value AS c FROM (
        |    SELECT user_id AS ticker_id, cast(ts AS date) AS day,
        |      cast(hour(ts) * 60 + minute(ts) AS bigint) AS mi, value,
        |      row_number() OVER (PARTITION BY user_id, cast(ts AS date),
        |        hour(ts) * 60 + minute(ts)
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |r AS (SELECT ticker_id, day, mi,
        |    cast(round((c - nullif(lag(c) OVER w, 0))
        |      / nullif(lag(c) OVER w, 0) * 1000000.0, 0) AS bigint) AS k
        |  FROM b WINDOW w AS (PARTITION BY ticker_id, day ORDER BY mi)),
        |rr AS (SELECT * FROM r WHERE k IS NOT NULL),
        |ix AS (SELECT day, mi, cast(sum(k) AS bigint) AS km
        |  FROM rr GROUP BY 1, 2)
        |SELECT rr.ticker_id, rr.day, count(*) AS n_obs,
        |  round(cast(sum(cast(rr.k AS decimal(38,0)) * ix.km) AS double)
        |    / nullif(cast(sum(cast(ix.km AS decimal(38,0)) * ix.km)
        |        AS double), 0), 6) AS beta
        |FROM rr JOIN ix ON rr.day = ix.day AND rr.mi = ix.mi
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Segment-dedup twin: same 10-token windows over the same
    // whitespace tokens, same md5 keys, first occurrence by
    // (doc_id, line_no), same per-doc audit sums.
    "paragraph_dedup" ->
      """WITH segs AS (
        |  SELECT doc_id, list_transform(range((len(sp) + 9) // 10),
        |      i -> array_to_string(
        |        list_slice(sp, i * 10 + 1, i * 10 + 10), ' ')) AS paras
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS sp
        |        FROM documents)),
        |l AS (SELECT doc_id, line_no, para, md5(para) AS h FROM (
        |    SELECT doc_id, unnest(paras) AS para,
        |      generate_subscripts(paras, 1) AS line_no
        |    FROM segs)
        |  WHERE length(para) > 0),
        |m AS (SELECT doc_id, length(para) AS len,
        |    CASE WHEN row_number() OVER (PARTITION BY h
        |      ORDER BY doc_id, line_no) = 1 THEN 1 ELSE 0 END AS kept
        |  FROM l)
        |SELECT doc_id, count(*) AS n_paras,
        |  cast(sum(kept) AS bigint) AS n_kept,
        |  cast(sum(kept * len) AS bigint) AS kept_chars,
        |  cast(sum((1 - kept) * len) AS bigint) AS dropped_chars
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Attribution twin: native ASOF against per-(user, ts) collapsed
    // touches (max event_id pins the tie), 24 h staleness nulled.
    "attribution" ->
      s"""WITH touch AS (
         |  SELECT user_id, ts, max_by(event_type, event_id) AS channel
         |  FROM events WHERE event_type IN ('click', 'view')
         |  GROUP BY 1, 2),
         |conv AS (SELECT user_id, ts, value FROM events
         |  WHERE event_type = 'purchase'),
         |a AS (SELECT
         |    CASE WHEN t.ts IS NOT NULL
         |        AND epoch_us(c.ts) - epoch_us(t.ts) <= 86400000000
         |      THEN t.channel ELSE 'unattributed' END AS channel,
         |    c.value AS value
         |  FROM conv c ASOF LEFT JOIN touch t
         |    ON c.user_id = t.user_id AND t.ts <= c.ts)
         |SELECT channel, count(*) AS n_conv,
         |  round(${dsum("value")}, 6) AS revenue
         |FROM a GROUP BY channel ORDER BY channel""".stripMargin,
    // Scorecard twin: identical md5-parity arms, exact decimal
    // Σx/Σx², Welch z from the rounded published stats.
    "experiment_stats" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |p AS (SELECT user_id,
        |    cast(sum(cast(value AS decimal(18,6))) AS decimal(18,6))
        |      AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT
        |    cast(('0x' || substr(md5('exp1:' || u.user_id), 25, 8))
        |      ::UBIGINT % 2 AS bigint) AS arm,
        |    coalesce(p.rev, cast(0 AS decimal(18,6))) AS rev
        |  FROM u LEFT JOIN p USING (user_id)),
        |s AS (SELECT arm, count(*) AS n_users,
        |    cast(sum(rev) AS double) AS sx,
        |    cast(sum(cast(rev AS decimal(19,6)) * rev) AS double) AS sxx
        |  FROM m GROUP BY arm),
        |st AS (SELECT arm, n_users,
        |    round(sx / n_users, 6) AS mean_rev,
        |    round((sxx - sx * sx / n_users) / (n_users - 1), 6) AS var_rev
        |  FROM s)
        |SELECT a.arm, a.n_users, a.mean_rev, a.var_rev,
        |  round((a.mean_rev - b.mean_rev) /
        |    sqrt(a.var_rev / a.n_users + b.var_rev / b.n_users), 6)
        |    AS z_score
        |FROM st a JOIN st b ON a.arm <> b.arm
        |ORDER BY a.arm""".stripMargin,
    // Linkage twin: the same entity collapse, block key, length
    // prefilter, and threshold-2 Levenshtein (both engines: unit-cost
    // DP).
    "fuzzy_join" ->
      """WITH e AS (SELECT p_brand, p_name, count(*) AS n,
        |    min(p_partkey) AS canon
        |  FROM part GROUP BY 1, 2)
        |SELECT a.p_brand, a.p_name AS a_name, b.p_name AS b_name,
        |  cast(levenshtein(a.p_name, b.p_name) AS bigint) AS dist,
        |  a.n AS n_a, b.n AS n_b,
        |  a.canon AS canon_a, b.canon AS canon_b
        |FROM e a JOIN e b
        |  ON a.p_brand = b.p_brand AND a.p_name < b.p_name
        |WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
        |  AND levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a.p_brand, a_name, b_name""".stripMargin,
    // Decomposition twin: the same micro-unit integer chain — rev_u
    // long, 7-day trend sum long, weekday mean of 7·rev_u − S.
    "seasonal_decomp" ->
      """WITH daily AS (SELECT cast(o_orderdate AS date) AS day,
        |    cast(sum(cast(o_totalprice AS decimal(18,6))) * 1000000
        |      AS bigint) AS rev_u
        |  FROM orders GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
        |    INTERVAL 1 DAY))::date AS day),
        |series AS (SELECT s.day, coalesce(d.rev_u, 0) AS rev_u
        |  FROM spine s LEFT JOIN daily d USING (day)),
        |t AS (SELECT day, rev_u,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN cast(sum(rev_u) OVER w AS bigint) END AS ts_u,
        |    cast(dayofweek(day) AS bigint) AS wd
        |  FROM series
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |    AND 3 FOLLOWING)),
        |seas AS (SELECT wd,
        |    round(cast(sum(rev_u * 7 - ts_u) AS double)
        |      / (count(*) * 7000000.0), 6) AS seasonal
        |  FROM t WHERE ts_u IS NOT NULL GROUP BY wd)
        |SELECT t.day, t.wd,
        |  round(rev_u / 1e6, 6) AS revenue,
        |  round(ts_u / 7e6, 6) AS trend,
        |  s.seasonal,
        |  round(round(rev_u / 1e6, 6) - round(ts_u / 7e6, 6)
        |    - s.seasonal, 6) AS residual
        |FROM t LEFT JOIN seas s USING (wd)
        |ORDER BY t.day""".stripMargin,
    // Robust-screen twin: exact interpolated medians (quantile_cont ≡
    // percentile), both quantized to 6 dp before the MAD gate.
    "robust_outliers" ->
      """WITH med AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY 1),
        |d AS (SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
        |  FROM events e JOIN med m USING (event_type)),
        |st AS (SELECT event_type, count(*) AS n, first(med) AS med,
        |    round(quantile_cont(dev, 0.5), 6) AS mad
        |  FROM d GROUP BY event_type)
        |SELECT d.event_type, st.n, st.med, st.mad,
        |  cast(sum(CASE WHEN d.dev > 3 * 1.4826 * st.mad
        |    THEN 1 ELSE 0 END) AS bigint) AS n_out
        |FROM d JOIN st USING (event_type)
        |GROUP BY d.event_type, st.n, st.med, st.mad
        |ORDER BY d.event_type""".stripMargin,
    // Skew-report twin: the single-window global rank the two-level
    // decomposition must reproduce, then the same exact-decimal Gini.
    "skew_report" ->
      """WITH k AS (SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, cnt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cnt ASC, user_id ASC) AS rnk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM k)
        |SELECT event_type, count(*) AS n_keys,
        |  cast(sum(cnt) AS bigint) AS n_rows,
        |  round(cast(max(cnt) AS double) / cast(sum(cnt) AS double), 6)
        |    AS top1_share,
        |  round(cast(sum(CASE WHEN rnk > n - 10 THEN cnt ELSE 0 END)
        |      AS double) / cast(sum(cnt) AS double), 6) AS top10_share,
        |  round(cast(sum(cast(2 * rnk - 1 AS decimal(38,0)) * cnt)
        |      - cast(count(*) AS decimal(38,0)) * sum(cnt) AS double)
        |    / cast(cast(count(*) AS decimal(38,0)) * sum(cnt) AS double),
        |    6) AS gini
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // CMS twin: the identical relational sketch — same md5-affine
    // bucket hashes, same d×w counter table, same min-over-rows
    // estimates for the same top-20 probe set.
    "cms_freq" ->
      """WITH k AS (SELECT user_id, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |dd AS (SELECT unnest(range(4)) AS d),
        |cells AS (SELECT dd.d,
        |    cast(('0x' || substr(md5('cms:' || dd.d || ':' || k.user_id),
        |      25, 8))::UBIGINT % 1024 AS bigint) AS b, k.cnt
        |  FROM k CROSS JOIN dd),
        |counters AS (SELECT d, b, sum(cnt) AS c FROM cells GROUP BY 1, 2),
        |probes AS (SELECT user_id, cnt FROM k
        |  ORDER BY cnt DESC, user_id ASC LIMIT 20),
        |est AS (SELECT p.user_id, p.cnt AS exact_cnt, min(c.c) AS est
        |  FROM probes p CROSS JOIN dd
        |  JOIN counters c ON c.d = dd.d AND c.b =
        |    cast(('0x' || substr(md5('cms:' || dd.d || ':' || p.user_id),
        |      25, 8))::UBIGINT % 1024 AS bigint)
        |  GROUP BY 1, 2)
        |SELECT user_id, exact_cnt, cast(est AS bigint) AS est,
        |  cast(est - exact_cnt AS bigint) AS overcount
        |FROM est ORDER BY exact_cnt DESC, user_id ASC""".stripMargin,
    // Feature-card twin: 1-based generate_subscripts shifted to the
    // 0-based dim, the same round(v*1e6) long micro-unit quantization
    // (round 17 — integer moment sums; each double division below
    // mirrors the Spark expression tree exactly so every rounding is
    // shared), the same last-ulp variance guard.
    "embed_stats" ->
      """WITH d AS (SELECT
        |    unnest(cast(embedding AS double[])) AS v,
        |    generate_subscripts(cast(embedding AS double[]), 1) - 1
        |      AS dim0
        |  FROM embeddings),
        |du AS (SELECT cast(dim0 AS bigint) AS dim, v,
        |    cast(round(v * cast(1000000.0 AS double), 0) AS bigint)
        |      AS vu FROM d),
        |s AS (SELECT dim, count(*) AS n,
        |    cast(sum(vu) AS double) AS su,
        |    cast(sum(vu * vu) AS double) AS suu,
        |    min(v) AS min_v, max(v) AS max_v,
        |    cast(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS bigint)
        |      AS n_zero
        |  FROM du GROUP BY 1)
        |SELECT dim, n,
        |  round(su / cast(1000000.0 AS double) / n, 6) AS mean,
        |  round(sqrt(greatest((suu / 1e12
        |      - (su / cast(1000000.0 AS double))
        |        * (su / cast(1000000.0 AS double)) / n)
        |    / (n - 1), 0)), 6) AS std,
        |  round(min_v, 6) AS min_v, round(max_v, 6) AS max_v, n_zero
        |FROM s ORDER BY dim""".stripMargin,
    // Basket twin: same distinct collapse, basket-bounded pair join,
    // integer lift numerator/denominator, same top-20 tiebreak.
    "co_occurrence" ->
      """WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM l),
        |pc AS (SELECT l_partkey, count(*) AS c FROM l GROUP BY 1),
        |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    count(*) AS support
        |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2)
        |SELECT p.pa, p.pb, p.support, ca.c AS ca, cb.c AS cb,
        |  round(cast(p.support * no.n_orders AS double)
        |    / cast(ca.c * cb.c AS double), 6) AS lift
        |FROM p, no
        |JOIN pc ca ON ca.l_partkey = p.pa
        |JOIN pc cb ON cb.l_partkey = p.pb
        |ORDER BY p.support DESC, p.pa ASC, p.pb ASC
        |LIMIT 20""".stripMargin,
    // Audit twin: the same six checks as scalar subqueries.
    "ref_audit" ->
      """WITH rows(check_name, n_bad, n_total) AS (VALUES
        |  ('lineitem_orphan_order',
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
        |    (SELECT count(*) FROM lineitem)),
        |  ('orders_orphan_customer',
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT count(*) FROM orders)),
        |  ('customer_orphan_nation',
        |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
        |    (SELECT count(*) FROM customer)),
        |  ('orders_dup_pk',
        |    (SELECT count(o_orderkey) - count(DISTINCT o_orderkey)
        |      FROM orders),
        |    (SELECT count(*) FROM orders)),
        |  ('orders_null_custkey',
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
        |    (SELECT count(*) FROM orders)),
        |  ('lineitem_null_partkey',
        |    (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
        |    (SELECT count(*) FROM lineitem)))
        |SELECT check_name, cast(n_bad AS bigint) AS n_bad,
        |  cast(n_total AS bigint) AS n_total
        |FROM rows ORDER BY check_name""".stripMargin,
    // Cardinality twin: the same key-grain collapse and exact
    // Σ cL·cR per edge; worst key tie broken (prod, k) descending.
    "join_cardinality" ->
      """WITH lo AS (
        |  SELECT 'lineitem_orders' AS join_edge, kl.k, kl.c AS cl,
        |    kr.c AS cr
        |  FROM (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
        |        GROUP BY 1) kl
        |  JOIN (SELECT o_orderkey AS k, count(*) AS c FROM orders
        |        GROUP BY 1) kr USING (k)
        |  UNION ALL
        |  SELECT 'lineitem_part', kl.k, kl.c, kr.c
        |  FROM (SELECT l_partkey AS k, count(*) AS c FROM lineitem
        |        GROUP BY 1) kl
        |  JOIN (SELECT p_partkey AS k, count(*) AS c FROM part
        |        GROUP BY 1) kr USING (k)
        |  UNION ALL
        |  SELECT 'orders_customer', kl.k, kl.c, kr.c
        |  FROM (SELECT o_custkey AS k, count(*) AS c FROM orders
        |        GROUP BY 1) kl
        |  JOIN (SELECT c_custkey AS k, count(*) AS c FROM customer
        |        GROUP BY 1) kr USING (k)),
        |agg AS (SELECT join_edge,
        |    cast(sum(cl * cr) AS bigint) AS est_rows,
        |    count(*) AS n_match_keys
        |  FROM lo GROUP BY 1),
        |tops AS (SELECT join_edge, k AS top_key,
        |    cast(cl * cr AS bigint) AS top_contrib
        |  FROM (SELECT *, row_number() OVER (PARTITION BY join_edge
        |      ORDER BY cl * cr DESC, k DESC) AS rn FROM lo)
        |  WHERE rn = 1),
        |sides(join_edge, n_left, d_left, n_right, d_right) AS (
        |  SELECT 'lineitem_orders',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(DISTINCT l_orderkey) FROM lineitem),
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL SELECT 'lineitem_part',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(DISTINCT l_partkey) FROM lineitem),
        |    (SELECT count(*) FROM part),
        |    (SELECT count(DISTINCT p_partkey) FROM part)
        |  UNION ALL SELECT 'orders_customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(DISTINCT o_custkey) FROM orders),
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(DISTINCT c_custkey) FROM customer))
        |SELECT s.join_edge,
        |  cast(s.n_left AS bigint) AS n_left,
        |  cast(s.d_left AS bigint) AS d_left,
        |  cast(s.n_right AS bigint) AS n_right,
        |  cast(s.d_right AS bigint) AS d_right,
        |  a.n_match_keys, a.est_rows, t.top_key, t.top_contrib
        |FROM sides s JOIN agg a USING (join_edge)
        |JOIN tops t USING (join_edge)
        |ORDER BY s.join_edge""".stripMargin,
    // PageRank twin: five unrolled iterations of the identical
    // integer recurrence base + (17·Σ(rank DIV deg)) DIV 20.
    "pagerank" ->
      """WITH l AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_partkey < b.l_partkey),
        |ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM p
        |  UNION ALL SELECT b, a FROM p),
        |dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
        |r0 AS MATERIALIZED (SELECT src AS node, cast(1000000000 AS bigint) AS r
        |  FROM dg),
        |r1 AS MATERIALIZED (SELECT dg.src AS node, cast(150000000 +
        |    (17 * coalesce(s.s, 0)) // 20 AS bigint) AS r
        |  FROM dg LEFT JOIN (SELECT ed.dst, sum(r0.r // dg.deg) AS s
        |    FROM r0 JOIN dg ON r0.node = dg.src
        |    JOIN ed ON r0.node = ed.src GROUP BY 1) s
        |    ON dg.src = s.dst),
        |r2 AS MATERIALIZED (SELECT dg.src AS node, cast(150000000 +
        |    (17 * coalesce(s.s, 0)) // 20 AS bigint) AS r
        |  FROM dg LEFT JOIN (SELECT ed.dst, sum(r1.r // dg.deg) AS s
        |    FROM r1 JOIN dg ON r1.node = dg.src
        |    JOIN ed ON r1.node = ed.src GROUP BY 1) s
        |    ON dg.src = s.dst),
        |r3 AS MATERIALIZED (SELECT dg.src AS node, cast(150000000 +
        |    (17 * coalesce(s.s, 0)) // 20 AS bigint) AS r
        |  FROM dg LEFT JOIN (SELECT ed.dst, sum(r2.r // dg.deg) AS s
        |    FROM r2 JOIN dg ON r2.node = dg.src
        |    JOIN ed ON r2.node = ed.src GROUP BY 1) s
        |    ON dg.src = s.dst),
        |r4 AS MATERIALIZED (SELECT dg.src AS node, cast(150000000 +
        |    (17 * coalesce(s.s, 0)) // 20 AS bigint) AS r
        |  FROM dg LEFT JOIN (SELECT ed.dst, sum(r3.r // dg.deg) AS s
        |    FROM r3 JOIN dg ON r3.node = dg.src
        |    JOIN ed ON r3.node = ed.src GROUP BY 1) s
        |    ON dg.src = s.dst),
        |r5 AS MATERIALIZED (SELECT dg.src AS node, cast(150000000 +
        |    (17 * coalesce(s.s, 0)) // 20 AS bigint) AS r
        |  FROM dg LEFT JOIN (SELECT ed.dst, sum(r4.r // dg.deg) AS s
        |    FROM r4 JOIN dg ON r4.node = dg.src
        |    JOIN ed ON r4.node = ed.src GROUP BY 1) s
        |    ON dg.src = s.dst)
        |SELECT cast(row_number() OVER (ORDER BY r.r DESC, r.node ASC)
        |    AS bigint) AS rnk,
        |  r.node AS part_id, dg.deg, r.r AS rank_u
        |FROM r5 r JOIN dg ON r.node = dg.src
        |ORDER BY r.r DESC, r.node ASC LIMIT 20""".stripMargin,
    // Trending twin: same day-grain counts, same 7-row lag frame,
    // same exact-integer score with one terminal round.
    "trending" ->
      """WITH d AS (SELECT event_type, cast(ts AS date) AS day,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, cnt,
        |    sum(cnt) OVER w AS sum_prev, count(cnt) OVER w AS n_prev
        |  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, cnt, cast(sum_prev AS bigint)
        |    AS sum_prev,
        |  round(cnt * 7 / cast(sum_prev AS double), 6) AS trend_score
        |FROM t WHERE n_prev = 7 AND cnt >= 10 AND sum_prev > 0
        |ORDER BY trend_score DESC, day ASC, event_type ASC
        |LIMIT 20""".stripMargin,
    // PSI twin: same fixed bins, exact integer shares, 9 dp-quantized
    // terms summed as exact decimals, one terminal round.
    "drift_psi" ->
      """WITH cells AS (
        |  SELECT (cast(o_orderdate AS date) < DATE '1998-01-01')
        |      AS is_ref, u.feature, u.bin
        |  FROM orders, unnest([
        |    {'feature': 'price_bucket',
        |     'bin': cast(cast(floor(o_totalprice / 50000.0) AS bigint)
        |       AS varchar)},
        |    {'feature': 'order_priority', 'bin': o_orderpriority}])
        |    AS t(u)),
        |bc AS (SELECT feature, bin,
        |    sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
        |    sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_n
        |  FROM cells GROUP BY 1, 2),
        |tot AS (SELECT feature, sum(ref_n) AS ref_t, sum(cur_n) AS cur_t
        |  FROM bc GROUP BY 1)
        |SELECT bc.feature,
        |  cast(first(tot.ref_t) AS bigint) AS n_ref,
        |  cast(first(tot.cur_t) AS bigint) AS n_cur,
        |  count(*) AS n_bins,
        |  cast(sum(CASE WHEN bc.ref_n = 0 OR bc.cur_n = 0
        |    THEN 1 ELSE 0 END) AS bigint) AS n_one_sided,
        |  round(cast(coalesce(sum(CASE WHEN bc.ref_n > 0 AND bc.cur_n > 0
        |    THEN cast(round(
        |      (bc.ref_n / cast(tot.ref_t AS double)
        |        - bc.cur_n / cast(tot.cur_t AS double))
        |      * ln((bc.ref_n / cast(tot.ref_t AS double))
        |        / (bc.cur_n / cast(tot.cur_t AS double))), 9)
        |      AS decimal(28,9)) END), 0) AS double), 6) AS psi
        |FROM bc JOIN tot USING (feature)
        |GROUP BY bc.feature ORDER BY bc.feature""".stripMargin,
    // Time-to-convert twin: the funnel_stages chain, exact
    // interpolated percentiles of the same hour values.
    "funnel_times" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3, min(s2.t1) AS t1
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
        |SELECT '2_click' AS stage, count(*) AS n_users,
        |  round(quantile_cont(cast(epoch_us(t2) - epoch_us(t1)
        |    AS double) / 3600000000.0, 0.5), 6) AS p50_hours,
        |  round(quantile_cont(cast(epoch_us(t2) - epoch_us(t1)
        |    AS double) / 3600000000.0, 0.9), 6) AS p90_hours
        |FROM s2
        |UNION ALL
        |SELECT '3_purchase', count(*),
        |  round(quantile_cont(cast(epoch_us(t3) - epoch_us(t1)
        |    AS double) / 3600000000.0, 0.5), 6),
        |  round(quantile_cont(cast(epoch_us(t3) - epoch_us(t1)
        |    AS double) / 3600000000.0, 0.9), 6)
        |FROM s3
        |ORDER BY stage""".stripMargin,
    // Linear-attribution twin: plain inequality join (the day
    // blocking changes the EXECUTION shape, not the pair set), same
    // 6 dp credit quantization, same exact decimal channel sums.
    "attribution_linear" ->
      """WITH touch AS (SELECT user_id, epoch_us(ts) AS t_us,
        |    event_type AS channel
        |  FROM events WHERE event_type IN ('click', 'view')),
        |conv AS (SELECT user_id, event_id AS conv_id, epoch_us(ts)
        |    AS p_us, value
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT c.conv_id, t.channel, c.value, count(*) AS c
        |  FROM conv c JOIN touch t ON c.user_id = t.user_id
        |    AND t.t_us <= c.p_us AND c.p_us - t.t_us <= 86400000000
        |  GROUP BY 1, 2, 3),
        |n AS (SELECT conv_id, sum(c) AS n FROM m GROUP BY 1),
        |credited AS (SELECT m.channel, m.conv_id, m.c,
        |    cast(round(m.value * m.c / cast(n.n AS double), 6)
        |      AS decimal(18,6)) AS credit
        |  FROM m JOIN n USING (conv_id)),
        |unatt AS (SELECT 'unattributed' AS channel, conv_id,
        |    cast(1 AS bigint) AS c,
        |    cast(round(value, 6) AS decimal(18,6)) AS credit
        |  FROM conv WHERE conv_id NOT IN (SELECT conv_id FROM m)),
        |allc AS (SELECT * FROM credited UNION ALL SELECT * FROM unatt)
        |SELECT channel, count(DISTINCT conv_id) AS n_conv,
        |  cast(sum(c) AS bigint) AS n_touches,
        |  round(cast(sum(credit) AS double), 6) AS revenue
        |FROM allc GROUP BY channel ORDER BY channel""".stripMargin,
    // Gopher-rule twin: same (doc, token) grain, same integer
    // cross-multiplied thresholds, same first-fail verdict order.
    "gopher_rules" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)),
        |      '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |pt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |s AS (SELECT doc_id,
        |    cast(sum(tf) AS bigint) AS n_tok,
        |    cast(max(tf) AS bigint) AS max_tf,
        |    cast(sum(tf * length(tok)) AS bigint) AS sum_len,
        |    cast(sum(CASE WHEN tok IN ('the','a','and','of','to')
        |      THEN 1 ELSE 0 END) AS bigint) AS n_stop
        |  FROM pt GROUP BY 1)
        |SELECT doc_id, n_tok, sum_len, max_tf, n_stop,
        |  CASE WHEN n_tok < 20 OR n_tok > 90 THEN 'word_count'
        |       WHEN sum_len < 3 * n_tok OR sum_len > 10 * n_tok
        |         THEN 'word_length'
        |       WHEN n_stop < 2 THEN 'stopword'
        |       WHEN max_tf * 5 > n_tok THEN 'repetition'
        |       ELSE 'kept' END AS verdict
        |FROM s ORDER BY doc_id""".stripMargin,
    // Bigram-LM twin: identical add-one model from identical integer
    // counts; ln only inside the 9 dp-quantized per-bigram value
    // (decimal sum per doc, one terminal round — the psi discipline).
    "lm_perplexity" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |u AS (SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM t)),
        |bb AS (SELECT doc_id,
        |    unnest([{'w1': toks[i+1], 'w2': toks[i+2]}
        |      for i in range(len(toks) - 1)]) AS b
        |  FROM t),
        |bi AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bb),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
        |cx AS (SELECT w1, cast(sum(c2) AS bigint) AS ctx
        |  FROM c2 GROUP BY 1),
        |m AS (SELECT c2.w1, c2.w2,
        |    cast(round(ln(cast(c2.c2 + 1 AS double)
        |      / cast(cx.ctx + u.v AS double)), 9)
        |      AS decimal(28,9)) AS q9
        |  FROM c2 JOIN cx USING (w1) CROSS JOIN u),
        |d AS (SELECT bi.doc_id, count(*) AS n_big, -sum(m.q9) AS nll
        |  FROM bi JOIN m USING (w1, w2) GROUP BY 1)
        |SELECT doc_id, cast(n_big AS bigint) AS n_big,
        |  round(cast(nll AS double) / n_big, 6) AS avg_nll,
        |  CASE WHEN round(cast(nll AS double) / n_big, 6) <= 3.40
        |    THEN 1 ELSE 0 END AS kept
        |FROM d ORDER BY doc_id""".stripMargin,
    // Interval-coverage twin: identical integer endpoints (exact
    // decimal 6 dp duration scaling), SINGLE-window prefix max —
    // verifying the Spark side's two-level decomposition ≡ global.
    "interval_merge" ->
      """WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
        |    epoch_us(ts) + cast(cast(value AS decimal(18,6)) * 1000000
        |      AS bigint) * 60 AS end_us
        |  FROM events),
        |w AS (SELECT user_id, t_us, end_us,
        |    max(end_us) OVER (PARTITION BY user_id
        |      ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p
        |  FROM iv)
        |SELECT user_id, count(*) AS n_raw,
        |  cast(sum(CASE WHEN p IS NULL OR t_us > p THEN 1 ELSE 0 END)
        |    AS bigint) AS n_merged,
        |  cast(sum(greatest(end_us - greatest(t_us, coalesce(p, t_us)),
        |    0)) AS bigint) AS covered_us
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // Sweep-line twin: same ±1 points, single-window running sum,
    // peak + first attaining instant.
    "concurrency_peak" ->
      """WITH iv AS (SELECT event_type, epoch_us(ts) AS t,
        |    epoch_us(ts) + cast(cast(value AS decimal(18,6)) * 1000000
        |      AS bigint) * 60 AS e
        |  FROM events),
        |pts AS (SELECT event_type, t, 1 AS d FROM iv
        |  UNION ALL SELECT event_type, e, -1 FROM iv),
        |r AS (SELECT event_type, t,
        |    sum(d) OVER (PARTITION BY event_type ORDER BY t, d
        |      ROWS UNBOUNDED PRECEDING) AS run
        |  FROM pts),
        |m AS (SELECT event_type, max(run) AS peak FROM r GROUP BY 1),
        |n AS (SELECT event_type, count(*) AS n_intervals
        |  FROM iv GROUP BY 1)
        |SELECT m.event_type, n.n_intervals,
        |  cast(m.peak AS bigint) AS peak,
        |  cast(min(r.t) AS bigint) AS peak_ts_us
        |FROM m JOIN r ON r.event_type = m.event_type AND r.run = m.peak
        |JOIN n ON n.event_type = m.event_type
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // Transition-matrix twin: same (user, day) blocking, integer
    // ppm division.
    "event_transitions" ->
      """WITH s AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS blk, event_type, ts,
        |    event_id
        |  FROM events),
        |p AS (SELECT lag(event_type) OVER (PARTITION BY user_id, blk
        |      ORDER BY ts, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM s),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, cast(c.n AS bigint) AS n,
        |  cast(c.n * 1000000 // tot.tot AS bigint) AS p_ppm
        |FROM c JOIN tot USING (from_type) ORDER BY 1, 2""".stripMargin,
    // PIT-lookup twin: the scd2_dim change chain, deduped to the
    // winning version per (user, instant), native ASOF LEFT JOIN.
    "scd2_lookup" ->
      """WITH p AS (SELECT user_id, ts, event_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id, value FROM p
        |  WHERE prev_value IS NULL OR value <> prev_value),
        |v AS (SELECT user_id, ts, value AS price,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS version
        |  FROM c),
        |v2 AS (SELECT user_id, ts, max(version) AS version,
        |    arg_max(price, version) AS price
        |  FROM v GROUP BY 1, 2),
        |k AS (SELECT e.user_id, e.value, v2.version, v2.price
        |  FROM (SELECT user_id, ts, event_id, value FROM events
        |    WHERE event_type = 'click') e
        |  ASOF LEFT JOIN v2 ON e.user_id = v2.user_id
        |    AND e.ts >= v2.ts)
        |SELECT user_id AS ticker_id,
        |  cast(coalesce(version, 0) AS bigint) AS version,
        |  count(*) AS n_clicks, max(price) AS price,
        |  cast(sum(cast(value AS decimal(28,6))) AS double)
        |    AS click_value
        |FROM k GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Snapshot-diff twin: same derived A/B snapshots, null-safe
    // per-column compares, one aggregate fanned to metric rows.
    "snapshot_diff" ->
      """WITH a AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
        |b AS (SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 103 = 0 THEN 'X'
        |      ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 100.0
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 89 <> 0),
        |j AS (SELECT a.o_orderkey IS NOT NULL AS in_a,
        |    b.o_orderkey IS NOT NULL AS in_b,
        |    CASE WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
        |      THEN 1 ELSE 0 END
        |    + CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |      THEN 1 ELSE 0 END
        |    + CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |      THEN 1 ELSE 0 END
        |    + CASE WHEN a.o_orderdate IS DISTINCT FROM b.o_orderdate
        |      THEN 1 ELSE 0 END
        |    + CASE WHEN a.o_orderpriority
        |        IS DISTINCT FROM b.o_orderpriority
        |      THEN 1 ELSE 0 END AS n_chg,
        |    CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |      THEN 1 ELSE 0 END AS chg_price,
        |    CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |      THEN 1 ELSE 0 END AS chg_status
        |  FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey),
        |s AS (SELECT
        |    cast(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS bigint)
        |      AS rows_a,
        |    cast(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS bigint)
        |      AS rows_b,
        |    cast(sum(CASE WHEN NOT in_a AND in_b THEN 1 ELSE 0 END)
        |      AS bigint) AS added,
        |    cast(sum(CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END)
        |      AS bigint) AS removed,
        |    cast(sum(CASE WHEN in_a AND in_b AND n_chg > 0
        |      THEN 1 ELSE 0 END) AS bigint) AS changed,
        |    cast(sum(CASE WHEN in_a AND in_b AND n_chg = 0
        |      THEN 1 ELSE 0 END) AS bigint) AS unchanged,
        |    cast(sum(CASE WHEN in_a AND in_b THEN chg_price
        |      ELSE 0 END) AS bigint) AS chg_totalprice,
        |    cast(sum(CASE WHEN in_a AND in_b THEN chg_status
        |      ELSE 0 END) AS bigint) AS chg_orderstatus
        |  FROM j)
        |SELECT 'added' AS metric, added AS n FROM s
        |UNION ALL SELECT 'changed', changed FROM s
        |UNION ALL SELECT 'chg_orderstatus', chg_orderstatus FROM s
        |UNION ALL SELECT 'chg_totalprice', chg_totalprice FROM s
        |UNION ALL SELECT 'removed', removed FROM s
        |UNION ALL SELECT 'rows_a', rows_a FROM s
        |UNION ALL SELECT 'rows_b', rows_b FROM s
        |UNION ALL SELECT 'unchanged', unchanged FROM s
        |ORDER BY metric""".stripMargin,
    // OLS twin: identical integer-quantized sums in hugeint (the
    // int128 mirror of Spark's decimal(38,0)), same single terminal
    // double divisions in the same order.
    "ols_brand" ->
      """WITH li AS (SELECT l_partkey,
        |    cast(l_quantity AS bigint) AS x,
        |    cast(cast(l_extendedprice AS decimal(18,6)) * 1000000
        |      AS bigint) AS y
        |  FROM lineitem),
        |s AS (SELECT p.p_brand, count(*) AS n,
        |    sum(cast(x AS hugeint)) AS sx,
        |    sum(cast(y AS hugeint)) AS sy,
        |    sum(cast(x AS hugeint) * y) AS sxy,
        |    sum(cast(x AS hugeint) * x) AS sx2,
        |    sum(cast(y AS hugeint) * y) AS sy2
        |  FROM li JOIN (SELECT DISTINCT p_partkey, p_brand
        |    FROM part) p ON li.l_partkey = p.p_partkey
        |  GROUP BY 1)
        |SELECT p_brand, n,
        |  round(cast(n * sxy - sx * sy AS double)
        |    / cast(n * sx2 - sx * sx AS double) / 1e6, 6) AS slope,
        |  round(cast(sy * sx2 - sx * sxy AS double)
        |    / cast(n * sx2 - sx * sx AS double) / 1e6, 6) AS intercept,
        |  round((cast(n * sxy - sx * sy AS double)
        |      / cast(n * sx2 - sx * sx AS double))
        |    * (cast(n * sxy - sx * sy AS double)
        |      / cast(n * sy2 - sy * sy AS double)), 6) AS r2
        |FROM s ORDER BY p_brand""".stripMargin,
    // Profile twin: same 3-cell explode, 9 dp-quantized entropy
    // terms, (count DESC, value DESC) modal tie-break.
    "column_profile" ->
      """WITH cells AS (SELECT u.c['column'] AS "column",
        |    coalesce(u.c['val'], '<null>') AS val
        |  FROM (SELECT unnest([
        |      {'column': 'o_orderstatus', 'val': o_orderstatus},
        |      {'column': 'o_orderpriority', 'val': o_orderpriority},
        |      {'column': 'order_month',
        |       'val': strftime(o_orderdate, '%Y-%m')}]) AS c
        |    FROM orders) u),
        |vc AS (SELECT "column", val, count(*) AS c
        |  FROM cells GROUP BY 1, 2),
        |tot AS (SELECT "column", sum(c) AS n FROM vc GROUP BY 1),
        |r AS (SELECT "column", val, c, row_number() OVER (
        |    PARTITION BY "column" ORDER BY c DESC, val DESC) AS rk
        |  FROM vc),
        |ent AS (SELECT vc."column",
        |    cast(first(tot.n) AS bigint) AS n,
        |    count(*) AS n_distinct,
        |    round(cast(sum(cast(round(
        |      -(vc.c / cast(tot.n AS double))
        |        * ln(vc.c / cast(tot.n AS double)), 9)
        |      AS decimal(28,9))) AS double), 6) AS entropy
        |  FROM vc JOIN tot USING ("column") GROUP BY 1)
        |SELECT ent."column", ent.n, ent.n_distinct,
        |  r.val AS top_value, cast(r.c AS bigint) AS top_n,
        |  ent.entropy
        |FROM ent JOIN r ON r."column" = ent."column" AND r.rk = 1
        |ORDER BY ent."column"""".stripMargin,
    // Path-mining twin: same (user, day) journeys, ordered list
    // aggregation capped at 8, same deterministic top-20 order.
    "session_paths" ->
      """WITH j AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS blk,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY ts, event_id), 1, 8), '>')
        |      AS path
        |  FROM events GROUP BY user_id, blk),
        |c AS (SELECT path, count(*) AS n FROM j GROUP BY 1),
        |r AS (SELECT path, n,
        |    row_number() OVER (ORDER BY n DESC, path ASC) AS rnk
        |  FROM c)
        |SELECT cast(rnk AS bigint) AS rnk, path, n
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // Growth twin: first-seen identity for cumulative distinct.
    "user_growth" ->
      """WITH e AS (SELECT user_id, cast(ts AS date) AS day
        |  FROM events),
        |f AS (SELECT day, count(*) AS n_new FROM (
        |    SELECT user_id, min(day) AS day FROM e GROUP BY 1)
        |  GROUP BY 1),
        |a AS (SELECT day, count(*) AS n_active FROM (
        |    SELECT DISTINCT user_id, day FROM e) GROUP BY 1)
        |SELECT a.day, a.n_active,
        |  cast(coalesce(f.n_new, 0) AS bigint) AS n_new,
        |  cast(sum(coalesce(f.n_new, 0)) OVER (ORDER BY a.day
        |    ROWS UNBOUNDED PRECEDING) AS bigint) AS cum_users
        |FROM a LEFT JOIN f USING (day) ORDER BY a.day""".stripMargin,
    // Canonical-selection twin on the shared components fixed point:
    // longest member wins, ties to the smallest doc_id.
    "canonical_docs" -> (NearDupComponentsCte +
      """,
        |w AS (SELECT c.comp, d.doc_id, d.n_chars, row_number() OVER (
        |    PARTITION BY c.comp
        |    ORDER BY d.n_chars DESC, d.doc_id ASC) AS rk
        |  FROM c JOIN documents d ON d.doc_id = c.id),
        |g AS (SELECT comp, count(*) AS n_members,
        |    sum(n_chars) AS total_chars FROM w GROUP BY 1)
        |SELECT g.comp, g.n_members, w.doc_id AS kept_id,
        |  w.n_chars AS kept_chars,
        |  cast(g.total_chars - w.n_chars AS bigint) AS dropped_chars
        |FROM g JOIN w ON w.comp = g.comp AND w.rk = 1
        |ORDER BY g.comp""".stripMargin),
    // Triangle twin: same degree-ordered orientation; pairs/o
    // MATERIALIZED (the pagerank CTE-inlining lesson).
    "triangle_count" ->
      """WITH lines AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS MATERIALIZED (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lines x JOIN lines y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey),
        |deg AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
        |    SELECT a AS v FROM pairs
        |    UNION ALL SELECT b FROM pairs) GROUP BY 1),
        |o AS MATERIALIZED (SELECT
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
        |      THEN a ELSE b END AS src,
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
        |      THEN b ELSE a END AS dst,
        |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND a < b)
        |      THEN db.deg ELSE da.deg END AS ddeg
        |  FROM pairs JOIN deg da ON da.v = a JOIN deg db ON db.v = b),
        |w AS (SELECT o1.src, o1.dst AS b, o2.dst AS c
        |  FROM o o1 JOIN o o2 ON o1.src = o2.src
        |  WHERE o1.ddeg < o2.ddeg
        |    OR (o1.ddeg = o2.ddeg AND o1.dst < o2.dst)),
        |t AS MATERIALIZED (SELECT w.src AS pa, w.b AS pb, w.c AS pc
        |  FROM w WHERE EXISTS (
        |    SELECT 1 FROM o WHERE o.src = w.b AND o.dst = w.c)),
        |tot AS (SELECT count(*) AS total FROM t),
        |pp AS (SELECT part_id, count(*) AS n_tri FROM (
        |    SELECT pa AS part_id FROM t
        |    UNION ALL SELECT pb FROM t
        |    UNION ALL SELECT pc FROM t) GROUP BY 1),
        |r AS (SELECT part_id, n_tri, row_number() OVER (
        |    ORDER BY n_tri DESC, part_id ASC) AS rnk FROM pp)
        |SELECT cast(rnk AS bigint) AS rnk, part_id, n_tri,
        |  cast(tot.total AS bigint) AS total_tri
        |FROM r CROSS JOIN tot WHERE rnk <= 10 ORDER BY rnk""".stripMargin,
    // ABC twin: identical integer micro revenue, SINGLE-window
    // cumulative sum (verifying the Spark side's two-level bands),
    // hugeint cross-multiplied class thresholds.
    "abc_analysis" ->
      """WITH rev AS (SELECT l_partkey,
        |    cast(sum(cast(l_extendedprice * (1 - l_discount)
        |      AS decimal(28,6)) * 1000000) AS bigint) AS rev
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT cast(sum(rev) AS hugeint) AS total FROM rev),
        |c AS (SELECT l_partkey, rev,
        |    cast(sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
        |      ROWS UNBOUNDED PRECEDING) AS hugeint) AS cum
        |  FROM rev),
        |k AS (SELECT l_partkey, rev,
        |    CASE WHEN cum * 5 <= tot.total * 4 THEN 'A'
        |         WHEN cum * 20 <= tot.total * 19 THEN 'B'
        |         ELSE 'C' END AS abc_class
        |  FROM c CROSS JOIN tot)
        |SELECT abc_class, count(*) AS n_parts,
        |  round(cast(sum(rev) AS double) / 1e6, 6) AS revenue,
        |  round(cast(sum(rev) AS double)
        |    / cast(first(tot.total) AS double), 6) AS share
        |FROM k CROSS JOIN tot GROUP BY 1 ORDER BY 1""".stripMargin,
    // SLA twin: integer day lags, exact interpolated percentiles.
    "ship_lag" ->
      """WITH j AS (SELECT o.o_orderpriority,
        |    date_diff('day', cast(o.o_orderdate AS date),
        |      cast(l.l_shipdate AS date)) AS lag_days
        |  FROM lineitem l JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey)
        |SELECT o_orderpriority, count(*) AS n,
        |  cast(min(lag_days) AS bigint) AS min_days,
        |  cast(max(lag_days) AS bigint) AS max_days,
        |  round(quantile_cont(lag_days, 0.5), 6) AS p50_days,
        |  round(quantile_cont(lag_days, 0.9), 6) AS p90_days,
        |  round(cast(sum(lag_days) AS double) / count(*), 6)
        |    AS avg_days
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // PMI twin: same bigram counts, exact long ratio operands, one
    // ln on the deterministic double ratio.
    "pmi_collocations" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |bb AS (SELECT doc_id,
        |    unnest([{'w1': toks[i+1], 'w2': toks[i+2]}
        |      for i in range(len(toks) - 1)]) AS b
        |  FROM t),
        |bi AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bb),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
        |n AS (SELECT cast(sum(c2) AS bigint) AS n FROM c2),
        |x1 AS (SELECT w1, cast(sum(c2) AS bigint) AS c1
        |  FROM c2 GROUP BY 1),
        |x2 AS (SELECT w2, cast(sum(c2) AS bigint) AS cr
        |  FROM c2 GROUP BY 1),
        |sc AS (SELECT c2.w1, c2.w2, c2.c2,
        |    round(ln(cast(c2.c2 * n.n AS double)
        |      / cast(x1.c1 * x2.cr AS double)), 6) AS pmi
        |  FROM c2 JOIN x1 USING (w1) JOIN x2 USING (w2)
        |    CROSS JOIN n
        |  WHERE c2.c2 >= 10),
        |r AS (SELECT *, row_number() OVER (ORDER BY pmi DESC,
        |    w1 ASC, w2 ASC) AS rnk FROM sc)
        |SELECT cast(rnk AS bigint) AS rnk, w1, w2, c2, pmi
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // Growth-accounting twin: same distinct collapse + lag/lead
    // classification, churn right-censored at the corpus edge.
    "growth_accounting" ->
      """WITH ad AS (SELECT DISTINCT user_id, cast(ts AS date) AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS max_day FROM ad),
        |f AS (SELECT user_id, day,
        |    lag(day) OVER w AS prev_day,
        |    lead(day) OVER w AS next_day
        |  FROM ad WINDOW w AS (PARTITION BY user_id ORDER BY day)),
        |pd AS (SELECT day, count(*) AS n_active,
        |    cast(sum(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END)
        |      AS bigint) AS n_new,
        |    cast(sum(CASE WHEN day - prev_day = 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS n_retained,
        |    cast(sum(CASE WHEN day - prev_day > 1 THEN 1 ELSE 0 END)
        |      AS bigint) AS n_resurrected
        |  FROM f GROUP BY 1),
        |ch AS (SELECT day + 1 AS day, count(*) AS n_churned
        |  FROM f CROSS JOIN mx
        |  WHERE (next_day IS NULL OR next_day - day > 1)
        |    AND day < mx.max_day
        |  GROUP BY 1)
        |SELECT coalesce(pd.day, ch.day) AS day,
        |  cast(coalesce(pd.n_active, 0) AS bigint) AS n_active,
        |  cast(coalesce(pd.n_new, 0) AS bigint) AS n_new,
        |  cast(coalesce(pd.n_retained, 0) AS bigint) AS n_retained,
        |  cast(coalesce(pd.n_resurrected, 0) AS bigint) AS n_resurrected,
        |  cast(coalesce(ch.n_churned, 0) AS bigint) AS n_churned
        |FROM pd FULL JOIN ch ON pd.day = ch.day ORDER BY 1""".stripMargin,
    // Chi-square twin: exact integer marginals, 9 dp-quantized
    // (n-e)^2/e terms, exact decimal sum.
    "chi_square" ->
      """WITH cu AS (SELECT DISTINCT c_custkey, c_mktsegment
        |  FROM customer),
        |cells AS (SELECT cu.c_mktsegment AS seg,
        |    o.o_orderpriority AS prio, count(*) AS n
        |  FROM orders o JOIN cu ON o.o_custkey = cu.c_custkey
        |  GROUP BY 1, 2),
        |r AS (SELECT seg, cast(sum(n) AS bigint) AS r
        |  FROM cells GROUP BY 1),
        |c AS (SELECT prio, cast(sum(n) AS bigint) AS c
        |  FROM cells GROUP BY 1),
        |nn AS (SELECT cast(sum(n) AS bigint) AS n FROM cells),
        |t AS (SELECT cells.seg, cells.prio, cells.n, nn.n AS tot,
        |    cast(r.r * c.c AS double) / cast(nn.n AS double) AS e
        |  FROM cells JOIN r USING (seg) JOIN c USING (prio)
        |    CROSS JOIN nn)
        |SELECT cast(first(tot) AS bigint) AS n_obs,
        |  cast(count(DISTINCT seg) AS bigint) AS n_segments,
        |  cast(count(DISTINCT prio) AS bigint) AS n_priorities,
        |  cast((count(DISTINCT seg) - 1) * (count(DISTINCT prio) - 1)
        |    AS bigint) AS dof,
        |  round(cast(sum(cast(round(
        |    (cast(n AS double) - e) * (cast(n AS double) - e) / e, 9)
        |    AS decimal(28,9))) AS double), 6) AS chi2
        |FROM t""".stripMargin,
    // Frame-schedule twin: closed-form duration from the fabricated
    // container (the multimodal_video contract), integer midpoints.
    "frame_sample" ->
      """WITH v AS (SELECT doc_id,
        |    cast((strlen(text) * 7) * 1000
        |      // (1000 * (1 + strlen(text) % 3)) AS bigint)
        |      AS duration_ms
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT doc_id, duration_ms,
        |    unnest(range(5)) AS frame_idx
        |  FROM v)
        |SELECT doc_id, cast(frame_idx AS bigint) AS frame_idx,
        |  cast((2 * frame_idx + 1) * duration_ms // 10 AS bigint)
        |    AS sample_ms,
        |  duration_ms
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // Gap-distribution twin: exact integer micros, hugeint sums.
    "purchase_gaps" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_us
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT us - prev_us AS gap_us FROM p
        |  WHERE prev_us IS NOT NULL)
        |SELECT gap_us // 14400000000 AS bucket,
        |  cast(gap_us // 14400000000 * 4 AS bigint) AS from_hours,
        |  count(*) AS n,
        |  round((cast(sum(cast(gap_us AS hugeint)) AS double)
        |    / count(*)) / 3600000000.0, 6) AS avg_gap_hours
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // Band-migration twin: the scd2_dim change chain + integer
    // micro-price banding, version-ordered lag.
    "band_migration" ->
      """WITH p AS (SELECT user_id, ts, event_id, value,
        |    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id, value FROM p
        |  WHERE prev_value IS NULL OR value <> prev_value),
        |v AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS version
        |  FROM c),
        |b AS (SELECT user_id, version,
        |    cast(cast(value AS decimal(18,6)) * 1000000 AS bigint)
        |      // 100000000 AS band
        |  FROM v),
        |m AS (SELECT band, lag(band) OVER (PARTITION BY user_id
        |    ORDER BY version) AS from_band
        |  FROM b)
        |SELECT from_band, band AS to_band, count(*) AS n
        |FROM m WHERE from_band IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Threshold-curve twin: same sample, same 6 dp-rounded cosine
    // membership, threshold spine keeps zero rows.
    "dedup_curve" ->
      """WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
        |  FROM embeddings WHERE vec_id < 2000),
        |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
        |    round(list_cosine_similarity(a.v, b.v), 6) AS c
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |th AS (SELECT unnest([0.30, 0.35, 0.40, 0.45, 0.50]) AS threshold),
        |q AS (SELECT th.threshold, p.ia, p.ib
        |  FROM p CROSS JOIN th WHERE th.threshold <= p.c),
        |np AS (SELECT threshold, count(*) AS n_pairs
        |  FROM q GROUP BY 1),
        |nd AS (SELECT threshold, count(*) AS n_docs FROM (
        |    SELECT DISTINCT threshold, vec FROM (
        |      SELECT threshold, ia AS vec FROM q
        |      UNION ALL SELECT threshold, ib FROM q))
        |  GROUP BY 1)
        |SELECT th.threshold,
        |  cast(coalesce(np.n_pairs, 0) AS bigint) AS n_pairs,
        |  cast(coalesce(nd.n_docs, 0) AS bigint) AS n_docs
        |FROM th LEFT JOIN np USING (threshold)
        |  LEFT JOIN nd USING (threshold)
        |ORDER BY th.threshold""".stripMargin,
    // RFM twin: single row_number windows + the identical integer
    // NTILE identity q = (rn-1)*5 // n + 1 — rank-decomposition
    // equivalence is the thing under test.
    "rfm_segments" ->
      """WITH u AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
        |    count(*) AS freq, sum(cast(value AS decimal(18,6))) AS mon
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |r AS (SELECT user_id, mon,
        |    row_number() OVER (ORDER BY last_us DESC, user_id ASC) AS rr,
        |    row_number() OVER (ORDER BY freq DESC, user_id ASC) AS fr,
        |    row_number() OVER (ORDER BY mon DESC, user_id ASC) AS mr,
        |    count(*) OVER () AS n
        |  FROM u),
        |s AS (SELECT user_id, mon,
        |    6 - ((rr - 1) * 5 // n + 1) AS r_score,
        |    6 - ((fr - 1) * 5 // n + 1) AS f_score,
        |    6 - ((mr - 1) * 5 // n + 1) AS m_score
        |  FROM r)
        |SELECT cast(r_score AS bigint) AS r_score,
        |  cast(f_score AS bigint) AS f_score,
        |  cast(m_score AS bigint) AS m_score, count(*) AS n_users,
        |  round(cast(sum(mon) AS double), 6) AS total_revenue
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // ACF twin: whole-unit day revenue, centered as n*x - S in
    // hugeint, rank self-join pairs — one terminal division per lag.
    "autocorr" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    sum(cast(value AS decimal(18,6))) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |x AS (SELECT day,
        |    cast(rev * 1000000 AS hugeint) // 1000000 AS xw FROM d),
        |c AS (SELECT day,
        |    cast(count(*) OVER () AS hugeint) * xw
        |      - sum(xw) OVER () AS cv FROM x),
        |r AS (SELECT cv, row_number() OVER (ORDER BY day) AS t FROM c),
        |den AS (SELECT sum(cv * cv) AS dn FROM r),
        |p AS (SELECT l.lg, count(*) AS n_pairs, sum(a.cv * b.cv) AS num
        |  FROM (SELECT unnest(range(1, 8)) AS lg) l
        |  JOIN r a ON true JOIN r b ON b.t = a.t + l.lg
        |  GROUP BY 1)
        |SELECT cast(lg AS bigint) AS lag, n_pairs,
        |  round(cast(num AS double)
        |    / cast((SELECT dn FROM den) AS double), 6) AS acf
        |FROM p ORDER BY 1""".stripMargin,
    // BFS twin: recursive CTE bounded at 3 hops, min-hop per node.
    "khop_reach" ->
      """WITH RECURSIVE lines AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lines x JOIN lines y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey <> y.l_partkey),
        |r AS (
        |  SELECT p_partkey AS node, 0 AS hop FROM part
        |  WHERE p_partkey % 97 = 0
        |  UNION
        |  SELECT e.b AS node, r.hop + 1 AS hop FROM r
        |  JOIN e ON e.a = r.node WHERE r.hop < 3),
        |m AS (SELECT node, min(hop) AS hop FROM r GROUP BY 1),
        |per AS (SELECT cast(hop AS bigint) AS hop, count(*) AS n_parts,
        |    cast(sum(node) AS bigint) AS sum_key FROM m GROUP BY 1),
        |un AS (SELECT cast(-1 AS bigint) AS hop, count(*) AS n_parts,
        |    cast(coalesce(sum(p_partkey), 0) AS bigint) AS sum_key
        |  FROM part WHERE p_partkey NOT IN (SELECT node FROM m))
        |SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM un)
        |ORDER BY hop""".stripMargin,
    // Winsorize twin: 6 dp-rounded quantile_cont cuts, identical
    // clamp comparisons, exact decimal means.
    "winsorize" ->
      """WITH cuts AS (SELECT event_type,
        |    round(quantile_cont(value, 0.05), 6) AS lo,
        |    round(quantile_cont(value, 0.95), 6) AS hi
        |  FROM events GROUP BY 1),
        |j AS (SELECT e.event_type, e.value, c.lo, c.hi,
        |    CASE WHEN e.value < c.lo THEN c.lo
        |         WHEN e.value > c.hi THEN c.hi
        |         ELSE e.value END AS clamped
        |  FROM events e JOIN cuts c USING (event_type))
        |SELECT event_type, count(*) AS n, min(lo) AS lo, min(hi) AS hi,
        |  cast(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS bigint)
        |    AS n_lo,
        |  cast(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS bigint)
        |    AS n_hi,
        |  round(cast(sum(cast(value AS decimal(18,6))) AS double)
        |    / count(value), 6) AS mean_raw,
        |  round(cast(sum(cast(clamped AS decimal(18,6))) AS double)
        |    / count(clamped), 6) AS mean_winsor
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // Zipf twin: single-window per-lang rank, identical 6dp-ln
    // micro-unit quantization, hugeint OLS numerators.
    "zipf_fit" ->
      """WITH t AS (SELECT lang, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
        |tot AS (SELECT lang, count(*) AS n_types,
        |    cast(sum(cnt) AS bigint) AS n_tokens FROM c GROUP BY 1),
        |r AS (SELECT lang, cnt, row_number() OVER (PARTITION BY lang
        |    ORDER BY cnt DESC, tok ASC) AS rnk FROM c),
        |q AS (SELECT lang,
        |    cast(cast(round(ln(cast(rnk AS double)), 6)
        |      AS decimal(18,6)) * 1000000 AS bigint) AS x,
        |    cast(cast(round(ln(cast(cnt AS double)), 6)
        |      AS decimal(18,6)) * 1000000 AS bigint) AS y
        |  FROM r WHERE rnk <= 100),
        |s AS (SELECT lang, count(*) AS n,
        |    cast(sum(x) AS hugeint) AS sx, cast(sum(y) AS hugeint) AS sy,
        |    cast(sum(x*y) AS hugeint) AS sxy,
        |    cast(sum(x*x) AS hugeint) AS sx2,
        |    cast(sum(y*y) AS hugeint) AS sy2
        |  FROM q GROUP BY 1)
        |SELECT s.lang, tot.n_types, tot.n_tokens, s.n AS n_fit,
        |  round(cast(n*sxy - sx*sy AS double)
        |    / cast(n*sx2 - sx*sx AS double), 6) AS slope,
        |  round(cast(sy*sx2 - sx*sxy AS double)
        |    / cast(n*sx2 - sx*sx AS double) / 1e6, 6) AS intercept,
        |  round((cast(n*sxy - sx*sy AS double)
        |      / cast(n*sx2 - sx*sx AS double))
        |    * (cast(n*sxy - sx*sy AS double)
        |      / cast(n*sy2 - sy*sy AS double)), 6) AS r2
        |FROM s JOIN tot USING (lang) ORDER BY lang""".stripMargin,
    // Lexical-diversity twin: same tokenization, integer TTR/Yule-K.
    "lexical_diversity" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '')) AS tok
        |  FROM documents),
        |pt AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, cast(sum(tf) AS bigint) AS n_tok,
        |    count(*) AS n_types,
        |    cast(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS bigint)
        |      AS hapax,
        |    cast(sum(tf*tf) AS bigint) AS tf2
        |  FROM pt GROUP BY 1)
        |SELECT doc_id, n_tok, n_types, hapax,
        |  n_types * 1000000 // n_tok AS ttr_ppm,
        |  round(cast(10000 * (tf2 - n_tok) AS double)
        |    / cast(n_tok * n_tok AS double), 6) AS yule_k
        |FROM d ORDER BY doc_id""".stripMargin,
    // Entry/exit twin: the sessionize session-id chain + arg_min/max
    // on the (us, event_id) order key.
    "session_entry_exit" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g),
        |sess AS (SELECT user_id, sess_id,
        |    min(struct_pack(us := epoch_us(ts), eid := event_id,
        |      et := event_type)).et AS entry_type,
        |    max(struct_pack(us := epoch_us(ts), eid := event_id,
        |      et := event_type)).et AS exit_type,
        |    count(*) AS n_events
        |  FROM s GROUP BY 1, 2)
        |SELECT entry_type, exit_type, count(*) AS n_sessions,
        |  cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_bounces,
        |  cast(sum(n_events) AS bigint) AS total_events
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // CUSUM twin: the identical n-scaled integer recurrence unrolled
    // by a recursive CTE over per-user day ranks.
    "cusum_alerts" ->
      """WITH RECURSIVE pd AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |u AS (SELECT user_id, count(*) AS n,
        |    cast(sum(cnt) AS bigint) AS t FROM pd GROUP BY 1),
        |r AS (SELECT user_id, row_number() OVER (PARTITION BY user_id
        |    ORDER BY day) AS i, day, cnt FROM pd),
        |c AS (
        |  SELECT r.user_id, r.i, r.day,
        |    greatest(0, u.n * r.cnt - u.t - u.t // 4) AS s
        |  FROM r JOIN u USING (user_id) WHERE r.i = 1
        |  UNION ALL
        |  SELECT r.user_id, r.i, r.day,
        |    greatest(0, c.s + u.n * r.cnt - u.t - u.t // 4) AS s
        |  FROM c JOIN r ON r.user_id = c.user_id AND r.i = c.i + 1
        |  JOIN u ON u.user_id = c.user_id)
        |SELECT u.user_id, cast(u.n AS bigint) AS n_days, u.t AS total,
        |  cast(max(c.s) AS bigint) AS max_cusum,
        |  cast(sum(CASE WHEN c.s > u.t THEN 1 ELSE 0 END) AS bigint)
        |    AS n_alerts,
        |  min(CASE WHEN c.s > u.t THEN c.day END) AS first_alert_day
        |FROM c JOIN u USING (user_id) GROUP BY 1, 2, 3
        |ORDER BY 1""".stripMargin,
    // Systematic-PPS twin: single-window exclusive prefix sum in the
    // same md5 order, identical non-negative integer hit arithmetic.
    "systematic_sample" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |    cast(('0x'||substr(md5(77 || ':' || doc_id), 25, 8))::UBIGINT
        |      AS bigint) AS skey
        |  FROM documents),
        |c AS (SELECT doc_id, n_chars,
        |    cast(coalesce(sum(n_chars) OVER (ORDER BY skey, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS bigint) AS cum,
        |    cast(sum(n_chars) OVER () AS bigint) AS wtot
        |  FROM d)
        |SELECT doc_id, n_chars, cum,
        |  cast(((100 * (cum + n_chars) + wtot - 1) // wtot + 1) // 2
        |    - ((100 * cum + wtot - 1) // wtot + 1) // 2 AS bigint)
        |    AS n_hits
        |FROM c
        |WHERE ((100 * (cum + n_chars) + wtot - 1) // wtot + 1) // 2
        |    - ((100 * cum + wtot - 1) // wtot + 1) // 2 > 0
        |ORDER BY doc_id""".stripMargin,
    // Ordinal twin: per-cohort single-window row_number, new cohort
    // offset by the base count.
    "assign_ids" ->
      """WITH d AS (SELECT doc_id, doc_id % 3 = 0 AS is_new,
        |    cast(('0x'||substr(md5(101 || ':' || doc_id), 25, 8))::UBIGINT
        |      AS bigint) AS skey
        |  FROM documents),
        |r AS (SELECT doc_id, is_new,
        |    row_number() OVER (PARTITION BY is_new
        |      ORDER BY skey, doc_id) AS rnk
        |  FROM d),
        |b AS (SELECT count(*) AS n_base FROM d WHERE NOT is_new)
        |SELECT doc_id, cast(CASE WHEN is_new THEN 1 ELSE 0 END AS bigint)
        |    AS is_new,
        |  cast(CASE WHEN is_new THEN (SELECT n_base FROM b) ELSE 0 END
        |    + rnk AS bigint) AS ordinal
        |FROM r ORDER BY doc_id""".stripMargin,
    // JL-sketch twin: same md5-parity sign matrix, same 6dp
    // micro-unit quantization, exact integer coordinate sums.
    "random_projection" ->
      """WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
        |  FROM embeddings),
        |x AS (SELECT vec_id, dd.d AS d,
        |    cast(cast(v[dd.d + 1] AS decimal(18,6)) * 1000000 AS bigint)
        |      AS q
        |  FROM e, (SELECT unnest(range(128)) AS d) dd
        |  WHERE dd.d < len(v)),
        |s AS (SELECT dd.d, jj.j,
        |    CASE WHEN ('0x'||substr(md5(dd.d || '_' || jj.j), 25, 8))
        |      ::UBIGINT % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT unnest(range(128)) AS d) dd,
        |       (SELECT unnest(range(8)) AS j) jj)
        |SELECT x.vec_id, s.j AS proj_dim,
        |  cast(sum(x.q * s.sgn) AS bigint) AS coord
        |FROM x JOIN s USING (d) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // #179's bounded-output measurement twin: the random_projection
    // coordinate CTE collapsed to an 8-row per-proj-dim moment card.
    "rp_moments" ->
      """WITH e AS (SELECT vec_id, cast(embedding AS double[]) AS v
        |  FROM embeddings),
        |x AS (SELECT vec_id, dd.d AS d,
        |    cast(cast(v[dd.d + 1] AS decimal(18,6)) * 1000000 AS bigint)
        |      AS q
        |  FROM e, (SELECT unnest(range(128)) AS d) dd
        |  WHERE dd.d < len(v)),
        |s AS (SELECT dd.d, jj.j,
        |    CASE WHEN ('0x'||substr(md5(dd.d || '_' || jj.j), 25, 8))
        |      ::UBIGINT % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT unnest(range(128)) AS d) dd,
        |       (SELECT unnest(range(8)) AS j) jj),
        |c AS (SELECT x.vec_id, s.j AS proj_dim,
        |    cast(sum(x.q * s.sgn) AS bigint) AS coord
        |  FROM x JOIN s USING (d) GROUP BY 1, 2)
        |SELECT proj_dim, count(*) AS n_vecs,
        |  cast(sum(coord) AS bigint) AS su,
        |  min(coord) AS min_c, max(coord) AS max_c,
        |  cast(sum(CASE WHEN coord > 0 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_pos
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Outlier-screen twin: the centroid_assign centroid CTE, cosine
    // to the OWN label's centroid, 6dp-rounded membership.
    "embed_outliers" ->
      """WITH s AS (SELECT label, embedding,
        |    unnest(range(len(embedding))) AS pos
        |  FROM embeddings),
        |d AS (SELECT label, pos,
        |    cast(sum(cast(cast(embedding[pos + 1] AS double)
        |      AS decimal(28,6))) AS double) / cast(count(*) AS double) AS m
        |  FROM s GROUP BY 1, 2),
        |c AS (SELECT label AS c_label, list(m ORDER BY pos) AS cvec
        |  FROM d GROUP BY 1),
        |e AS (SELECT vec_id, label, cast(embedding AS double[]) AS v
        |  FROM embeddings),
        |j AS (SELECT e.label,
        |    round(list_cosine_similarity(e.v, c.cvec), 6) AS cs6
        |  FROM e JOIN c ON e.label = c.c_label)
        |SELECT label, count(*) AS n_vecs,
        |  cast(sum(CASE WHEN cs6 < 0.0 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_outliers,
        |  min(cs6) AS min_cos,
        |  round(cast(sum(cast(cs6 AS decimal(28,6))) AS double)
        |    / cast(count(*) AS double), 6) AS avg_cos
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // LSH-eval twin: the dedup_minhash candidate CTE + the df-capped
    // exact-pair index, integer threshold + ppm arithmetic.
    "lsh_eval" ->
      s"""WITH t AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\\s+'),
        |    x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |shl AS (SELECT doc_id,
        |    unnest([array_to_string(list_slice(toks, i + 1, i + 2), ' ')
        |      for i in range(len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |dd AS (SELECT DISTINCT doc_id,
        |    cast(('0x' || substr(md5(sh), 25, 8))::UBIGINT AS bigint) AS h
        |  FROM shl),
        |sz AS (SELECT doc_id, count(*) AS n FROM dd GROUP BY 1),
        |keep AS (SELECT h FROM (
        |    SELECT h, count(*) AS df FROM dd GROUP BY 1)
        |  WHERE df <= ${Dedup.EvalDfCap}),
        |capped AS (SELECT dd.* FROM dd JOIN keep USING (h)),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM capped x JOIN capped y USING (h)
        |  WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
        |pos AS (SELECT a, b FROM inter
        |  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
        |  WHERE i * ${Dedup.EvalJacNum} >= sa.n + sb.n - i),
        |mh AS (SELECT doc_id, i,
        |    min((h * ([${Dedup.PortableA.mkString(",")}])[i + 1]
        |         + ([${Dedup.PortableB.mkString(",")}])[i + 1])
        |        % ${Dedup.PortableP}) AS mh
        |  FROM dd CROSS JOIN range(${Dedup.PortableK}) r(i)
        |  GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(mh ORDER BY i) AS sig
        |  FROM mh GROUP BY 1),
        |banded AS (SELECT doc_id, band,
        |    sig[2 * band + 1] || ',' || sig[2 * band + 2] AS key
        |  FROM sig CROSS JOIN range(${Dedup.PortableBands}) r(band)),
        |ok AS (SELECT * FROM (
        |    SELECT *, count(*) OVER (PARTITION BY band, key) AS cnt
        |    FROM banded) WHERE cnt BETWEEN 2 AND ${Dedup.BucketCap}),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM ok x JOIN ok y
        |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
        |m AS (SELECT
        |  (SELECT count(*) FROM t) AS n_docs,
        |  (SELECT count(*) FROM pos) AS n_pos,
        |  (SELECT count(*) FROM cand) AS n_cand,
        |  (SELECT count(*) FROM cand JOIN pos USING (a, b)) AS tp)
        |SELECT n_docs, n_pos, n_cand, tp,
        |  n_cand - tp AS fp, n_pos - tp AS fn,
        |  CASE WHEN n_cand > 0 THEN tp * 1000000 // n_cand END
        |    AS precision_ppm,
        |  CASE WHEN n_pos > 0 THEN tp * 1000000 // n_pos END
        |    AS recall_ppm
        |FROM m""".stripMargin,
    // Stickiness twin: same fan-to-window-days distinct collapse.
    "stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |c AS (SELECT DISTINCT user_id, day + o.o AS day
        |  FROM ud CROSS JOIN (SELECT unnest(range(7)) AS o) o),
        |wau AS (SELECT day, count(*) AS wau FROM c GROUP BY 1)
        |SELECT day, dau, wau,
        |  dau * 1000000 // wau AS stickiness_ppm
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    // Item-CF twin: same distinct collapse; sqrt of an exact integer
    // product is IEEE-exact on both engines.
    "item_cf" ->
      """WITH lines AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pc AS (SELECT l_partkey, count(*) AS c FROM lines GROUP BY 1),
        |pairs AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb,
        |    count(*) AS support
        |  FROM lines x JOIN lines y ON x.l_orderkey = y.l_orderkey
        |    AND x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2)
        |SELECT pa, pb, support, ca.c AS ca, cb.c AS cb,
        |  round(cast(support AS double)
        |    / sqrt(cast(ca.c * cb.c AS double)), 6) AS cosine_sim
        |FROM pairs JOIN pc ca ON ca.l_partkey = pa
        |  JOIN pc cb ON cb.l_partkey = pb
        |ORDER BY cosine_sim DESC, pa, pb LIMIT 20""".stripMargin,
    // Containment twin: the ngram_jaccard blocking widened to ±5
    // blocks, no length prefilter, 6dp int/int ratios.
    "containment" ->
      """WITH d AS (
        |  SELECT doc_id, lang, source, n_chars, n_chars // 20 AS blk,
        |    list_distinct(list_transform(
        |      range(greatest(length(lower(text)) - 2, 0)),
        |      i -> substr(lower(text), cast(i + 1 AS int), 3))) AS grams
        |  FROM documents),
        |p AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |    cast(len(x.grams) AS bigint) AS na,
        |    cast(len(y.grams) AS bigint) AS nb,
        |    cast(len(list_intersect(x.grams, y.grams)) AS bigint)
        |      AS inter
        |  FROM d x JOIN d y ON x.lang = y.lang AND x.source = y.source
        |    AND abs(x.blk - y.blk) <= 5 AND x.doc_id < y.doc_id
        |  WHERE len(x.grams) > 0 AND len(y.grams) > 0)
        |SELECT a, b, na, nb, inter,
        |  round(cast(inter AS double) / cast(na AS double), 6) AS cont_a,
        |  round(cast(inter AS double) / cast(nb AS double), 6) AS cont_b
        |FROM p
        |WHERE greatest(round(cast(inter AS double) / cast(na AS double), 6),
        |    round(cast(inter AS double) / cast(nb AS double), 6)) >= 0.8
        |ORDER BY greatest(cont_a, cont_b) DESC, a, b
        |LIMIT 200""".stripMargin,
    // Content-keyed containment twin (round 16): identical shingle
    // index as lsh_eval (distinct word-bigram md5 tail-32), identical
    // df-band anchor rule, exact full-index intersection recount.
    "containment_content" ->
      s"""WITH t AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\\s+'),
        |    x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |shl AS (SELECT doc_id,
        |    unnest([array_to_string(list_slice(toks, i + 1, i + 2), ' ')
        |      for i in range(len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |dd AS (SELECT DISTINCT doc_id,
        |    cast(('0x' || substr(md5(sh), 25, 8))::UBIGINT AS bigint) AS h
        |  FROM shl),
        |sz AS (SELECT doc_id, count(*) AS n FROM dd GROUP BY 1),
        |anchors AS (SELECT h FROM (
        |    SELECT h, count(*) AS df FROM dd GROUP BY 1)
        |  WHERE df >= 2 AND df <= ${Dedup.ContainAnchorDfCap}),
        |anchored AS (SELECT dd.* FROM dd JOIN anchors USING (h)),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM anchored x JOIN anchored y USING (h)
        |  WHERE x.doc_id < y.doc_id),
        |inter AS (SELECT c.a, c.b, count(*) AS inter
        |  FROM cand c
        |  JOIN dd da ON da.doc_id = c.a
        |  JOIN dd db ON db.doc_id = c.b AND db.h = da.h
        |  GROUP BY 1, 2),
        |scored AS (SELECT a, b, sa.n AS na, sb.n AS nb, inter,
        |    round(cast(inter AS double) / cast(sa.n AS double), 6)
        |      AS cont_a,
        |    round(cast(inter AS double) / cast(sb.n AS double), 6)
        |      AS cont_b
        |  FROM inter
        |  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b)
        |SELECT a, b, na, nb, inter, cont_a, cont_b
        |FROM scored
        |WHERE greatest(cont_a, cont_b) >= ${Dedup.ContainMin}
        |ORDER BY greatest(cont_a, cont_b) DESC, a, b
        |LIMIT 200""".stripMargin,
    // Benford twin: leading digit from the unscaled-integer STRING,
    // pinned expected-ppm literals, 9dp-quantized chi-square terms.
    "benford_screen" ->
      s"""WITH d AS (SELECT l_returnflag AS grp,
        |    cast(cast(l_extendedprice AS decimal(18,6)) * 1000000
        |      AS bigint) AS xu
        |  FROM lineitem),
        |c AS (SELECT grp,
        |    cast(substr(cast(xu AS varchar), 1, 1) AS bigint) AS digit,
        |    count(*) AS n
        |  FROM d WHERE xu > 0 GROUP BY 1, 2),
        |e AS (SELECT *, CASE digit ${Olap.BenfordPpm.zipWithIndex
          .map { case (p, i) => s"WHEN ${i + 1} THEN $p" }
          .mkString(" ")} END AS exp_ppm,
        |    cast(sum(n) OVER (PARTITION BY grp) AS bigint) AS n_total
        |  FROM c),
        |t AS (SELECT *,
        |    cast(round(
        |      cast((cast(n AS hugeint) * 1000000
        |            - cast(n_total AS hugeint) * exp_ppm)
        |         * (cast(n AS hugeint) * 1000000
        |            - cast(n_total AS hugeint) * exp_ppm) AS double)
        |      / cast(cast(n_total AS hugeint) * exp_ppm * 1000000
        |        AS double), 9) AS decimal(28,9)) AS term9
        |  FROM e)
        |SELECT grp, digit, n, n * 1000000 // n_total AS obs_ppm,
        |  cast(exp_ppm AS bigint) AS exp_ppm,
        |  round(cast(sum(term9) OVER (PARTITION BY grp) AS double), 6)
        |    AS chi2
        |FROM t ORDER BY grp, digit""".stripMargin,
    // Target-encoding twin: enc = (N·Σy_c + m·Σy)/(N·(n_c+m)) in
    // hugeint, one terminal division.
    "target_encode" ->
      """WITH li AS (SELECT l_partkey,
        |    cast(cast(l_extendedprice AS decimal(18,6)) * 1000000
        |      AS bigint) AS y
        |  FROM lineitem),
        |p AS (SELECT DISTINCT p_partkey, p_brand FROM part),
        |pb AS (SELECT p_brand, count(*) AS n,
        |    sum(cast(y AS hugeint)) AS sy
        |  FROM li JOIN p ON l_partkey = p_partkey GROUP BY 1),
        |t AS (SELECT cast(sum(n) AS hugeint) AS nn, sum(sy) AS syt
        |  FROM pb)
        |SELECT p_brand, n,
        |  round(cast(sy AS double) / n / 1e6, 6) AS mean_raw,
        |  round(cast(nn * sy + 20 * syt AS double)
        |    / cast(nn * (n + 20) * 1000000 AS double), 6) AS encoding
        |FROM pb, t ORDER BY p_brand""".stripMargin,
    // Novelty twin: same md5 shingle identity, df > 10 boilerplate.
    "novelty_score" ->
      """WITH t AS (SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |shl AS (SELECT doc_id,
        |    unnest([array_to_string(list_slice(toks, i + 1, i + 2), ' ')
        |      for i in range(len(toks) - 1)]) AS sh
        |  FROM t WHERE len(toks) >= 2),
        |dd AS (SELECT DISTINCT doc_id,
        |    cast(('0x' || substr(md5(sh), 25, 8))::UBIGINT AS bigint) AS h
        |  FROM shl),
        |df AS (SELECT h, count(*) AS df FROM dd GROUP BY 1)
        |SELECT doc_id, count(*) AS n_shingles,
        |  cast(sum(CASE WHEN df > 10 THEN 1 ELSE 0 END) AS bigint)
        |    AS n_common,
        |  (cast(sum(CASE WHEN df > 10 THEN 1 ELSE 0 END) AS bigint)
        |    * 1000000) // count(*) AS boilerplate_ppm
        |FROM dd JOIN df USING (h) GROUP BY 1 ORDER BY 1""".stripMargin,
    // Wilson twin: identical expression-tree order so the IEEE
    // doubles match bit-for-bit before the 6dp round.
    "wilson_funnel" ->
      """WITH u AS (SELECT user_id,
        |    min(struct_pack(us := epoch_us(ts), eid := event_id,
        |      et := event_type)).et AS channel,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS converted
        |  FROM events GROUP BY 1),
        |c AS (SELECT channel, count(*) AS n_users,
        |    cast(sum(converted) AS bigint) AS n_conv
        |  FROM u GROUP BY 1)
        |SELECT channel, n_users, n_conv,
        |  n_conv * 1000000 // n_users AS rate_ppm,
        |  round(
        |    (cast(n_conv AS double) / cast(n_users AS double)
        |      + (1.96 * 1.96) / (2.0 * cast(n_users AS double))
        |      - 1.96 * sqrt(
        |        (cast(n_conv AS double) / cast(n_users AS double))
        |          * (1.0 - cast(n_conv AS double)
        |            / cast(n_users AS double))
        |          / cast(n_users AS double)
        |        + (1.96 * 1.96) / (4.0 * cast(n_users AS double)
        |          * cast(n_users AS double))))
        |    / (1.0 + (1.96 * 1.96) / cast(n_users AS double)), 6)
        |    AS wilson_lo,
        |  round(
        |    (cast(n_conv AS double) / cast(n_users AS double)
        |      + (1.96 * 1.96) / (2.0 * cast(n_users AS double))
        |      + 1.96 * sqrt(
        |        (cast(n_conv AS double) / cast(n_users AS double))
        |          * (1.0 - cast(n_conv AS double)
        |            / cast(n_users AS double))
        |          / cast(n_users AS double)
        |        + (1.96 * 1.96) / (4.0 * cast(n_users AS double)
        |          * cast(n_users AS double))))
        |    / (1.0 + (1.96 * 1.96) / cast(n_users AS double)), 6)
        |    AS wilson_hi
        |FROM c ORDER BY channel""".stripMargin,
    // MI twin: same contingency cells, identical ratio → ln → 9dp
    // term quantization, 6dp total.
    "mutual_info" ->
      """WITH cu AS (SELECT DISTINCT c_custkey, c_mktsegment
        |  FROM customer),
        |cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
        |    count(*) AS n
        |  FROM orders JOIN cu ON o_custkey = c_custkey GROUP BY 1, 2),
        |r AS (SELECT seg, cast(sum(n) AS bigint) AS r FROM cells
        |  GROUP BY 1),
        |c AS (SELECT prio, cast(sum(n) AS bigint) AS c FROM cells
        |  GROUP BY 1),
        |nt AS (SELECT cast(sum(n) AS double) AS nn FROM cells),
        |t AS (SELECT seg, prio, n,
        |    ln((cast(n AS double) * nn) / cast(r.r * c.c AS double))
        |      AS pmi
        |  FROM cells JOIN r USING (seg) JOIN c USING (prio), nt),
        |q AS (SELECT seg, prio, n, pmi,
        |    cast(round(cast(n AS double) / (SELECT nn FROM nt) * pmi, 9)
        |      AS decimal(28,9)) AS term9
        |  FROM t)
        |SELECT seg, prio, n, round(pmi, 6) AS pmi,
        |  round(cast(sum(term9) OVER () AS double), 6) AS mi_nats
        |FROM q ORDER BY seg, prio""".stripMargin,
    // CUBE twin: the rollup oracle's aggregate over the full 2^k
    // lattice.
    "cube_agg" ->
      s"""SELECT o_orderpriority, o_orderstatus,
         |  cast(grouping(o_orderpriority) * 2 + grouping(o_orderstatus)
         |    AS bigint) AS grp_id,
         |  ${dsum("o_totalprice")} AS sum_price, count(*) AS n_orders
         |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
         |ORDER BY grp_id, o_orderpriority NULLS FIRST,
         |  o_orderstatus NULLS FIRST""".stripMargin,
    // LTV twin: (user, week) exact micro revenue, min-week cohorts,
    // cumulative window per cohort.
    "ltv_curve" ->
      """WITH uw AS (SELECT user_id,
        |    epoch_us(ts) // 604800000000 AS week,
        |    cast(sum(cast(value AS decimal(18,6))) * 1000000
        |      AS hugeint) AS rev_u
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |co AS (SELECT user_id, min(week) AS cohort_week FROM uw
        |  GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS n_users FROM co
        |  GROUP BY 1),
        |cw AS (SELECT co.cohort_week,
        |    uw.week - co.cohort_week AS age_week,
        |    sum(uw.rev_u) AS wk_rev
        |  FROM uw JOIN co USING (user_id) GROUP BY 1, 2),
        |cum AS (SELECT cohort_week, age_week, wk_rev,
        |    sum(wk_rev) OVER (PARTITION BY cohort_week ORDER BY age_week
        |      ROWS UNBOUNDED PRECEDING) AS cum_rev
        |  FROM cw)
        |SELECT cohort_week, age_week, sz.n_users,
        |  round(cast(wk_rev AS double) / 1e6, 6) AS week_revenue,
        |  round(cast(cum_rev AS double)
        |    / (cast(sz.n_users AS double) * 1e6), 6) AS ltv_per_user
        |FROM cum JOIN sz USING (cohort_week)
        |ORDER BY cohort_week, age_week""".stripMargin,
    // Date-dim twin: integer epoch-day dow/week, civil fields on
    // DATE values.
    "date_dim" ->
      """WITH b AS (SELECT min(cast(o_orderdate AS date)) AS lo,
        |    max(cast(o_orderdate AS date)) AS hi FROM orders),
        |s AS (SELECT unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY))::DATE AS d FROM b),
        |e AS (SELECT d, cast(date_diff('day', DATE '1970-01-01', d)
        |    AS bigint) AS epoch_day FROM s)
        |SELECT d, epoch_day,
        |  (epoch_day + 4) % 7 AS dow,
        |  (epoch_day + 3) // 7 AS week_idx,
        |  cast(year(d) AS bigint) AS y,
        |  cast(month(d) AS bigint) AS m,
        |  cast(quarter(d) AS bigint) AS q,
        |  cast(day(d) AS bigint) AS dom,
        |  cast(CASE WHEN month(d + INTERVAL 1 DAY) <> month(d)
        |    THEN 1 ELSE 0 END AS bigint) AS is_month_end
        |FROM e ORDER BY d""".stripMargin,
    // Kaplan-Meier twin: identical censoring rule, 9dp-quantized ln
    // factors, exp of the exact cumulative sum.
    "survival_curve" ->
      """WITH u AS (SELECT user_id,
        |    min(epoch_us(ts) // 86400000000) AS f,
        |    max(epoch_us(ts) // 86400000000) AS l
        |  FROM events GROUP BY 1),
        |m AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CASE WHEN l < (SELECT md FROM m) - 0 THEN 1 ELSE 0 END
        |      AS ch
        |  FROM u),
        |g AS (SELECT t, cast(sum(ch) AS bigint) AS n_churn,
        |    cast(sum(1 - ch) AS bigint) AS n_censored
        |  FROM lt GROUP BY 1),
        |r AS (SELECT *, cast(sum(n_churn + n_censored)
        |    OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS bigint)
        |      AS n_at_risk FROM g),
        |lf AS (SELECT *,
        |    CASE WHEN n_churn = 0 THEN cast(0 AS decimal(28,9))
        |      WHEN n_churn = n_at_risk THEN NULL
        |      ELSE cast(round(ln(1.0 - cast(n_churn AS double)
        |        / cast(n_at_risk AS double)), 9) AS decimal(28,9))
        |    END AS lnf FROM r),
        |d AS (SELECT *,
        |    max(CASE WHEN n_churn = n_at_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
        |    sum(lnf) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS lnsum FROM lf)
        |SELECT t, n_at_risk, n_churn, n_censored,
        |  CASE WHEN dead = 1 THEN 0.0
        |    ELSE round(exp(cast(lnsum AS double)), 6) END AS survival
        |FROM d ORDER BY t""".stripMargin,
    // Keyword twin: decimal-exact tf·idf9 ranking, per-doc top-3.
    "keyword_extract" ->
      """WITH docs AS (SELECT doc_id, text FROM documents
        |  WHERE text IS NOT NULL),
        |t AS (SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x <> '')) AS tok
        |  FROM docs),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df,
        |    cast(round(ln(cast((SELECT count(*) FROM docs) AS double)
        |      / cast(count(*) AS double)), 9) AS decimal(28,9)) AS idf9
        |  FROM tf GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
        |    cast(tf.tf AS decimal(10,0)) * df.idf9 AS score
        |  FROM tf JOIN df USING (tok)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, tok ASC) AS rnk FROM s)
        |SELECT doc_id, cast(rnk AS bigint) AS rnk, tok AS keyword,
        |  cast(tf AS bigint) AS tf, cast(df AS bigint) AS df,
        |  round(cast(score AS double), 6) AS score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    // Hashing-trick twin: identical fv strings, md5-mod buckets.
    "feature_hashing" ->
      """WITH e AS (SELECT unnest([
        |    'event_type=' || event_type,
        |    'user_shard=' || cast(user_id % 1000 AS varchar),
        |    CASE WHEN value IS NOT NULL
        |      THEN 'value_bin=' || cast(cast(floor(value / 50.0)
        |        AS bigint) AS varchar)
        |      ELSE 'value_bin' END]) AS fv
        |  FROM events),
        |b AS (SELECT fv,
        |    cast(('0x' || substr(md5(fv), 25, 8))::UBIGINT % 64
        |      AS bigint) AS bucket
        |  FROM e),
        |grain AS (SELECT bucket, fv, count(*) AS n FROM b GROUP BY 1, 2)
        |SELECT bucket, cast(sum(n) AS bigint) AS n_rows,
        |  count(*) AS n_values,
        |  cast(CASE WHEN count(*) > 1 THEN 1 ELSE 0 END AS bigint)
        |    AS has_collision
        |FROM grain GROUP BY 1 ORDER BY 1""".stripMargin,
    // Cleaning twin: identical character classes; DuckDB needs the
    // 'g' flag to match Spark's replace-ALL regexp_replace.
    "text_clean" ->
      """WITH c AS (SELECT doc_id, text,
        |    regexp_replace(text,
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g') AS no_ctrl
        |  FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, text, no_ctrl,
        |    regexp_replace(regexp_replace(no_ctrl, '[ \t\r\n]+', ' ',
        |      'g'), '^ | $', '', 'g') AS cleaned
        |  FROM c)
        |SELECT doc_id,
        |  cast(length(text) AS bigint) AS raw_chars,
        |  cast(length(cleaned) AS bigint) AS clean_chars,
        |  cast(length(text) - length(no_ctrl) AS bigint) AS ctrl_removed,
        |  cast(length(no_ctrl) - length(cleaned) AS bigint)
        |    AS ws_collapsed,
        |  cast(CASE WHEN length(cleaned) = 0 THEN 1 ELSE 0 END
        |    AS bigint) AS is_empty
        |FROM w ORDER BY doc_id""".stripMargin,
    // Balance twin: per-class single-window rank, broadcast min.
    "balance_downsample" ->
      """WITH d AS (SELECT doc_id, lang,
        |    cast(('0x' || substr(md5(53 || ':' || doc_id), 25, 8))
        |      ::UBIGINT AS bigint) AS skey
        |  FROM documents),
        |m AS (SELECT min(c) AS mc FROM (
        |    SELECT lang, count(*) AS c FROM d GROUP BY 1)),
        |r AS (SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang ORDER BY skey, doc_id) AS rnk FROM d)
        |SELECT lang, count(*) AS n_before,
        |  cast(sum(CASE WHEN rnk <= (SELECT mc FROM m) THEN 1 ELSE 0
        |    END) AS bigint) AS n_kept,
        |  cast(sum(CASE WHEN rnk <= (SELECT mc FROM m)
        |    THEN doc_id % 1000003 ELSE 0 END) AS bigint)
        |    AS kept_checksum
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // Heat-grid twin: identical integer bucketing, exact sums.
    "heatmap_2d" ->
      """WITH l AS (SELECT cast(l_quantity AS bigint) // 10 AS qty_bin,
        |    cast(cast(l_extendedprice AS decimal(18,6)) * 1000000
        |      AS bigint) AS pu
        |  FROM lineitem)
        |SELECT qty_bin, pu // 5000000000 AS price_bin, count(*) AS n,
        |  round(cast(sum(cast(pu AS hugeint)) AS double) / 1e6, 6)
        |    AS revenue
        |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Threshold-sweep twin: identical cross-multiplied integer gates
    // over the same tokenizer stats.
    "quality_curve" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |d AS (SELECT doc_id, n_chars,
        |    cast(len(toks) AS bigint) AS n_tok,
        |    cast(len(list_filter(toks, x -> x IN ('the','a','and','of',
        |      'to','in','is','el','la','los','de','que','y','en')))
        |      AS bigint) AS n_stop
        |  FROM t),
        |s AS (SELECT d.*, t20h FROM d
        |  CROSS JOIN (SELECT unnest(range(11)) AS t20h))
        |SELECT t20h * 5 AS threshold_pct, count(*) AS n_docs,
        |  cast(sum(CASE WHEN n_stop * 20 >= t20h * n_tok THEN 1
        |    ELSE 0 END) AS bigint) AS n_kept,
        |  cast(sum(CASE WHEN n_stop * 20 >= t20h * n_tok THEN n_chars
        |    ELSE 0 END) AS bigint) AS kept_chars,
        |  cast(sum(CASE WHEN n_stop * 20 >= t20h * n_tok THEN 1
        |    ELSE 0 END) AS bigint) * 1000000 // count(*) AS keep_ppm
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    // Fingerprint twin: identical canonical strings (length-prefixed
    // fields, NULL → 'N' — see Analytics.canonField), md5 tail-32,
    // exact sum mod 1e9+7.
    "table_fingerprint" ->
      s"""WITH de AS (SELECT ${cf("event_id")} || '|'
        |    || ${cf("epoch_us(ts)")} || '|' || ${cf("user_id")} || '|'
        |    || ${cf("event_type")} || '|'
        |    || ${cf("cast(cast(value AS decimal(18,6)) * 1000000 AS bigint)")}
        |    || '|' || ${cf("props")} AS canon
        |  FROM events),
        |dord AS (SELECT ${cf("o_orderkey")} || '|' || ${cf("o_custkey")}
        |    || '|' || ${cf("o_orderstatus")} || '|'
        |    || ${cf("cast(cast(o_totalprice AS decimal(18,6)) * 1000000 AS bigint)")}
        |    || '|' || ${cf("epoch_us(o_orderdate)")} || '|'
        |    || ${cf("o_orderpriority")} AS canon
        |  FROM orders),
        |ddoc AS (SELECT ${cf("doc_id")} || '|' || ${cf("text")} || '|'
        |    || ${cf("lang")} || '|' || ${cf("source")} || '|'
        |    || ${cf("n_chars")} AS canon
        |  FROM documents),
        |f AS (
        |  SELECT 'documents' AS tbl, count(*) AS n_rows,
        |    cast(sum(cast(('0x' || substr(md5(canon), 25, 8))::UBIGINT
        |      AS hugeint)) % 1000000007 AS bigint) AS checksum
        |  FROM ddoc
        |  UNION ALL
        |  SELECT 'events', count(*),
        |    cast(sum(cast(('0x' || substr(md5(canon), 25, 8))::UBIGINT
        |      AS hugeint)) % 1000000007 AS bigint)
        |  FROM de
        |  UNION ALL
        |  SELECT 'orders', count(*),
        |    cast(sum(cast(('0x' || substr(md5(canon), 25, 8))::UBIGINT
        |      AS hugeint)) % 1000000007 AS bigint)
        |  FROM dord)
        |SELECT tbl AS "table", n_rows, checksum FROM f
        |ORDER BY 1""".stripMargin,
    // 3-itemset twin: same distinct collapse, ordered triple join.
    "itemset_3" ->
      """WITH lines AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |  c.l_partkey AS pc, count(*) AS support
        |FROM lines a
        |JOIN lines b ON a.l_orderkey = b.l_orderkey
        |  AND a.l_partkey < b.l_partkey
        |JOIN lines c ON b.l_orderkey = c.l_orderkey
        |  AND b.l_partkey < c.l_partkey
        |GROUP BY 1, 2, 3
        |ORDER BY support DESC, pa, pb, pc LIMIT 20""".stripMargin,
    // Feature-store twin: one user-grain aggregate, integer div
    // recency/activity, exact decimal revenue.
    "user_features" ->
      s"""WITH ev AS (SELECT user_id, event_type,
         |    epoch_us(ts) // 86400000000 AS day,
         |    epoch_us(ts) AS us, value FROM events),
         |m AS (SELECT max(us) AS mx FROM ev),
         |g AS (SELECT user_id, count(*) AS n_events,
         |    max(day) - min(day) + 1 AS lifetime_days,
         |    count(DISTINCT day) AS active_days,
         |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS n_click,
         |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS n_view,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS n_purchase,
         |    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         |      AS n_signup,
         |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |      AS n_error,
         |    ${dsum("CASE WHEN event_type = 'purchase' THEN value END")}
         |      AS purchase_revenue,
         |    max(us) AS last_us
         |  FROM ev GROUP BY 1)
         |SELECT user_id, n_events,
         |  cast(lifetime_days AS bigint) AS lifetime_days,
         |  cast(active_days AS bigint) AS active_days,
         |  cast(n_click AS bigint) AS n_click,
         |  cast(n_view AS bigint) AS n_view,
         |  cast(n_purchase AS bigint) AS n_purchase,
         |  cast(n_signup AS bigint) AS n_signup,
         |  cast(n_error AS bigint) AS n_error,
         |  purchase_revenue,
         |  ((SELECT mx FROM m) - last_us) // 86400000000
         |    AS recency_days,
         |  active_days * 1000000 // lifetime_days AS activity_ppm
         |FROM g ORDER BY user_id""".stripMargin,
    // Backlog twin: per-line open membership collapsed to order
    // grain, identical integer midpoint snapshot instant.
    "backlog_aging" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
        |    epoch_us(o_orderdate) // 86400000000 AS oday FROM orders),
        |dd AS (SELECT (min(oday) + max(oday)) // 2 AS d FROM o),
        |li AS (SELECT l_orderkey,
        |    epoch_us(l_shipdate) // 86400000000 AS sday,
        |    cast(cast(l_extendedprice AS decimal(18,6)) * 1000000
        |      AS bigint) AS pu
        |  FROM lineitem),
        |per AS (SELECT o.o_orderkey, o.o_orderpriority, o.oday,
        |    sum(CASE WHEN sday > (SELECT d FROM dd) THEN 1 ELSE 0 END)
        |      AS open_lines,
        |    sum(CASE WHEN sday > (SELECT d FROM dd)
        |      THEN cast(pu AS hugeint) END) AS open_u
        |  FROM o JOIN li ON o_orderkey = l_orderkey
        |  WHERE o.oday <= (SELECT d FROM dd)
        |  GROUP BY 1, 2, 3)
        |SELECT o_orderpriority,
        |  ((SELECT d FROM dd) - oday) // 7 AS age_bucket,
        |  count(*) AS n_orders,
        |  cast(sum(open_lines) AS bigint) AS open_lines,
        |  round(cast(sum(open_u) AS double) / 1e6, 6) AS open_value
        |FROM per WHERE open_lines > 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}

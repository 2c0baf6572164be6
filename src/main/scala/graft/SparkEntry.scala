package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qSpjoinIntersects(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_spjoin_intersects" -> (Queries.qSpjoinIntersects _),
    "q_spjoin_dwithin" -> (Queries.qSpjoinDwithin _),
    "q_spjoin_contains" -> (Queries.qSpjoinContains _),
    "q_spjoin_equals" -> (Queries.qSpjoinEquals _),
    "q_containment" -> (Queries.qContainment _),
    "q_knn" -> (Queries.qKnn _),
    "q_knn_bounded" -> (Queries.qKnnBounded _),
    "q_mbb_stats" -> (Queries.qMbbStats _),
    "q1_agg" -> (Queries.q1Agg _),
    "q_window_topk" -> (Queries.qWindowTopk _),
    "q_dedup_exact" -> (Queries.qDedupExact _),
    "q_text_stats" -> (Queries.qTextStats _),
    "q_lang_id" -> (Queries.qLangId _),
    "q_fingerprint" -> (Queries.qFingerprint _),
    "q_dedup_ngram" -> (Queries.qDedupNgram _),
    "q_minhash_lsh" -> (Queries.qMinhashLsh _),
    "q_simhash" -> (Queries.qSimhash _),
    "q_ann_topk" -> (Queries.qAnnTopk _),
    "q_events_window" -> (Queries.qEventsWindow _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_spjoin_touches" -> (Queries.qSpjoinTouches _),
    "q_normalize" -> (Queries.qNormalize _),
    "q_snap" -> (Queries.qSnap _),
    "q_discretize" -> (Queries.qDiscretize _),
    "q3_join" -> (Queries.q3Join _),
    "q_json_extract" -> (Queries.qJsonExtract _),
    "q_temporal" -> (Queries.qTemporal _),
    "q_partition_stats" -> (Queries.qPartitionStats _),
    "q_sample" -> (Queries.qSample _),
    "q_pair_measures" -> (Queries.qPairMeasures _),
    "q_mindist" -> (Queries.qMindist _),
    "q1_pricing" -> (Queries.q1Pricing _),
    "q_multimodal" -> (Queries.qMultimodal _),
    "q_word_freq" -> (Queries.qWordFreq _),
    "q_store_containment" -> (Queries.qStoreContainment _),
    "q_neardup_cosine" -> (Queries.qNearDupCosine _),
    "q_bpe" -> (Queries.qBpe _),
    "q_spjoin_crosses" -> (Queries.qSpjoinCrosses _),
    "q_knn_tile" -> (Queries.qKnnTile _),
    "q_spjoin_within" -> (Queries.qSpjoinWithin _),
    "q_spjoin_overlaps" -> (Queries.qSpjoinOverlaps _),
    "q_spjoin_adjacent" -> (Queries.qSpjoinAdjacent _),
    "q_disjoint_global" -> (Queries.qDisjointGlobal _),
    "q_fields" -> (Queries.qFields _),
    "q_spjoin_twolevel" -> (Queries.qSpjoinTwolevel _),
    "q_ann_ivf" -> (Queries.qAnnIvf _),
    "q_spjoin_hcdist" -> (Queries.qSpjoinHcdist _),
    "q_partition_quality" -> (Queries.qPartitionQuality _),
    "q_wkt_roundtrip" -> (Queries.qWktRoundtrip _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_spjoin_intersects" -> Queries.qSpjoinIntersectsSql,
    "q_spjoin_dwithin" -> Queries.qSpjoinDwithinSql,
    "q_spjoin_contains" -> Queries.qSpjoinContainsSql,
    "q_spjoin_equals" -> Queries.qSpjoinEqualsSql,
    "q_containment" -> Queries.qContainmentSql,
    "q_knn" -> Queries.qKnnSql,
    "q_knn_bounded" -> Queries.qKnnBoundedSql,
    "q_mbb_stats" -> Queries.qMbbStatsSql,
    "q1_agg" -> Queries.q1AggSql,
    "q_window_topk" -> Queries.qWindowTopkSql,
    "q_dedup_exact" -> Queries.qDedupExactSql,
    "q_text_stats" -> Queries.qTextStatsSql,
    "q_lang_id" -> Queries.qLangIdSql,
    "q_fingerprint" -> Queries.qFingerprintSql,
    "q_dedup_ngram" -> Queries.qDedupNgramSql,
    // q_minhash_lsh / q_simhash: engine-internal hash families, not
    // SQL-expressible -> rows-only check; recall is ScalaTest-gated.
    "q_ann_topk" -> Queries.qAnnTopkSql,
    "q_events_window" -> Queries.qEventsWindowSql,
    "q_sessionize" -> Queries.qSessionizeSql,
    "q_spjoin_touches" -> Queries.qSpjoinTouchesSql,
    "q_normalize" -> Queries.qNormalizeSql,
    "q_snap" -> Queries.qSnapSql,
    "q_discretize" -> Queries.qDiscretizeSql,
    "q3_join" -> Queries.q3JoinSql,
    "q_json_extract" -> Queries.qJsonExtractSql,
    "q_temporal" -> Queries.qTemporalSql,
    "q_partition_stats" -> Queries.qPartitionStatsSql,
    "q_sample" -> Queries.qSampleSql,
    "q_multimodal" -> Queries.qMultimodalSql,
    "q_pair_measures" -> Queries.qPairMeasuresSql,
    "q_mindist" -> Queries.qMindistSql,
    "q1_pricing" -> Queries.q1PricingSql,
    "q_word_freq" -> Queries.qWordFreqSql,
    "q_store_containment" -> Queries.qStoreContainmentSql,
    "q_neardup_cosine" -> Queries.qNearDupCosineSql,
    "q_bpe" -> Queries.qBpeSql,
    "q_spjoin_crosses" -> Queries.qSpjoinCrossesSql,
    "q_knn_tile" -> Queries.qKnnTileSql,
    "q_spjoin_within" -> Queries.qSpjoinWithinSql,
    "q_spjoin_overlaps" -> Queries.qSpjoinOverlapsSql,
    "q_spjoin_adjacent" -> Queries.qSpjoinAdjacentSql,
    "q_disjoint_global" -> Queries.qDisjointGlobalSql,
    "q_fields" -> Queries.qFieldsSql,
    "q_spjoin_twolevel" -> Queries.qSpjoinTwolevelSql,
    // q_ann_ivf: centroid training engine-internal -> rows-only; recall
    // vs brute force is ScalaTest-gated.
    "q_spjoin_hcdist" -> Queries.qSpjoinHcdistSql,
    "q_partition_quality" -> Queries.qPartitionQualitySql,
    "q_wkt_roundtrip" -> Queries.qWktRoundtripSql,
  )
}

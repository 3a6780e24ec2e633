package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Caches, EventOps, GraphOps, IvfIndex, Layout, LogReg, LshIndex, TextOps}
import graft.sources.Tables
import graft.pipeline.CurationPipeline

import graft.functions.{BloomMightContain, CosineSimilarity, MinHashSignature, VectorOps}

/** LLM-training-data pipeline operators (BASELINE.json north star; SURVEY.md
  * §2 "north-star extension operators"): dedup (exact / MinHash+LSH /
  * SimHash / n-gram Jaccard / embedding-cosine), similarity search (brute
  * force + LSH-bucketed ANN), text analysis (lang-ID, quality, tokens,
  * fingerprints), multimodal binary columns. Every query is oracle-paired;
  * the MinHash/SimHash SQL is generated from the same (k, bands, bits)
  * parameters the Spark side uses, so the two can't drift.
  */
object ExtQueries extends ExtDedupQueries with ExtAnnQueries
    with ExtCurationQueries with ExtInfraQueries with ExtGraphQueries
    with ExtRetrievalQueries {

  // ------------------------------------------------------------- registry

  val all: Seq[Decl] = Seq(
    Decl("q51_bloom_incremental_dedup", q51, Some(q51Sql)),
    Decl("q54_ann_ivf", q54, Some(q54Sql)),
    Decl("q55_records_wire_roundtrip", q55, Some(q55Sql)),
    Decl("q58_doc_chunking", q58, Some(q58Sql)),
    Decl("q18_dedup_exact", q18, Some(q18Sql)),
    Decl("q19_minhash_signature", q19, Some(q19Sql)),
    Decl("q20_minhash_lsh_neardup", q20, Some(q20Sql)),
    Decl("q59_dedup_clusters", q59, Some(q59Sql)),
    Decl("q61_clustered_layout_scan", q61, Some(q61Sql)),
    Decl("q62_lsh_index_incremental", q62, Some(q62Sql)),
    Decl("q63_zorder_layout_scan", q63, Some(q63Sql)),
    Decl("q64_curation_pipeline", q64, Some(q64Sql)),
    Decl("q21_simhash", q21, Some(q21Sql)),
    Decl("q22_ngram_jaccard", q22, Some(q22Sql)),
    Decl("q23_knn_bruteforce", q23, Some(q23Sql)),
    Decl("q24_ann_lsh_bucketed", q24, Some(q24Sql)),
    Decl("q25_lang_id", q25, Some(q25Sql)),
    Decl("q26_quality_score", q26, Some(q26Sql)),
    Decl("q27_token_count", q27, Some(q27Sql)),
    Decl("q28_fingerprint", q28, Some(q28Sql)),
    Decl("q29_multimodal_meta", q29, Some(q29Sql)),
    Decl("q30_embedding_neardup", q30, Some(q30Sql)),
    Decl("q65_ann_ivf_persisted", q65, Some(q54Sql)),
    Decl("q66_int8_quantization", q66, Some(q66Sql)),
    Decl("q67_pii_redaction", q67, Some(q67Sql)),
    Decl("q68_sequence_packing", q68, Some(q68Sql)),
    Decl("q69_benchmark_contamination", q69, Some(q69Sql)),
    Decl("q70_repetition_ratio", q70, Some(q70Sql)),
    Decl("q71_shard_assignment", q71, Some(q71Sql)),
    Decl("q72_curation_v2", q72, Some(q72Sql)),
    Decl("q73_span_fingerprint_dedup", q73, Some(q73Sql)),
    Decl("q74_mixture_sampling", q74, Some(q74Sql)),
    Decl("q75_corpus_delta", q75, Some(q75Sql)),
    Decl("q76_unigram_lm_quality", q76, Some(q76Sql)),
    Decl("q77_semdedup", q77, Some(q77Sql)),
    Decl("q78_vocab_oov", q78, Some(q78Sql)),
    Decl("q79_random_projection", q79, Some(q79Sql)),
    Decl("q80_hashed_classifier", q80, Some(q80Sql)),
    Decl("q81_source_overlap", q81, Some(q81Sql)),
    Decl("q82_bpe_merge_round", q82, Some(q82Sql)),
    Decl("q84_lsh_calibration_audit", q84, Some(q84Sql)),
    Decl("q85_cluster_canonical", q85, Some(q85Sql)),
    Decl("q86_source_cap", q86, Some(q86Sql)),
    Decl("q87_ivf_recall_audit", q87, Some(q87Sql)),
    Decl("q88_kmeans_train", q88, Some(q88Sql)),
    Decl("q89_curation_canonical", q89, Some(q89Sql)),
    Decl("q90_boilerplate_removal", q90, Some(q90Sql)),
    Decl("q91_image_decode", q91, Some(q91Sql)),
    Decl("q92_stream_lsh_dedup", q92, Some(q62Sql)),
    Decl("q93_bpe_apply_merge", q93, Some(q93Sql)),
    Decl("q94_logreg_train", q94, Some(q94Sql)),
    Decl("q95_audio_decode", q95, Some(q95Sql)),
    Decl("q96_dataset_build", q96, Some(q96Sql)),
    Decl("q97_ann_ivf_incremental", q97, Some(q97Sql)),
    Decl("q98_temperature_upsampling", q98, Some(q98Sql)),
    Decl("q99_media_embed_ann", q99, Some(q99Sql)),
    Decl("q100_pairlog_replay_consumer", q100, Some(q100Sql)),
    Decl("q101_index_takedown_compact", q101, Some(q101Sql)),
    Decl("q102_gif_frame_sample", q102, Some(q102Sql)),
    Decl("q103_audio_pcm_features", q103, Some(q103Sql)),
    Decl("q104_audio_resample", q104, Some(q104Sql)),
    Decl("q105_stream_ivf_ingest", q105, Some(q105Sql)),
    Decl("q106_stream_lsh_autocompact", q106, Some(q62Sql)),
    Decl("q107_simhash_neardup", q107, Some(q107Sql)),
    Decl("q108_simhash_calibration_audit", q108, Some(q108Sql)),
    Decl("q109_ivf_takedown_compact", q109, Some(q109Sql)),
    Decl("q110_video_stream_decode", q110, Some(q110Sql)),
    Decl("q111_video_frame_embed_ann", q111, Some(q111Sql)),
    Decl("q112_stream_simhash_dedup", q112, Some(q112Sql)),
    Decl("q113_mjpeg_video_decode", q113, Some(q113Sql)),
    Decl("q114_video_fps_resample", q114, Some(q114Sql)),
    Decl("q115_mp4_track_decode", q115, Some(q115Sql)),
    Decl("q116_stream_media_ivf_ingest", q116, Some(q116Sql)),
    Decl("q117_mp4_sample_decode", q117, Some(q117Sql)),
    Decl("q118_dsir_importance", q118, Some(q118Sql)),
    Decl("q119_filter_cascade_audit", q119, Some(q119Sql)),
    Decl("q120_cdc_chunk_dedup", q120, Some(q120Sql)),
    Decl("q121_mp4_pcm_decode", q121, Some(q121Sql)),
    Decl("q122_bigram_lm_backoff", q122, Some(q122Sql)),
    Decl("q123_pq_adc_ann", q123, Some(q123Sql)),
    Decl("q124_ivfpq_ann", q124, Some(q124Sql)),
    Decl("q125_pq_recall_audit", q125, Some(q125Sql)),
    Decl("q126_pq_rerank_ann", q126, Some(q126Sql)),
    Decl("q127_image_dhash_neardup", q127, Some(q127Sql)),
    Decl("q128_audio_contour_dedup", q128, Some(q128Sql)),
    Decl("q129_video_scene_cuts", q129, Some(q129Sql)),
    Decl("q130_bm25_topk", q130, Some(q130Sql)),
    Decl("q131_nfc_normalize", q131, Some(q131Sql)),
    Decl("q132_stream_image_dhash_dedup", q132, Some(q132Sql)),
    Decl("q133_pagerank_neardup", q133, Some(q133Sql)),
    Decl("q134_containment_dedup", q134, Some(q134Sql)),
    Decl("q135_format_interop", q135, Some(q135Sql)),
    Decl("q136_token_spectrum", q136, Some(q136Sql)),
    Decl("q137_y4m_video_decode", q137, Some(q137Sql)),
    Decl("q138_stream_pq_ingest", q138, Some(q138Sql)),
    Decl("q139_bpe_trainer", q139, Some(q139Sql)),
    Decl("q140_mpegts_demux", q140, Some(q140Sql)),
    Decl("q142_classifier_auc", q142, Some(q142Sql)),
    Decl("q143_token_entropy", q143, Some(q143Sql)),
    Decl("q144_flac_metadata", q144, Some(q144Sql)),
    Decl("q145_priority_sample", q145, Some(q145Sql)),
    Decl("q146_warc_ingest", q146, Some(q146Sql)),
    Decl("q147_changelog_merge", q147, Some(q147Sql)),
    Decl("q148_nn_descent", q148, Some(q148Sql)),
    Decl("q149_mp3_metadata", q149, Some(q149Sql)),
    Decl("q150_stream_changelog_merge", q150, Some(q150Sql)),
    Decl("q152_hard_negative_mining", q152, Some(q152Sql)),
    Decl("q153_url_canonicalize", q153, Some(q153Sql)),
    Decl("q154_vtt_frame_align", q154, Some(q154Sql)),
    Decl("q155_webdataset_ingest", q155, Some(q155Sql)),
    Decl("q156_crawl_to_corpus", q156, Some(q156Sql)),
    Decl("q157_ogg_page_walk", q157, Some(q157Sql)),
    Decl("q158_pagerank_capped", q158, Some(q158Sql)),
    Decl("q159_bpe_batched", q159, Some(q159Sql)),
    Decl("q160_bpe_encode", q160, Some(q160Sql)),
    Decl("q161_filtered_ivf_ann", q161, Some(q161Sql)),
    Decl("q162_leakage_safe_split", q162, Some(q162Sql)),
    Decl("q163_graph_ann_beam", q163, Some(q163Sql)),
    Decl("q164_substring_dedup_removal", q164, Some(q164Sql)),
    Decl("q165_graph_index_incremental", q165, Some(q165Sql)),
    Decl("q166_stream_graph_ingest", q166, Some(q166Sql)),
    Decl("q167_graph_takedown_compact", q167, Some(q167Sql)),
    Decl("q168_matryoshka_rerank", q168, Some(q168Sql)),
    Decl("q169_zip_shard_ingest", q169, Some(q169Sql)),
    Decl("q170_html_extract", q170, Some(q170Sql)),
    Decl("q171_crawl_html_chain", q171, Some(q171Sql)),
    Decl("q172_stream_graph_autocompact", q172, Some(q166Sql)),
    Decl("q173_bm25_index_topk", q173, Some(q130Sql)),
    Decl("q174_bm25_index_incremental", q174, Some(q174Sql)),
    Decl("q175_stream_bm25_ingest", q175, Some(q175Sql)),
    Decl("q176_bm25_takedown_compact", q176, Some(q176Sql)),
    Decl("q177_matryoshka_ivf", q177, Some(q177Sql)),
    Decl("q178_adts_frame_walk", q178, Some(q178Sql)),
    Decl("q179_h264_nal_walk", q179, Some(q179Sql)),
    Decl("q180_ts_h264_chain", q180, Some(q180Sql)),
    Decl("q181_hybrid_rrf_fusion", q181, Some(q181Sql)),
    Decl("q182_pdf_text_extract", q182, Some(q182Sql)),
    Decl("q183_langid_trained", q183, Some(q183Sql)),
    Decl("q184_zip_pdf_chain", q184, Some(q184Sql)),
    Decl("q185_hybrid_fusion_audit", q185, Some(q185Sql)),
    Decl("q186_phrase_bm25", q186, Some(q186Sql)),
    Decl("q187_phrase_index_topk", q187, Some(q186Sql)),
    Decl("q188_phrase_takedown_compact", q188, Some(q188Sql)),
    Decl("q189_phrase_index_incremental", q189, Some(q186Sql)),
    Decl("q190_langid_confusion", q190, Some(q190Sql)),
    Decl("q191_stream_hybrid_fusion", q191, Some(q191Sql)))

  /** tools.StageProfile's window into the shared pair operator —
    * profiling-only, not part of any gate. */
  def profileNearDupPairs(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = nearDupPairs(spark, dir)

  /** Queries that stage on-disk scratch (index builds, streaming
    * checkpoints) during evaluation. Bench runs these LAST and settles
    * I/O after each: even with [[graft.ops.Scratch]] preferring tmpfs,
    * on a fallback (disk-backed) scratch root their async dirty-page
    * writeback would otherwise be charged to whatever query runs next —
    * the round-11 artifact recorded ~75 s of exactly that bleeding into
    * q10–q13. Names must match the Decl names above (BenchOrderSpec
    * pins the subset relation). */
  val lifecycleNames: Set[String] = Set(
    "q61_clustered_layout_scan", "q62_lsh_index_incremental",
    "q63_zorder_layout_scan", "q65_ann_ivf_persisted",
    "q92_stream_lsh_dedup", "q97_ann_ivf_incremental",
    "q100_pairlog_replay_consumer", "q101_index_takedown_compact",
    "q105_stream_ivf_ingest", "q106_stream_lsh_autocompact",
    "q109_ivf_takedown_compact", "q112_stream_simhash_dedup",
    "q116_stream_media_ivf_ingest", "q132_stream_image_dhash_dedup",
    "q135_format_interop", "q138_stream_pq_ingest",
    "q150_stream_changelog_merge", "q165_graph_index_incremental",
    "q166_stream_graph_ingest", "q167_graph_takedown_compact",
    "q172_stream_graph_autocompact", "q173_bm25_index_topk",
    "q174_bm25_index_incremental", "q175_stream_bm25_ingest",
    "q176_bm25_takedown_compact", "q177_matryoshka_ivf",
    "q181_hybrid_rrf_fusion", "q185_hybrid_fusion_audit",
    "q187_phrase_index_topk", "q188_phrase_takedown_compact",
    "q189_phrase_index_incremental", "q191_stream_hybrid_fusion")
}

#!/bin/bash
# Round-16 BASELINE sweep: 3 isolated legs per operator family on
# unmodified HEAD, sf0.1, 32 cores. q01_pricing_summary rides in every
# leg as the alphabetically-first JIT absorber (its own number is not
# evidence).
set -u
cd /root/repo
L=tools/bench_r16_leg.sh
bash $L base_commit  "q01_pricing_summary,q38_ingest_roundtrip,q46_osc_roundtrip,q50_bucketed_roundtrip,q52_pbf_roundtrip,q93_compact_roundtrip,q103_oscgz_roundtrip" 3 32
bash $L base_vstore  "q01_pricing_summary,q83_time_travel,q84_incremental_tags,q197_version_history" 3 32
bash $L base_extract "q01_pricing_summary,q32_extract_complete,q47_buffered_extract,q53_nouserdata_extract" 3 32
bash $L base_stream  "q01_pricing_summary,q104_streaming_dedup,q105_streaming_lsh,q114_streaming_window,q115_streaming_sessions,q130_streaming_sketch,q136_stream_stream_join,q138_streaming_dropdup,q158_stream_static_enrich" 3 32
bash $L base_mm      "q01_pricing_summary,q107_image_decode,q116_audio_decode,q126_phash_dedup,q135_video_decode,q163_thumbnail_resize" 3 32
bash $L base_dedup   "q01_pricing_summary,stage:lsh_candidates,stage:neardup_pairs,stage:dedup_components,q100_training_build,q119_pagerank,q154_containment_dedup,q193_prefix_filter_join,q198_dsir_select" 3 32
echo "[r16] baseline sweep done: $(date -u +%H:%M:%S)"

import sys, re
sys.path.insert(0, '/root/repo')
from vectordb_light_spark.queries import QUERIES
from vectordb_light_spark.session import get_spark
spark = get_spark('plans'); spark.sparkContext.setLogLevel('ERROR')
sf = '/root/testdata/sf0.01'

NOTES = {
 'vq_topk_cosine': 'Exact top-k: per-task k-heaps merged at the driver (TakeOrderedAndProject) over a column-pruned scan; rank Window runs on k=6 rows only. No shuffle of the vectors table.',
 'vq_batch_topk': 'Batch search: ONE scan serves 100 queries. The query matrix is broadcast; each partition runs a single BLAS block-matmul (mapInPandas) and emits only its local top-k per query, so the exchange into the final window rank carries k rows per query per partition — the N x M similarity matrix never exists as rows.',
 'vq_postfilters': 'Late materialization: text joins in via BroadcastHashJoin; threshold/term/type filters stay ABOVE the top-k (reference semantics). Scan pushes IsNotNull only — the similarity filter cannot be pushed below the limit, by design.',
 'rel_pricing_summary': 'TPC-H Q1 shape: shipdate predicate pushed to the parquet scan, partial HashAggregate before the exchange (map-side combine), final agg after; one narrow shuffle of 4 grouping cells.',
 'rel_join_nation_customers': 'Dimension joins are BroadcastHashJoin chains (region→nation→customer), zero shuffle on the fact side until the final tiny agg.',
 'dd_exact_dedup': 'Exact dedup: canonical-text fingerprint groupBy shuffles a 64-bit key (never the text); survivors join back via BroadcastHashJoin.',
 'st_events_sessions': 'Session windows: MergingSessions operator with partial/final aggregation around one keyed exchange — the same expression runs under readStream with a watermark.',
 'dd_embedding_near_dups': 'Embedding near-dup exact tier: the O(N^2) pair explosion never enters the plan — a broadcast matrix block-matmul inside mapInPandas emits already-filtered pairs.',
 'ann_topk_join': 'Large x large approximate top-k join: SRP signatures (vectorized UDF stage), band equi-join on uniform hash keys (no skew), exact cosine only on candidates, per-left window rank. Neither side is collected or broadcast.',
 'rel_events_asof': 'As-of join via union+window: clicks and purchases share one spine, ONE exchange on user_id, last(payload, ignorenulls) fills each click with its predecessor purchase. No SortMergeJoin/pair explosion anywhere in the plan.',
 'rel_events_interval': 'Range join via bucketization: intervals explode into covered time buckets, points join on (user_id, bucket) as a plain hash equi-join with the exact BETWEEN as post-filter — no BroadcastNestedLoopJoin.',
 'pipe_sequence_pack': 'Sequence packing: two-phase parallel prefix sum — one RangePartitioning exchange + in-partition sort, then a mapInPandas sweep adds broadcast per-partition offsets. No SinglePartition exchange (the naive global window would have one).',
 'pipe_corpus_mix': 'Stratified sampling/corpus mixing: the per-language keep-rate is a CASE over md5-hex thresholds evaluated map-side inside the scan stage; the only exchange is the final 5-group aggregate.',
 'kw_bm25_topk': 'BM25 lexical top-k: the query-term isin() filter lands on the EXPLODED token stream inside the scan stage, so the tf aggregation exchange carries only matching postings; doc-frequency and corpus stats re-enter via broadcast; final top-k is TakeOrderedAndProject. All codegen builtins — no Python stage.',
 'kw_hybrid_rrf': 'Hybrid RRF: BM25 top-20 and cosine top-20 are each k-row TakeOrderedAndProject results; fusion is union + ONE tiny groupBy (no outer-join chain).',
 'skew_salted_user_join': 'Salted skew join: the probe side derives a deterministic hash salt map-side; the build side replicates via a literal-array Generate. The join key (user_id, _salt) splits any hot user over 8 reducers; result is oracle-equal to the unsalted join.',
 'rel_region_volume': 'TPC-H Q5 shape: region filter prunes before any join; region->nation->supplier and customer all enter as BroadcastHashJoins; lineitem JOIN orders is the single data-sized exchange pair.',
 'rel_events_moving_avg': 'Time-RANGE window on epoch micros: one hashpartitioning(user_id) exchange feeds both the running-frame Window and the final per-user aggregate; frame sums are integer cents (order-independent) with floor-div discretization (cross-engine ROUND ties).',
 'rel_customer_activity': 'Semi/anti joins: orders is projected to the key column before either probe; nation re-enters as BroadcastHashJoin over the 25-row aggregates. No row payload crosses the semi/anti shuffles.',
 'rel_user_retention': 'INTERSECT/EXCEPT compile to hash semi/anti joins over the distinct day slices; the day bounds are two collected scalars, not a join input.',
 'prof_events_cube': 'CUBE = one Expand + ONE hash aggregate pair (partial before the exchange): all four event_type x day marginal combinations in a single scan, not four unioned scans.',
 'emb_doc_mean_pool': 'Mean-pool: posexplode feeds sum/count groupBy with MAP-SIDE partial aggregation — the exchange carries (group x dim) partials, never N x dim element rows; renorm and reassembly run on group-sized data.',
 'ts_tfidf_top_terms': 'TF-IDF: one explode(split) stage persisted for both consumers (per-lang TF, distinct-doc DF); the DF side aggregates to vocabulary size so the score join broadcasts; top-3 via WindowGroupLimit pushdown.',
 'ann_pq_topk': 'PQ/ADC scan: the plan reads (id, 16-byte code) only — the vector column never appears; the ADC score is a JVM transform/element_at/aggregate over the code, and TakeOrderedAndProject caps every task at k rows.',
 'mm_audio_windows': 'Audio windows: explode(sequence(duration/hop)) is pure codegen — window boundaries derive from typed metadata with no Python stage in this path.',
 'rel_big_orders': 'TPC-H Q18 shape: the HAVING qty aggregate computes ONCE and re-enters the orders join as a BroadcastExchange (big-order keys are tiny at any scale); customer joins broadcast; final top-20 is TakeOrderedAndProject.',
 'dd_containment_pairs': 'Containment: the df<=20 stop-shingle filter lands BEFORE the posting self-join, so the quadratic blow-up is bounded at max_df x postings; the persisted shingle stage feeds sizes, df, and both join sides from one computation.',
 'ann_ivfpq_topk': 'IVFPQ: cluster isin() filter prunes rows (partition pruning on a partitioned store), then the ADC ranking reads (id, 16-byte code) only — two multiplying pruning axes, no vector column in the scan.',
 'vq_grouped_topk': 'Per-group top-k: WindowGroupLimit appears BELOW the exchange (per-task group-heaps) and again above it — each task forwards at most k rows per label, the grouped analogue of TakeOrderedAndProject.',
 'pipe_weighted_sample': 'Weighted sampling: the -ln(u)/w key is a map-side codegen expression over md5; selection is TakeOrderedAndProject — one scan, no shuffle, no RNG state at any corpus size.',
 'rel_events_funnel': 'Ordered funnel: three per-user MIN aggregates chained by strictly-greater joins; every aggregate and join keys on user_id so the plan reuses one hashpartitioning.',
 'rel_events_cohorts': 'Cohort retention: first-day agg, activity distinct, join, and the final count-distinct all key on user_id; count-distinct runs as the two-phase partial-distinct expand.',
 'prof_events_corr': 'Bivariate stats: corr/covar/stddev are algebraic aggregates — moment sums combine map-side, the exchange carries one partial row per (event_type, task).',
 'prof_value_histogram': 'Histogram: bucket expression folds into the scan stage; partial counts mean the exchange carries one row per bucket per task.',
 'ts_bigram_lm_score': 'Bigram LM score: ONE tokenize+bigram explode persists (InMemoryTableScan feeds model counts AND scoring); the bigram-count and continuation-count tables aggregate to vocabulary size and re-enter as BroadcastHashJoins.',
 'rel_orders_pareto': 'Pareto: per-customer cents aggregate (partial+final), then ONE ordered window partition computes rank and running share; integer-cents keep cross-engine order bit-deterministic.',
 'rel_forecast_revenue': 'Q6 shape: every predicate conjunct lands in PushedFilters; the plan is scan -> partial HashAggregate -> exchange of ONE row -> final agg.',
 'dd_minhash_candidates': 'MinHash LSH: one Arrow signature stage persists (both self-join sides read the InMemoryTableScan); band keys explode to (band_idx, key) and the candidate join is a plain hash equi-join on uniform keys — shuffle carries (key, id, 16-long signature), never text; est-Jaccard is a zip_with over the joined signatures.',
 'dd_simhash_near_dups': 'SimHash: sketch UDF persists once; posexplode emits 4 fixed-width block keys per row, the block equi-join + bit_count verify bounds the candidate set BEFORE the pair-dedup exchange.',
 'dd_remove_boilerplate': 'Boilerplate strip: posexplode(split) persists; the frequency agg shuffles a 64-bit segment hash (never segment text) and aggregates to distinct-segment count, so the anti-join back is broadcast-able; rebuild is one groupBy(id) with positional array_sort.',
 'pipe_decontaminate': 'Decontamination: benchmark grams aggregate to a distinct md5-key set and re-enter as BroadcastHashJoin (LeftAnti-style hit probe); the train side explodes distinct grams map-side — the only data-sized exchange is the final per-doc count.',
 'ts_pii_scrub': 'PII scrub: three chained regexp_replace + regexp_extract_all counts, all inside one codegen Project over the scan — no shuffle, no Python stage.',
 'ts_repetition_filter': 'Repetition filter: token 3-grams, distinct count and dup fraction are all higher-order functions in one Project; the plan is scan -> project -> sort (output order only).',
 'prof_sketch_accuracy': 'Sketch accuracy: exact count-distinct (two-phase expand) and HLL++ partials share one scan and one exchange; the bound check is a scalar projection over 5 aggregate rows.',
 'emb_feature_hash_topk': 'Feature-hash search with ZERO Python: md5/conv bucket expressions fold into the scan stage, the persisted (id, bucket, weight) postings feed norms AND the broadcast query-weight join, and integer dots make the cosine bit-exact across engines.',
 'sim_sparse_cosine_pairs': 'Sparse all-pairs cosine: posting self-join meets only on shared terms (no cross join anywhere); per-term products aggregate map-side into the single (i, j) dot exchange; norms re-enter broadcast.',
 'rel_events_scd2': 'SCD2 ranges: one hashpartitioning(user_id) exchange feeds the LEAD window; epoch-micros longs avoid timezone-sensitive hashes.',
 'prof_events_pivot': 'PIVOT with an explicit value list: no distinct-values pre-scan; one hash aggregate pair with a CASE per output column (partial counts combine map-side).',
 'ts_vocab_topk': 'Vocabulary head: token counting is partial+final HashAggregate around one token-keyed exchange; the global top-k is TakeOrderedAndProject over the aggregated vocab; rank/cumsum windows run on the 50-row slice only.',
 'pipe_stratified_take': 'Exact stratum quotas: the md5 rank key is a map-side codegen expression; ONE hashpartitioning(lang) exchange feeds the per-stratum row_number; WindowGroupLimit caps each task at n rows per stratum before the final exchange.',
 'rel_events_gapfill': 'Calendar gap-fill: per-day aggregate, bounds aggregate, grid explode, left join back, and the LOCF window all key on user_id — one partitioning reused end-to-end; grid rows = keys x span-days, independent of event volume.',
 'vq_range_search': 'Radius search: one scan + map-side similarity filter — NO data-sized shuffle at all; the only exchange sorts the (result-sized) survivor set.',
 'dd_cross_corpus_candidates': 'Cross-corpus dedup: each corpus gets its own persisted signature+banding stage; the candidate join is a plain band-key equi-join (broadcast here by AQE size choice, shuffle hash join at scale) with no id-order guard needed; shuffle carries (band key, id, signature), never text.',
 'pipe_token_windows': 'Token windows: tokenize once per row (staged filter(split)), sequence+explode the stride starts, slice+md5 per window — scan -> project -> generate, all codegen, no shuffle before the output sort.',
 'pipe_negative_samples': 'Ring negative sampling: md5 key and bucket fold into the scan projection; ONE hashpartitioning(bucket) exchange feeds all six lead() windows; the group-exclusion filter and slice run on the lead array in the same stage — no global sort, no self-join.',
 'ann_opq_topk': 'OPQ/ADC: identical plan to ann_pq_topk (the rotation lives in the trained artifacts and the driver-side query transform) — the scan reads (id, 16-byte code), ADC is a JVM lookup expression, exact re-rank joins the 50-id pool back broadcast.',
 'ts_winnow_fingerprints': 'Winnowing: ONE Arrow-vectorized stage (pandas UDF computes k-gram hashes + per-window argmin + position dedup in numpy) after the rebalance exchange; no data-sized shuffle — the output exchange sorts result rows only.',
 'dd_duplicate_clusters': 'Transitive near-dup clusters: the banded candidate join (see dd_minhash_candidates, now hot-bucket-capped: oversized band buckets exit the pairwise join as signature-group stars) feeds iterative min-label propagation — each round ONE join + ONE groupBy on the node id (localCheckpoint breaks lineage), rounds ~ graph diameter; cluster size/keep are one Window over the final labels.',
 'ann_recall_contract': 'Recall contract: SRP, PQ+rerank, IVFPQ and the exact ground truth share the persisted scan + signature/code stages; each probe is a k-row TakeOrderedAndProject; the output is a 1-row literal check, so the plan cost IS the measured tiers.',
 'rel_events_json': 'JSON extraction: get_json_object folds into the scan-stage Project (one parse per row); the only exchange is the final small aggregate.',
 'rel_top_orders_by_revenue': 'Top orders: revenue aggregate runs partial+final around ONE hashpartitioning(orderkey) exchange; the global top-N is TakeOrderedAndProject — k rows per task, never a full sort.',
 'vq_rag_prompt': 'RAG prompt assembly: the k-row top-k result drives a BroadcastHashJoin back to chunk text (late materialization); concat_ws/format_string prompt building is a Project over k rows — corpus never re-shuffles.',
 'rel_shipping_priority': 'TPC-H Q3 shape: date predicates land in PushedFilters; customer enters broadcast; lineitem JOIN orders is the one data-sized exchange; top-10 by revenue is TakeOrderedAndProject.',
 'vq_chunks_only': 'Chunks-only formatting: identical read path to vq_topk_cosine (k-heap TakeOrderedAndProject, no vector-table shuffle); the formatting Project runs on k rows.',
 'pipe_doc_hash': 'Content hash: sha2 over canonical text is a map-side Project inside the scan stage; no exchange before the output sort.',
 'rel_window_order_rank': 'Ranking window: ONE hashpartitioning(custkey) exchange feeds row_number/rank/dense_rank in a single Window operator over one sort.',
 'rel_sessions_overlap': 'Interval overlap self-join: sessions bucketize to covered hours, the self-join is a hash equi-join on (user, hour) with the exact overlap predicate as post-filter, and dedup keeps each pair once — no BroadcastNestedLoopJoin at any size.',
 'pipe_chunk_fixed': 'Fixed-size chunker: substring windows from a sequence() explode — scan -> project -> generate, all codegen; chunk ids derive map-side; no shuffle before the output sort.',
 'pipe_corpus_shuffle': 'Deterministic corpus shuffle: the md5 sort key is a scan-stage Project; the ONLY exchange is the rangepartitioning for the global order — exactly the one shuffle a reproducible shuffle requires.',
 'prof_events_sketch': 'HLL++ sketches: approx_count_distinct partials combine map-side, so the exchange carries one sketch per (group x task) — never raw values; exact twin columns share the same scan.',
 'pipe_dsir_select': 'DSIR selection: token explode + md5 bucket fold map-side; the 256-bucket LM aggregate collects to the driver (bounded by n_buckets, not data), re-enters as a literal array, and per-doc scores are ONE groupBy(doc) over the exploded stage — no cache pinned past the call (r3).',
 'vq_mmr_rerank': 'MMR diversify: the candidate pool is a k-row TakeOrderedAndProject; the greedy argmax loop runs DRIVER-side over the collected 20-row pool by design (O(k^2) on 20 rows), so the cluster plan is exactly the exact-top-k read path.',
 'pipe_chunk_normalized': 'Normalized chunks: chunker explode (codegen) followed by ONE Arrow-vectorized normalize stage — the only Python in the plan, batched, after the explode so it sees chunk-sized rows.',
 'pipe_pdf_page_chunks': 'PDF page chunks: the [[pageN]] marker split and per-page substring windows are higher-order functions in the scan-stage Project + one Generate; page metadata rides along as columns — no shuffle before the output sort.',
 'pipe_training_corpus': 'Training-corpus assembly: split CASE + quality filters fold into the scan; chunk explode and the token-budget window share ONE hashpartitioning exchange.',
 'st_user_running_totals': 'Running totals (stream twin): batch form is ONE hashpartitioning(user_id) exchange feeding the cumulative Window; the streaming form is the same expression with per-key state (streaming tests).',
 'st_clicks_attribution': 'Stream-stream attribution join (batch twin): clicks and purchases shuffle ONCE each on user_id into a hash join with the time-bound predicate as post-filter; under readStream both sides carry watermarks so the state store GCs expired rows.',
 'pipe_hash_embed_topk': 'Hash-embed + search: the embedding is ONE Arrow mapInPandas stage over rebalanced rows; the top-k is TakeOrderedAndProject — embeddings never materialize to storage and the vector table never shuffles.',
 'pipe_corpus_split': 'Split assignment: the md5-threshold CASE is a scan-stage Project; the only exchange aggregates 3 split rows (partial counts map-side).',
 'prof_corpus_quantiles': 'Quantiles: approx_percentile partials combine map-side around ONE exchange of sketch rows; the exact-percentile twin shares the scan.',
 'st_events_window': 'Tumbling windows (stream twin): window() bucketing is a map-side Project; ONE keyed exchange into partial+final aggregates — identical expression runs under readStream with a watermark (streaming tests).',
 'vq_filtered_topk': 'Filtered top-k: the metadata predicate folds into the scan (PushedFilters), so the k-heap TakeOrderedAndProject sees only surviving rows — filter-BEFORE-search semantics with zero extra pass.',
 'dd_duplicate_groups': 'Duplicate groups: canonical-fingerprint groupBy (64-bit key shuffle) with HAVING count>1; min/max/count aggregate partially map-side; text never crosses the exchange.',
 'ann_ivf_topk': 'IVF probe: centroids rank driver-side (16 rows); the cluster isin() filter prunes the scan (partition pruning on a partitioned store); exact cosine + TakeOrderedAndProject run inside the probed subset only.',
 'dq_events_constraints': 'Constraint gate: five rules compile to conditional sums in ONE partial+final aggregate pair over ONE scan; the unpivot to rule rows is a literal Expand of the single aggregate row.',
 'sim_cosine_pairs_exact': 'Exact pairwise (bounded slice): the N x M block is a broadcast matrix BLAS matmul inside mapInPandas emitting only >=threshold pairs — no join-based pair explosion in the plan.',
 'prof_events_rollup': 'ROLLUP: one Expand + one partial/final HashAggregate pair produces all grouping sets in a single scan — not one scan per level.',
 'vq_threshold_after_topk': 'Threshold AFTER top-k (reference Q5 semantics): the similarity filter sits ABOVE TakeOrderedAndProject in the plan — provably not pushed into the scan, matching the reference ordering.',
 'st_events_dedup': 'Streaming dedup twin: batch form is a row_number window per event_id keyed by ONE exchange; under readStream the same keys hit dropDuplicates state with a watermark bound.',
 'ann_srp_topk': 'SRP probe: signature bit_count(xor) Hamming filter is a codegen predicate (no vector math on pruned rows); survivors get exact cosine + TakeOrderedAndProject; the r3 pool-membership join adds one broadcast of the 100-row exact pool.',
 'ts_text_stats': 'Text stats: token/punct counts are regexp builtins in the scan-stage Project; no exchange before the output sort.',
 'mm_frame_counts': 'Frame counts: with_bytes=False (r3) keeps the plan pure codegen — explode(sequence(duration/cadence)) + one partial+final aggregate; column pruning drops the binary content from the scan (ReadSchema).',
 'dd_jaccard_pairs': 'Exact Jaccard (bounded slice): the doc_id<250 filter pushes to the scan; the pair source is a size-ratio-prefiltered crossJoin on the 250-row slice with xxhash64 shingle sets — set ops on longs, not strings.',
 'st_events_sliding': 'Sliding windows (stream twin): window() with slide explodes each event into window-count rows map-side, then one keyed aggregate exchange — same expression under readStream.',
 'ann_pca_topk': 'PCA-reduced search: the 64->32 projection is one Arrow matmul stage; the reduced-space top-k is TakeOrderedAndProject; the r3 pool-membership join verifies against the full-space exact top-100 broadcast.',
 'mm_image_pipeline': 'Image pipeline: decode -> features -> resize are chained Arrow mapInPandas stages (stdlib BMP/PNG pixels where decodable, r3); map-only — no shuffle anywhere; binary rides as an opaque column.',
 'emb_mini_encoder_topk': 'Mini-transformer embed + search: ONE mapInPandas stage runs the numpy MHA forward (per-executor encoder cache, length-sorted batches; r3: contrastively-trained checkpoint); top-k is TakeOrderedAndProject against the broadcast query vector.',
 'vq_topk_quantized': 'Quantized-store search: the scan reads the int8 vector column (4x narrower IO); dequantize + cosine are codegen expressions; k-heap TakeOrderedAndProject; late materialization joins text back broadcast.',
 'ts_lang_id': 'Language ID: the n-gram profile score is a fold over literal profile weights inside the scan-stage Project — map-only, no Python, no shuffle.',
 'vq_citations': 'Citations: the k-row result joins chunk/page metadata broadcast; page-range compaction (sort + adjacent-merge) is a higher-order-function Project over per-doc arrays built by ONE groupBy(doc).',
 'pipe_token_budget_mix': 'Token-budget mix: per-source cumulative token Window and the budget filter share ONE hashpartitioning(source) exchange; the final per-source aggregate reuses the same partitioning.',
 'ts_quality_score': 'Quality score: length/stopword/punct components are all codegen builtins in one Project; thresholding is a map-side filter — scan -> project -> sort only.',
}
out = ['# PLANS — physical-plan audit of headline queries',
 '',
 'Generated by `python tools/gen_plans.py` (sf0.01; plans are scale-independent).',
 'What to look for, per query, is in the note above each plan: pushed filters,',
 'broadcast joins, partial aggregation, top-k pushdown, and where a shuffle was',
 'deliberately avoided. Operator lines only; full `.explain("formatted")` output',
 'reproduces with the tool.', '']
for name, note in NOTES.items():
    df = QUERIES[name](spark, sf)
    plan = df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString('formatted'))
    heads = [l.rstrip() for l in plan.splitlines() if re.match(r'^\s*(\*|\+|:)?[-( ]*\(?\d+\)\s', l)]
    pf = re.findall(r'PushedFilters: \[([^\]]*)\]', plan)
    out.append(f'## {name}')
    out.append('')
    out.append(note)
    out.append('')
    out.append('```')
    out.extend(heads)
    if pf: out.append(f'PushedFilters: {pf}')
    out.append('```')
    out.append('')
open('PLANS.md','w').write('\n'.join(out))
print('wrote PLANS.md')

from .dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
    embedding_neardup_pairs,
)
from .asof import asof_join  # noqa: F401
from .bm25 import bm25_topk, bm25_topk_indexed, write_bm25_index  # noqa: F401
from .curate import curate_corpus  # noqa: F401
from .components import connected_components, dedup_clusters  # noqa: F401
from .interval import range_join  # noqa: F401
from .quantize import dequantize_expr, quantize_embeddings  # noqa: F401
from .textprep import chunk_documents, pack_chunks, scrub_pii, stratified_sample  # noqa: F401
from .similarity import (  # noqa: F401
    assign_ivf_cells,
    cosine_expr,
    knn_bruteforce,
    knn_ivf,
    knn_ivf_indexed,
    knn_lsh,
    train_ivf_centroids,
    write_ivf_index,
)
from .textstats import doc_fingerprint, language_id, quality_stats  # noqa: F401
from .pq import (  # noqa: F401
    encode_pq,
    knn_ivfpq,
    knn_ivfpq_indexed,
    knn_pq,
    train_pq_codebooks,
    write_ivfpq_index,
)
from .heavyhitters import heavy_hitters  # noqa: F401
from .skewjoin import salted_join  # noqa: F401
from .profile import profile_table  # noqa: F401
from .scd import pit_join, scd2_collapse  # noqa: F401
from .upsert import assert_unique_keys, merge_upsert  # noqa: F401
from .tablediff import table_diff  # noqa: F401
from .sketches import (  # noqa: F401
    build_distinct_sketches,
    distinct_overlap_estimate,
    rollup_distinct_estimate,
)
from .bloom import bloom_build, bloom_might_contain, bloom_probe, bloom_semi_join  # noqa: F401
from .timeseries import ewma, resample_gap_fill  # noqa: F401
from .expectations import quarantine, validate_expectations  # noqa: F401
from .cohort import cohort_retention, funnel  # noqa: F401
from .sampling import weighted_sample  # noqa: F401
from .cdc import apply_changelog  # noqa: F401
from .evolve import evolved_schema, union_evolved  # noqa: F401
from .cms import cms_build, cms_estimate, cms_join_size, cms_merge  # noqa: F401
from .zonemap import prune_files, read_zone_pruned, write_with_zonemap  # noqa: F401
from .survivorship import golden_records  # noqa: F401
from .textrank import cooccurrence_word_edges, textrank_keywords  # noqa: F401
from .binning import apply_bins, bin_expr, fit_equidepth_bins  # noqa: F401
from .sweep import concurrency, interval_intersect, max_concurrency  # noqa: F401
from .skyline import skyline  # noqa: F401
from .drift import psi_drift  # noqa: F401
from .markov import markov_transitions, stationary_distribution  # noqa: F401
from .seqmine import frequent_sequences, keyed_sequences  # noqa: F401
from .itemsets import association_rules, frequent_itemsets, keyed_baskets  # noqa: F401
from .regression import grouped_linreg  # noqa: F401
from .nbayes import nb_predict, nb_score, train_nb  # noqa: F401
from .anomaly import mad_outliers  # noqa: F401
from .encoding import target_encode_loo  # noqa: F401
from .stattests import chi2_independence, welch_ttest  # noqa: F401
from .correlation import corr_matrix, doubled_ranks, spearman_corr  # noqa: F401
from .scaling import minmax_scale, standardize, winsorize  # noqa: F401
from .benford import benford_digits  # noqa: F401
from .rankeval import roc_auc, ks_2samp  # noqa: F401
from .concentration import gini, acf  # noqa: F401
from .infotheory import mutual_information, js_divergence  # noqa: F401
from .changepoint import cusum  # noqa: F401
from .kmeans import train_kmeans, assign_kmeans  # noqa: F401
from .clustereval import silhouette_simplified, adjusted_rand_index  # noqa: F401
from .coreset import farthest_point_sample, cover_assign  # noqa: F401
from .survival import kaplan_meier, logrank_test  # noqa: F401
from .trend import mann_kendall, theil_sen  # noqa: F401
from .seasonal import seasonal_decompose  # noqa: F401
from .evalmetrics import retrieval_metrics, classification_report  # noqa: F401
from .calibration import brier_score, calibration_bins  # noqa: F401
from .evalmetrics import cohens_kappa  # noqa: F401
from .effectsize import wilson_interval, cohens_d  # noqa: F401
from .privacy import k_anonymity_audit, k_anonymity_summary  # noqa: F401
from .randproj import rp_project, jl_sign_matrix  # noqa: F401
from .dedup import containment_pairs  # noqa: F401
from .concentration import ccf  # noqa: F401
from .rankeval import weighted_quantiles, kruskal_wallis  # noqa: F401
from .textstats import readability  # noqa: F401
from .compaction import compaction_plan, compaction_summary  # noqa: F401
from .blocking import sorted_neighborhood_pairs  # noqa: F401
from .cuped import cuped_adjust  # noqa: F401
from .corpuslaws import heaps_fit, zipf_fit  # noqa: F401
from .rankeval import wasserstein_1d  # noqa: F401
from .timeseries import time_weighted_avg, ohlc_bars  # noqa: F401

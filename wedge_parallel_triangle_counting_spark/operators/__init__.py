"""Engine operators: graph preprocessing (fused one-shuffle prep +
rank relabel), five triangle-count strategies plus a deterministic
wedge-sampling estimator, iterative algorithms (PageRank/personalized
PageRank, star+HashMin components, label propagation, k-core), local
clustering/link-prediction statistics, and training-data-pipeline
operators (dedup incl. clustering, similarity, text analysis,
multimodal plumbing)."""

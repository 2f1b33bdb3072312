"""Engine operators: graph preprocessing (fused one-shuffle prep +
rank relabel), five triangle-count strategies plus a deterministic
wedge-sampling estimator, iterative algorithms (PageRank with
personalized and weighted variants, star+HashMin components, label
propagation, k-core, BFS shortest hops), local clustering /
link-prediction statistics, and training-data-pipeline operators
(dedup incl. clustering, similarity, text analysis incl. stratified
sampling and corpus stats, multimodal plumbing)."""

"""Engine operators: graph preprocessing, triangle counting, iterative
algorithms (PageRank / components / label propagation), and
training-data-pipeline operators (dedup, similarity, text analysis)."""

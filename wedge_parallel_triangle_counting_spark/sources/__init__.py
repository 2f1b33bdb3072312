"""Sources & sinks: edge-list / Matrix Market text readers, the
synthetic Common-Crawl-style pages table, bucketed edge tables
(pay-the-shuffle-once storage for co-located joins), and
result/degree-profile sinks."""

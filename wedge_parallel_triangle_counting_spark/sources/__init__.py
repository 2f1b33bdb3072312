"""Sources & sinks: edge-list / Matrix Market text readers, the
synthetic Common-Crawl-style pages table, and result/degree-profile
sinks."""

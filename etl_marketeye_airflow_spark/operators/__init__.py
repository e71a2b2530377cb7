"""DataFrame-native operators: merge, stats, anomaly, dedup, similarity,
text analysis, multimodal plumbing.  Every operator is a pure
``DataFrame -> DataFrame`` transform designed for 1000-executor scale:
no driver-side data loops, shuffles only on declared keys, broadcast
hints where a side is dimension-sized."""

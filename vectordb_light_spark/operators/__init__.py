"""Engine operators (search, chunking, dedup, citations, similarity…)."""

"""Engine operators: spatial join, kNN, zonal aggregation, windows,
dedup, similarity, text analysis — each a composition of DataFrame ops
and Arrow-batched pandas UDFs (SURVEY.md §2)."""

"""Training-data-pipeline operators (dedup, similarity search, text
analysis, windowed aggregates, multimodal plumbing) — first-class engine
components alongside the KG-construction stages, all expressed as Ray Data
batch transforms designed for the 100 TB path (broadcast small sides,
pre-aggregated shuffles, vectorized kernels)."""

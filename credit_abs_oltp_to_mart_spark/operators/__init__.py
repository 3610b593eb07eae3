"""DataFrame -> DataFrame transforms: the reference's staging + mart models
plus the large-scale training-data-pipeline extensions (dedup, ANN,
text analysis, multimodal plumbing)."""

"""Large-scale data-pipeline functions: dedup, text analysis, similarity
search, multimodal column plumbing. All JVM-side column expressions unless a
Pandas UDF is genuinely required (simhash bit-packing, embedding kernels at
high dim)."""

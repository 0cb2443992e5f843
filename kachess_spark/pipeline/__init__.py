"""Large-scale training-data pipeline operators (beyond the reference).

Deduplication, similarity search, text analysis, and multimodal column
plumbing over the ``documents`` / ``embeddings`` tables — the operators
a 100 TB LLM-data pipeline needs, designed shuffle-minimal:

* dedup candidates come from hash buckets (LSH bands), never all-pairs
* similarity search broadcasts the (small) query side
* all text metrics are single-pass, JVM-side column expressions
* binary (image/audio) payloads stay opaque; Python touches them only
  via Arrow-batched mapInPandas
"""

"""Large-scale training-data-pipeline operators.

North-star extensions beyond the reference's own surface (BASELINE.json):
deduplication, similarity search, text analysis, multimodal columns,
plus the relational/windowed building blocks they compose with.
"""

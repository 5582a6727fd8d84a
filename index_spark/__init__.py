"""index_spark — a PySpark-native inverted-index builder + BM25 query engine.

Brand-new Spark-first design with the capabilities of the reference C++
module ``SearchEngineDesign/index`` (see SURVEY.md):

- build: tokenize/normalize/Porter-stem source text via vectorized
  Arrow/pandas UDFs, aggregate per-term posting lists (sorted doc_ids,
  delta + varbyte compression, power-of-two skip pointers, block-max
  metadata), term-partitioned at rest with explicit hot-term salting.
- query: document-at-a-time top-k BM25 with block-max WAND pruning.
- dedup: MinHash/LSH near-duplicate detection with the reference's exact
  constants, plus exact / SimHash / n-gram-Jaccard / embedding-cosine
  variants for training-data pipelines.

Everything is DataFrame/SQL first; Python appears only inside Arrow-batched
pandas UDFs (never per-row).
"""

__version__ = "0.1.0"

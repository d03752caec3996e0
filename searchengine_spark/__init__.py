"""searchengine_spark — a from-scratch PySpark-native full-text retrieval engine.

Re-expresses the query and data-processing capabilities of the CMU 11-642
``QryEval`` stack (reference: Jiaqiang-Ruan/SearchEngine) as an idiomatic
Spark DataFrame pipeline:

- :mod:`searchengine_spark.analyzer` — vectorized Arrow/pandas tokenizers
  (lowercase, stopword slots, Krovetz-style stemming).
- :mod:`searchengine_spark.codec` — docID-delta + varbyte position codecs.
- :mod:`searchengine_spark.index` — inverted-index build (postings, stats,
  checkpoint-resumable manifest, skew-aware layout).
- :mod:`searchengine_spark.query` — structured-query parser + DataFrame
  compiler for ``#AND #OR #SUM #WAND #WSUM #NEAR/n #WINDOW/n #SYN`` under
  UnrankedBoolean / RankedBoolean / BM25 / Indri.
- :mod:`searchengine_spark.textops` — large-scale training-data pipeline
  operators (dedup, language id, quality scoring, fingerprinting).
- :mod:`searchengine_spark.simsearch` — embedding similarity search.

This is NOT a port of the reference's Java document-at-a-time engine; the
logical plans are declared with the DataFrame API and optimized by Catalyst.
"""

__version__ = "0.1.0"

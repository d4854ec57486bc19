"""correctocr_spark — a PySpark-native OCR-correction / main-content
extraction engine with the query and data-processing capabilities of
CopenhagenCityArchives/CorrectOCR, re-expressed Spark-first.

Layout:

- :mod:`correctocr_spark.kernels` — pure Python/NumPy kernels carrying the
  reference's exact per-document semantics (tokenize, dehyphenate,
  dictionary membership, HMM k-best beam, heuristic bins, autocorrect,
  document reassembly). Unit-testable without Spark; the same code runs
  inside the vectorized pandas UDFs.
- :mod:`correctocr_spark.spark` — the DataFrame pipeline: source tables,
  the four vectorized UDF stages, audit/checkpoint-resume, HMM training.
- :mod:`correctocr_spark.ops` — large-scale training-data-pipeline
  operators: deduplication (exact / MinHash-LSH / SimHash / n-gram
  Jaccard), similarity search over embeddings, text analysis
  (language-ID, quality scoring, token counting, fingerprinting).
"""

__version__ = "0.1.0"

"""bright_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch rebuild of the query and data-processing capabilities of
``nnstd/bright`` (a Go/Bleve full-text search server) as idiomatic Spark
dataflow: DataFrame-declared plans, Arrow-batched pandas UDFs for the
kernels Spark lacks (code-aware tokenization, posting-block codec,
block-max WAND scoring), explicit partition/shuffle design for
1000-executor / 100 TB scale.

Capability parity map (reference file:line citations -> module):

- Analysis chain (Bleve standard analyzer, store/store.go:126)
    -> bright_spark.analysis.tokenizer
- Index build (Bleve scorch segments, store/store.go:392-426)
    -> bright_spark.index.builder (+ codec, checkpoints)
- Query-string language (README.md:44-53, handlers/search.go:92-94)
    -> bright_spark.query.parser / planner
- BM25 top-k search (handlers/search.go:97-177)
    -> bright_spark.query.engine / scorer
- Request semantics: sort, pagination, projections, envelope
  (handlers/search.go:20-177) -> bright_spark.query.engine + models
- Document mutations (handlers/documents.go:67-320)
    -> bright_spark.index.mutations
- Incremental sync / resumable build (__bright_synchronization,
  ingresses/postgres/schema.go:22-60) -> bright_spark.index.checkpoints
"""

__version__ = "0.1.0"

from bright_spark.models import IndexConfig, SearchRequest, SearchResponse  # noqa: F401

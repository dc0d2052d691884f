"""elasticsearch_ray — a Ray-Data-native batch inverted-index builder and
BM25 top-k query engine with the semantics of Elasticsearch 8.3.0 / Lucene 9.1.

Built from scratch on ray.data.Dataset / pyarrow; NOT a port of the reference
(/root/reference, Java). Reference citations in docstrings are semantic
anchors only (file:line of the behavior being re-expressed).

Layout:
  analysis/   html_strip char filter, standard tokenizer, analyzer registry
  index/      norms (SmallFloat), postings codec, segment format, build, merge
  search/     BM25 similarity, query AST, block-max WAND, distributed executor
  ops/        data-processing operators: aggregations, dedup, ANN, text stats
  sources/    corpus planning / sharded parquet reads, synthetic webpage table
  pipelines/  end-to-end flagship pipelines
"""

__version__ = "0.1.0"

"""excelastic_spark — a from-scratch PySpark-native full-text index + BM25 engine.

Re-expresses the capabilities of codingchili/excelastic (reference at
/root/reference, a Vert.x ingest frontend for Elasticsearch) as an idiomatic
PySpark engine:

* ingest: spreadsheet/CSV parse semantics (type inference, header offsets,
  dry-run validation) re-expressed over Spark DataFrames
  (reference: model/ExcelParser.java, model/CSVParser.java, model/DataTypes.java)
* index: vectorized Arrow tokenization -> (term, doc_id, tf) triples ->
  delta+varint-compressed posting lists, hash-bucketed by term, salted for
  skewed high-df terms (the half the reference delegates to Elasticsearch via
  POST _bulk, model/ElasticWriter.java:28,180-184)
* query: top-k BM25 (k1=1.2, b=0.75) conjunctive/disjunctive queries with
  block-max WAND pruning, rank-identical to a pure-pandas oracle.

Everything here derives from public knowledge only: the PySpark API, the
reference repo, and published IR literature (Robertson/Sparck-Jones BM25;
Broder et al. block-max WAND, CIKM 2011 "Faster Top-k Document Retrieval
Using Block-Max Indexes" by Ding & Suel).
"""

from excelastic_spark.config import EngineConfig
from excelastic_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"

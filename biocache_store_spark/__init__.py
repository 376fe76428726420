"""biocache-store-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of AtlasOfLivingAustralia/biocache-store.

The reference (/root/reference) is a Cassandra+SOLR occurrence ETL platform;
this package re-expresses its load -> process -> sample -> index -> query
lifecycle as Spark DataFrame transformations over Parquet tables, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) the same engine must serve at 100 TB.

Layout:
  session     - tuned SparkSession builder
  io          - table readers over the driver-provided parquet test data
  queries     - the declared query surface (SURVEY.md section 2 inventory)
  parsers/    - pure-Python ports of the reference parser layer
  functions/  - Spark Column-expression libraries (geo, text, vectors, keys)
  processors/ - the 12-stage record-processing chain
  operators/  - offline analytics (dedup, outliers, facets, similarity)
  sources/    - loaders (CSV/DwC-A)
  plans/      - SOLR-mini-query -> Column translator
  exports/    - export sinks
  streaming/  - incremental / structured-streaming surface
"""

__version__ = "0.1.0"

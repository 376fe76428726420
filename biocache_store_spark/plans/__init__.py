"""Query-plan helpers: the SOLR-mini-query -> Column translator used to
replay stored queries (qid) and validation rules."""

"""Offline analytics operators: dedup, outliers, facets, similarity,
index projection — the reference's export->detect->load-back pipelines
(SURVEY.md §2.4/§2.5) re-expressed as DataFrame transformations."""

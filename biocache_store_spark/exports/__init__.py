"""Export sinks: CSV record streams, facet exports, Darwin Core Archives."""

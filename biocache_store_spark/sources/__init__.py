"""Loaders: the reference's load stage (DwC CSV, Darwin Core Archives,
in-memory batches) as DataFrame readers with key minting."""

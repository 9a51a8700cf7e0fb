"""Composed pipelines: relational demonstrations over the TPC-H-ish driver
tables and the end-to-end KG chains (see kgx.pipeline for the flagship)."""

"""Structured Streaming surface — streaming variants of the batch operators."""

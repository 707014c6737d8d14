"""Structured-Streaming duals of the batch event operators."""

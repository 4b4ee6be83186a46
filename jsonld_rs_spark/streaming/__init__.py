"""Structured Streaming ingestion for the KG pipeline."""

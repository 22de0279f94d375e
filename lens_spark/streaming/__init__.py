"""Structured Streaming layer: streaming extraction via foreachBatch and
watermarked event-window aggregation."""

"""Dataflow operators: explode/salt, dispatch+extract, HTML block scoring,
ordered reassembly, resume/lineage, search tier, dedup, similarity."""

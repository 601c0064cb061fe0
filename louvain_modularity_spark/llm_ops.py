"""Placeholder — filled in by subsequent milestones."""
QUERIES = {}
ORACLES = {}

"""Data sources: deterministic synthetic web-graph fixtures (pages/robots)."""

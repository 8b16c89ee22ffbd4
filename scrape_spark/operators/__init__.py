"""Distributed operators: seen-set, robots, politeness, frontier, dedup."""

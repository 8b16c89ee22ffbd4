"""Equivalence oracle: in-memory restatement of the reference crawler."""

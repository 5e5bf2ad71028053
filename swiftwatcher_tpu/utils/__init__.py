"""Observability and fault-tolerance utilities."""

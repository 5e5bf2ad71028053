"""Compiled window pipeline, tracking, event classification, orchestration."""

"""Structured Streaming faces of the engine's operators."""

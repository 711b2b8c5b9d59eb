"""Operator library: pure ``(DataFrame, params) -> DataFrame`` transforms."""

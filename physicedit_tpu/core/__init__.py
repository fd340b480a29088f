"""Core utilities: parameter pytrees, dtype policy."""

"""Command-line entry points (reference-compatible flag surfaces)."""

"""High-level entry points (the package's public API surface)."""

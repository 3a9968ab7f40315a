"""Cross-cutting utilities: audio I/O, scoring, checkpoint I/O, format helpers."""

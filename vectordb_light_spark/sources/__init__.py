"""Document sources: directory scan + per-format text extraction."""

"""Cross-cutting utilities: checkpointing, torch weight import, logging."""

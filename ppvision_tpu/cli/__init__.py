"""Command-line entry points (face de-id and captioning)."""

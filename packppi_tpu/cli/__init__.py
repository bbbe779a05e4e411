"""Command-line interfaces (L10)."""

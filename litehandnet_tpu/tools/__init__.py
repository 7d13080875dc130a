"""CLI entry points: train, test, demo, benchmark."""

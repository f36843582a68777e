"""Command-line entry points: train, infer, dataset tools."""

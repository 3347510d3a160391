"""Flag-compatible command-line entry points."""

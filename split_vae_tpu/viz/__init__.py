"""PNG artifact generators matching the reference's output surface."""

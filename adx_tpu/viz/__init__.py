"""Visualization / reporting layer (host-side matplotlib, CPU)."""

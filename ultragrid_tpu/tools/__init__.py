"""Standalone tools: hd-rum reflector, convert CLI, benchmark utilities."""

"""Utilities: profiling, logging, throughput accounting."""

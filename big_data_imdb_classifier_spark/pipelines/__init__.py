"""End-to-end composed pipelines (reference runner.py semantics)."""

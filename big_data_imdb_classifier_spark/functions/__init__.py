"""Scalar-function extension points (Arrow pandas_udfs and helpers)."""

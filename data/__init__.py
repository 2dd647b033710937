"""Shim package: reference-compatible `data.*` module paths."""

"""Shim package: reference-compatible `instancer.*` module paths."""

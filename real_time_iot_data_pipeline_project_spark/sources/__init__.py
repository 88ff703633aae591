"""Batch & streaming sources/sinks + the deterministic telemetry generator."""

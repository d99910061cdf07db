"""Utilities: bijectors, checkpointing, metrics, profiling, substitution models."""

from . import bijectors, checkpoint, metrics, profiling, resilience, substitution

__all__ = ["bijectors", "checkpoint", "metrics", "profiling", "resilience", "substitution"]

"""Utilities: bijectors, checkpointing, metrics, profiling, substitution models."""

from . import bijectors, checkpoint, metrics, profiling, substitution

__all__ = ["bijectors", "checkpoint", "metrics", "profiling", "substitution"]

"""Evaluation: full-graph inference and accuracy metrics."""

from .metrics import accuracy, evaluate_splits

__all__ = ["accuracy", "evaluate_splits"]

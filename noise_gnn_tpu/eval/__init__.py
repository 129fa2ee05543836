"""Evaluation: full-graph inference and accuracy metrics."""

from .inference import FullGraphInference
from .metrics import accuracy, confusion_matrix, evaluate_splits

__all__ = ["FullGraphInference", "accuracy", "confusion_matrix", "evaluate_splits"]

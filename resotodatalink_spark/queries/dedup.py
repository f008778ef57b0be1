"""Filled in by the training-data operator milestones."""

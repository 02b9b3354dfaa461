"""Inference orchestration: checkpoint conversion/loading, synthesis pipeline."""

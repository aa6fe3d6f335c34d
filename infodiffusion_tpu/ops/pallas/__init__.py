"""Pallas TPU kernels (the native tier; SURVEY.md §2.2)."""

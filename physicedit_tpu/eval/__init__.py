"""Evaluation: PICABench / KRIS-Bench sweep drivers."""

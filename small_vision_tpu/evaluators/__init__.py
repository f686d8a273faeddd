"""Evaluator framework: config-driven eval construction + the eval zoo."""

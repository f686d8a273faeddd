"""Trainer main loops."""

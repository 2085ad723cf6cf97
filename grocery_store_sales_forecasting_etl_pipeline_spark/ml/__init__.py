"""Distributed forecasting (replaces the reference's driver-side
LightGBM, gold_feature.py.py:53-67)."""

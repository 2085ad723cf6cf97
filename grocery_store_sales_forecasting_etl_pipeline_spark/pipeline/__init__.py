"""Medallion pipeline parity: bronze → silver → gold reproducing the
reference notebooks' semantics exactly (including their lossy cleaning —
SURVEY.md §2.5 note), with the driver-side ML stage replaced by
distributed forecasting (ml/forecast.py)."""

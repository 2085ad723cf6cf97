"""Similarity-search queries over the ``embeddings`` table
(training-data-pipeline extensions; populated in later milestones)."""

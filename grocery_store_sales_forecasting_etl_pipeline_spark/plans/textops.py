"""Text-analysis / dedup queries over the ``documents`` table
(training-data-pipeline extensions; populated in later milestones)."""

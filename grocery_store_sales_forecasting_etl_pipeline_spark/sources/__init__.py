"""Sources & sinks: CSV ingestion with corrupt-record quarantine,
catalog/DDL bootstrap, partitioned table writers (reference S1-S13)."""

"""Column-function library: datetime helpers, text analysis, multimodal
binary-column plumbing. All JVM built-ins (no Python UDFs) except where a
Pandas UDF is explicitly the design (multimodal decode)."""

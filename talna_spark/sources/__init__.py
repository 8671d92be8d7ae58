"""Source adapters: external tables -> the logical points model."""

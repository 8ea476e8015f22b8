"""Core DAG metadata + execution layer (no Spark dependency required)."""

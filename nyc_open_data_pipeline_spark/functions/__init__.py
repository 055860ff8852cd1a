"""Column-level function packs (JVM-side expressions; UDFs only where noted)."""

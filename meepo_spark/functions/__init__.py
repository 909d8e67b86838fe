"""Column-expression builders shared by graded queries and pipeline
operators. Everything here returns pyspark Columns (JVM-side,
whole-stage-codegen'd) — no Python UDFs."""

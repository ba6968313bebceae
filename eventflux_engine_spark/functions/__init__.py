"""Scalar/text function library (all JVM-side Catalyst expressions unless a
pandas UDF is explicitly the point)."""

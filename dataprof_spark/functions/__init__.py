"""Native Spark SQL column expressions — the JVM-side fast path for
every countable signal (whole-stage-codegen'd, no Python in the hot
loop)."""

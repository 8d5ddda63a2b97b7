"""Column-level function library (JVM-side, codegen-friendly) plus the
few Arrow-batched pandas UDFs the built-ins can't express."""

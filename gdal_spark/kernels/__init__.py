"""Pure numpy kernels (no Spark imports) — the single-node oracle and
the vectorized cores reused inside pandas UDFs."""

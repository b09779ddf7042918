"""Query plans: the declared query catalog (queries + DuckDB oracles)
that exercises every implemented operator against the driver's synthetic
tables."""

"""DataFrame-level operators: spatial join, kNN, tiling, query facade, joins, aggregates."""

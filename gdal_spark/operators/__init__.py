"""Engine operators: spatial join, kNN, tiling, rasterize, polygonize,
OGR-SQL-profile relational ops, dedup/similarity/text pipeline ops."""

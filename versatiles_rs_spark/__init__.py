"""versatiles_rs_spark — a PySpark-native tiling + spatial-join engine.

From-scratch reimplementation of the capabilities of versatiles-rs
(reference at /root/reference, cited per-module) on Spark DataFrames:
Web-Mercator tile math, bbox pyramids, Hilbert ordering, raster payload
operators, stacked/merged sources, broadcast + cell-partitioned spatial
joins (PIP, kNN), dedup/similarity/text-analysis pipeline operators, and
checkpointed, lineage-tracked sinks.
"""

__version__ = "0.1.0"

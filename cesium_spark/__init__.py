"""cesium_spark — a PySpark-native time-series rollup / downsample /
retention engine whose per-series analytics reproduce the cesium-ml/cesium
feature set (see SURVEY.md).

Layout:
  features/   numpy feature kernels + registry (the cesium math)
  kernel.py   applyInPandas featurization over (conv_id [, window]) groups
  operators/  tiered rollups, LOCF gap-fill, mergeable continuous aggs,
              dedup / similarity / text analysis for training pipelines
  codec/      Gorilla XOR + delta-of-delta compression (vectorized UDFs)
  sources/    transcript readers, table-format shim (snapshot/manifest)
  streaming/  incremental re-aggregation, checkpoint/lineage/resume
"""

__version__ = "0.1.0"

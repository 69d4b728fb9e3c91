"""asid_v2_data_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of nansencenter/ASID-v2-data-pipeline.

The reference (read-only snapshot at /root/reference/) is a single-node
NumPy/netCDF ETL + ML-feed pipeline over Arctic sea-ice scenes.  This package
re-expresses every operator in its inventory (see SURVEY.md §2) as idiomatic
Spark DataFrame transformations designed for 100 TB scale:

- rasters are long-form pixel tables ``(scene, line, sample, value)`` with
  SQL NULL as the mask,
- patch extraction / stitching are pure key arithmetic + groupBy (no data
  duplication for tumbling windows),
- the polygon-decode join is a broadcast hash join,
- the AMSR2→SAR bilinear regrid is a neighbor join + weight arithmetic,
- the one-hot ice-type encoders are native column expressions (no UDFs),
- plus the large-scale training-data operators the reference lacks:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search,
  multimodal column plumbing, and text analysis.
"""

__version__ = "0.1.0"

"""learnedspatial_spark — a PySpark-native learned spatial analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo varpande/learnedspatial (header-only C++17 learned spatial
index benchmark; see SURVEY.md). Architecture is Spark-first:

* points are DataFrames (``x`` = latitude, ``y`` = longitude, payload cols),
  derived from a Common-Crawl-style pages table (or from the driver's
  synthetic tables) by vectorized Arrow/pandas UDFs — never per-row Python;
* partitioning schemes (fixed grid, adaptive grid, k-d tree, quadtree, STR,
  Morton/H3-style quadkey) become a computed ``cell_id`` column used as the
  shuffle/partition key;
* per-cell learned models (taut-string spline over the y-CDF, mirroring the
  reference's RadixSpline-style cells) are fit and probed as batched NumPy
  kernels inside ``applyInPandas``;
* queries (range count/materialize, point lookup, distance/radius,
  point-in-polygon join, kNN, tile assignment) are planned as DataFrame
  jobs: driver-side cell pruning -> Catalyst-optimizable candidate join ->
  vectorized refine.

Reference citations in docstrings use ``file:line`` into /root/reference/.
"""

__version__ = "0.1.0"

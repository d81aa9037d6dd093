"""geomesa_spark — a PySpark-native spatial-join + tiling engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of the GeoMesa reference (``ronq/geomesa``, fork of
locationtech/geomesa; the /root/reference mount was empty at survey time —
all reference anchors are public-tree paths, see SURVEY.md §0):

- GeoMesa's Z2/Z3/XZ2 space-filling-curve key indexes → batched numpy
  quadtree cell ids computed in Arrow-vectorized pandas UDFs
  (:mod:`geomesa_spark.cells`);
- CQL spatial predicates (st_contains / st_intersects / st_dwithin …) →
  cell-cover prefilter + exact vectorized point-in-polygon refine
  (:mod:`geomesa_spark.operators.spatial_join`);
- kNN process → iterative k-ring expansion + haversine re-rank
  (:mod:`geomesa_spark.operators.knn`);
- density / raster tiling → quadkey tile-pyramid emission
  (:mod:`geomesa_spark.operators.tiling`);
- SparkSQL ``st_*`` UDF surface → :mod:`geomesa_spark.functions.st_funcs`;
- lineage/checkpoint-resume → :mod:`geomesa_spark.plans.lineage`.
"""

from . import cells  # noqa: F401

__version__ = "0.1.0"

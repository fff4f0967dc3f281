"""TiledSpatialEngine — query the MATERIALIZED index (build once, query
many: the production path at 100 TB).

``pipeline.build_tiled_index`` writes the point table partitioned by
``cell_id`` (hive-style directories; Iceberg partition keys at production)
with per-cell (y, x) sort, plus the model table and the partitioner-spec
lineage.  This engine answers queries against those artifacts with the
plan the reference's architecture implies (two-level index, SURVEY.md
§1.4) mapped onto Spark storage:

1. route driver-side: query -> candidate cell ids (the technique ``LookUp``
   of SURVEY.md §2.3, microseconds over the broadcastable spec);
2. scan ONLY those cells: ``where(cell_id isin ...)`` becomes a parquet
   PartitionFilter — Spark never opens non-candidate directories (the
   Iceberg/Hive partition-pruning analog of the reference's contiguous
   cell-range probe; asserted in tools_plan_audit.py);
3. probe in place with ``mapInPandas``: every Arrow batch comes from one
   cell's files, so the learned/binary-search refine runs WITHOUT ANY
   shuffle of point data (the in-session engine pays one cell-keyed
   shuffle to group; here the layout already is the grouping);
4. aggregate the tiny per-(query, cell) partials — the only exchange, of
   O(#queries x #cells-touched) rows.

The learned model table loads once and ships as a broadcast variable
(O(#cells x #knots) — the reference's per-cell splines, SURVEY.md §2.5).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import spline as spl
from .operators.partitioning import Partitioner


class TiledSpatialEngine:
    def __init__(self, spark: SparkSession, index_root: str):
        self.spark = spark
        self.root = index_root
        self.tiled_path = os.path.join(index_root, "points_tiled")
        manifest_path = os.path.join(index_root, "_ckpt", "fit_models.manifest.json")
        with open(manifest_path) as f:
            spec = json.load(f)["partitioner_spec"]
        self.partitioner = Partitioner.from_spec(spec)
        self._models_bc = None

    # ------------------------------------------------------------ models ---

    def _models(self):
        """Broadcast {cell_id: (knot_keys, knot_pos)} once per engine."""
        if self._models_bc is None:
            rows = self.spark.read.parquet(os.path.join(self.root, "models")).collect()
            m = {int(r["cell_id"]): (np.asarray(r["knot_keys"]), np.asarray(r["knot_pos"]))
                 for r in rows if not r["linear_scan"]}
            self._models_bc = self.spark.sparkContext.broadcast(m)
        return self._models_bc

    # ------------------------------------------------------------- scan ---

    def _pruned_scan(self, cells: list[int]) -> DataFrame:
        # isin on the partition column -> PartitionFilters in the scan node:
        # non-candidate cell directories are never listed or opened
        return (self.spark.read.parquet(self.tiled_path)
                .where(F.col("cell_id").isin([int(c) for c in cells])))

    def range_count(self, rects: list[tuple], refine: str = "learned") -> DataFrame:
        """(query_id, cnt) with 0 for empty queries — same semantics as
        SpatialEngine.range_count, shuffle-free probe."""
        cellmap: dict[int, list[int]] = {}
        for qi, (qid, fx, fy, tx, ty) in enumerate(rects):
            for c in self.partitioner.cells_for_rect(fx, fy, tx, ty):
                cellmap.setdefault(int(c), []).append(qi)
        q = np.asarray([[r[1], r[2], r[3], r[4]] for r in rects], dtype=np.float64)
        qids = np.asarray([r[0] for r in rects], dtype=np.int64)
        models_bc = self._models() if refine == "learned" else None

        def probe(it):
            for pdf in it:
                if not len(pdf):
                    continue
                # a batch belongs to one cell's files, but after split
                # coalescing a task may interleave cells: group defensively
                for cell, grp in pdf.groupby("cell_id", sort=False):
                    qidx = cellmap.get(int(cell))
                    if not qidx:
                        continue
                    ys = np.sort(grp["y"].to_numpy())
                    xs_u = grp["x"].to_numpy()
                    order = np.lexsort((xs_u, grp["y"].to_numpy()))
                    xs = xs_u[order]
                    qi = np.asarray(qidx, dtype=np.int64)
                    fx, fy, tx, ty = q[qi, 0], q[qi, 1], q[qi, 2], q[qi, 3]
                    contained = ((fx <= xs.min()) & (tx >= xs.max())
                                 & (fy <= ys.min()) & (ty >= ys.max()))
                    pre = models_bc.value.get(int(cell)) if models_bc is not None else None
                    if pre is not None and ys.shape[0] > spl.LINEAR_SCAN_THRESHOLD:
                        kk, kp = pre
                        lo = spl.learned_searchsorted(ys, kk, kp, fy, "left")
                        hi = spl.learned_searchsorted(ys, kk, kp, ty, "right")
                    else:
                        lo = np.searchsorted(ys, fy, side="left")
                        hi = np.searchsorted(ys, ty, side="right")
                    cnt = np.empty(qi.shape[0], dtype=np.int64)
                    for j in range(qi.shape[0]):
                        if contained[j]:
                            cnt[j] = ys.shape[0]
                        else:
                            s = slice(lo[j], hi[j])
                            cnt[j] = np.count_nonzero((xs[s] >= fx[j]) & (xs[s] <= tx[j]))
                    yield pd.DataFrame({"query_id": qids[qi], "cnt": cnt})

        parts = self._pruned_scan(list(cellmap)).mapInPandas(
            probe, schema="query_id bigint, cnt bigint")
        agg = parts.groupBy("query_id").agg(F.sum("cnt").alias("cnt"))
        qdf = self.spark.createDataFrame([(r[0],) for r in rects], "query_id bigint")
        return (qdf.join(agg, "query_id", "left")
                .select("query_id",
                        F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt")))

    def range_materialize(self, rects: list[tuple], refine: str = "learned") -> DataFrame:
        """(query_id, url, x, y) hit rows, shuffle-free (no aggregation at
        all: the output IS the probe output)."""
        cellmap: dict[int, list[int]] = {}
        for qi, (qid, fx, fy, tx, ty) in enumerate(rects):
            for c in self.partitioner.cells_for_rect(fx, fy, tx, ty):
                cellmap.setdefault(int(c), []).append(qi)
        q = np.asarray([[r[1], r[2], r[3], r[4]] for r in rects], dtype=np.float64)
        qids = np.asarray([r[0] for r in rects], dtype=np.int64)

        def probe(it):
            for pdf in it:
                if not len(pdf):
                    continue
                for cell, grp in pdf.groupby("cell_id", sort=False):
                    qidx = cellmap.get(int(cell))
                    if not qidx:
                        continue
                    xs = grp["x"].to_numpy()
                    ys = grp["y"].to_numpy()
                    urls = grp["url"].to_numpy()
                    for t in np.asarray(qidx, dtype=np.int64):
                        m = ((xs >= q[t, 0]) & (xs <= q[t, 2])
                             & (ys >= q[t, 1]) & (ys <= q[t, 3]))
                        if m.any():
                            yield pd.DataFrame({
                                "query_id": np.full(int(m.sum()), qids[t], dtype=np.int64),
                                "url": urls[m], "x": xs[m], "y": ys[m]})

        return self._pruned_scan(list(cellmap)).mapInPandas(
            probe, schema="query_id bigint, url string, x double, y double")

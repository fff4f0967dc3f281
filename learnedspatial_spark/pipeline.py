"""End-to-end production pipeline: pages -> points -> tiled index tables.

The north-star flow (BASELINE.json) as checkpointable phases, each a
DataFrame job whose output is a materialized table (the resume unit):

  1. extract   pages parquet/Iceberg -> points(url, x, y)     [no shuffle]
  2. key       + cell_id (+ salt)                             [1 shuffle]
               materialized partitioned by cell_id
  3. fit       model table (cell_id, knots...)                [cell-granular,
               checkpoint manifest skips completed cells on restart]
  4. stats     per-cell MBR/count table + lineage record

Run via ``spark-submit --py-files learnedspatial_spark.zip run_pipeline.py``
(see repo-root run_pipeline.py; ``python tools_make_zip.py`` builds the zip).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import extract
from .operators import spline as spl
from .operators.partitioning import (
    AdaptiveGridPartitioner,
    FixedGridPartitioner,
    KdTreePartitioner,
    MortonPartitioner,
    Partitioner,
    QuadtreePartitioner,
)
from .ops import storage
from .ops.checkpoint import CheckpointManifest, run_resumable_cells
from .ops.lineage import RunLog, cell_metrics


def build_tiled_index(
    spark: SparkSession,
    pages_path: str | None,
    out_root: str,
    scheme: str = "fixed_grid",
    partition_size: int = 1000,
    fit_batch_cells: int = 256,
    build_sample_rows: int = 250_000,
    points_df: DataFrame | None = None,
    max_cells: int = 1_000_000,
) -> dict:
    """Materialize the tiled point table + model table from a pages table
    (or any pre-derived point DataFrame with x/y + an id column via
    ``points_df``), resumable at cell granularity.  Returns a summary."""
    log = RunLog(os.path.join(out_root, "_lineage"))
    if points_df is not None:
        points = points_df
    else:
        pages = spark.read.parquet(pages_path)
        points = extract.points_from_pages(pages)
    # a stable id column for deterministic tie-breaks (url for pages, pid
    # for derived point tables) — the same resolution rule as
    # tiled._id_column: a known id name, else the single non-(x, y)
    # column; anything else raises.  First-extra-column-wins would crash
    # on an (x, y)-only frame and, worse, silently pick a NON-unique
    # column (weight, ts, ...), making the hash sample and the STR rank
    # tiebreak nondeterministic between a run and its resume.
    named = [c for c in points.columns if c in ("pid", "url", "doc_id")]
    others = [c for c in points.columns if c not in ("x", "y")]
    if len(named) == 1:
        id_col = named[0]
    elif len(others) == 1:
        id_col = others[0]
    else:
        raise ValueError(
            "cannot resolve a unique id column for deterministic "
            f"tie-breaks: columns {points.columns} (expected one of "
            "pid/url/doc_id, or exactly one non-(x, y) column)")

    # partitioner from one stats pass (closed-form schemes need only bbox +
    # count — no driver collect of data)
    agg = points.agg(F.min("x"), F.max("x"), F.count(F.lit(1))).collect()[0]
    n = int(agg[2])
    if n == 0:
        raise ValueError("empty point source: the pages/points input derived "
                         "zero (x, y) rows — nothing to index")
    xmin, xmax = float(agg[0]), float(agg[1])
    # O(#cells) guard (engine.effective_partition_size): the model/stats
    # tables and the checkpoint manifest are O(#cells) — coarsen rather
    # than build 10^8 cells at 100 TB (recorded in lineage below)
    from .engine import effective_partition_size
    partition_size = effective_partition_size(n, partition_size, max_cells)
    if scheme == "fixed_grid":
        part: Partitioner = FixedGridPartitioner.build(xmin, xmax, n, partition_size)
        assigned = points.withColumn("cell_id", F.expr(part.assign_sql("x")))
    elif scheme == "morton":
        level = max(1, min(12, int(math.ceil(math.log2(max(2.0, n / partition_size)) / 2))))
        part = MortonPartitioner(level=level)
        assigned = points.withColumn("cell_id", F.expr(part.assign_sql("x", "y")))
    elif scheme == "str":
        # Sort-Tile-Recursive as two chained rankings (pure JVM), paid ONCE
        # at build; probes never re-rank (they read cell_id).  The global
        # rank uses the bucketed two-phase plan (operators/ranking.py) so
        # there is no single-task sort even at full corpus scale.
        from .operators.partitioning import STRPartitioner
        from .operators.ranking import str_cell_ids
        slice_cap, leaf = STRPartitioner.plan(n, partition_size)
        part = STRPartitioner(n=n, leaf=leaf, slice_cap=slice_cap, mbrs=[])
        cells_per_slice = math.ceil(slice_cap / leaf)
        assigned = str_cell_ids(points, id_col, slice_cap, leaf, cells_per_slice)
    elif scheme in ("adaptive_grid", "kd_tree", "quadtree"):
        # tree/equi-depth schemes at production scale: splitter from a
        # BOUNDED deterministic sample (SURVEY.md §7.3(d)) — a hash-mod
        # filter keeps the collect O(build_sample_rows) regardless of
        # corpus size; per-leaf budget shrinks by the sampling ratio so the
        # full-scale cell occupancy still targets partition_size.  Cell
        # boundaries differ from an exact build; query RESULTS never do
        # (routing + refine stay exact for any partitioning).
        # ceil division (engine.py twin): floor would give k=1 for n in
        # (budget, 2*budget) and "sample" the whole corpus to the driver
        k = max(1, -(-n // max(1, build_sample_rows)))
        samp = (points.where(F.pmod(F.xxhash64(id_col), F.lit(k)) == 0)
                .select("x", "y").collect())
        xs = np.asarray([r["x"] for r in samp])
        ys = np.asarray([r["y"] for r in samp])
        leaf = max(1, partition_size // k)
        if scheme == "adaptive_grid":
            part = AdaptiveGridPartitioner.build_from_sorted_x(np.sort(xs), leaf)
        elif scheme == "kd_tree":
            part = KdTreePartitioner.build_from_points(xs, ys, leaf)
        else:
            part = QuadtreePartitioner.build_from_points(xs, ys, leaf)
        spec = part.to_spec()
        out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                               for f in points.schema.fields) + ", cell_id bigint"

        def route(it):
            p = Partitioner.from_spec(spec)
            for pdf in it:
                pdf = pdf.copy()
                pdf["cell_id"] = p.assign_np(pdf["x"].to_numpy(), pdf["y"].to_numpy())
                yield pdf

        assigned = points.mapInPandas(route, schema=out_schema)
    else:
        raise ValueError(f"unknown scheme {scheme}")

    # phase 2: tiled table, partitioned by cell_id (idempotent overwrite).
    # Its own spec-keyed manifest makes the WRITE a resume unit too: a
    # build that crashed during phase-3 model fitting must not re-shuffle
    # and re-write the whole corpus (the single most expensive job here)
    # before the fit manifest can skip completed cells.  A changed
    # partitioner spec resets BOTH manifests (reset_on_mismatch) and
    # rebuilds from scratch — safe because the first tile write is a
    # static partitioned overwrite (truncates the table dir) and the model
    # table writes mode=overwrite whenever done_cells is empty.
    tiled_path = os.path.join(out_root, "points_tiled")
    tile_manifest = CheckpointManifest.load_or_create(
        os.path.join(out_root, "_ckpt"), "tile_write", part.to_spec(),
        reset_on_mismatch=True)
    if not tile_manifest.meta.get("complete"):
        storage.write_partitioned(
            assigned.repartition("cell_id")
            .sortWithinPartitions("y", "x"),  # the reference's per-cell (y,x) sort
            tiled_path, "cell_id")
        tile_manifest.meta["complete"] = True
        tile_manifest.flush()

    tiled = storage.read_table(spark, tiled_path)
    cells = [r["cell_id"] for r in tiled.select("cell_id").distinct().collect()]

    # phase 3: model fit, cell-granular resume
    manifest = CheckpointManifest.load_or_create(
        os.path.join(out_root, "_ckpt"), "fit_models", part.to_spec(),
        reset_on_mismatch=True)
    model_path = os.path.join(out_root, "models")

    def fit_batch(batch_cells: list[int]) -> None:
        sub = tiled.where(F.col("cell_id").isin([int(c) for c in batch_cells]))

        def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
            ys = np.sort(pdf["y"].to_numpy())
            m = spl.fit_cell_model(ys)
            return pd.DataFrame([{"cell_id": int(key[0]), "n": m["n"],
                                  "linear_scan": m["linear_scan"],
                                  "knot_keys": m["knot_keys"], "knot_pos": m["knot_pos"],
                                  "avg_err": m["avg_err"], "max_err": m["max_err"]}])

        batch_df = sub.groupBy("cell_id").applyInPandas(
            fit, schema=("cell_id bigint, n bigint, linear_scan boolean, "
                         "knot_keys array<double>, knot_pos array<double>, "
                         "avg_err double, max_err double"))
        storage.write_table(batch_df, model_path,
                            mode="overwrite" if not manifest.done_cells else "append")

    fitted = run_resumable_cells(manifest, cells, fit_batch, batch_size=fit_batch_cells)

    # phase 4: stats + lineage
    stats_path = os.path.join(out_root, "cell_stats")
    storage.write_table(cell_metrics(tiled), stats_path)
    if scheme == "str":
        # STR routes by per-cell MBRs (rank-based assignment has no closed
        # form): fill the spec from the stats table and refresh the manifest
        # so TiledSpatialEngine prunes real candidate cells, not [].
        srows = sorted(storage.read_table(spark, stats_path).collect(), key=lambda r: r["cell_id"])
        part.mbrs = [[int(r["cell_id"]), float(r["minx"]), float(r["miny"]),
                      float(r["maxx"]), float(r["maxy"])] for r in srows]
        manifest.partitioner_spec = part.to_spec()
        manifest.flush()
    run_id = log.record_run(
        "build_tiled_index", part.to_spec(),
        inputs={"pages": pages_path or "<points_df>", "rows": n},
        extra={"cells": len(cells), "fitted_this_run": fitted, "scheme": scheme,
               "partition_size_effective": partition_size})
    return {"run_id": run_id, "rows": n, "cells": len(cells), "fitted": fitted,
            "tiled_path": tiled_path, "model_path": model_path}

"""Cell-granular resumable checkpoints (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

The unit of resume is one cell (Spark partition key): a long job — model
fitting, tile materialization, a large query batch — writes per-cell
outputs under ``<root>/data/cell_id=<id>/`` plus a manifest entry when the
cell completes.  A restarted run reads the manifest and processes only
missing cells.  The partitioner spec itself is part of the manifest
(lineage: the splitter that produced the assignment is reproducible).

The reference's analog is its idempotent ``.sorted_x``/``.radians``
file caches (src/main.cpp:580-598, 610-626) — rebuilt only when absent.

Implementation keeps JSON manifests (atomic rename) so it works on any
filesystem; at production scale the same protocol maps onto Iceberg
snapshot/commit semantics with partition-level overwrite.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field


def _spec_core(spec):
    """Spec identity for resume-lineage comparison: derived routing payload
    (STR per-cell ``mbrs``, filled after the stats phase) is not part of the
    splitter's identity — a resumed build re-presents the pre-stats spec."""
    if isinstance(spec, dict):
        return {k: v for k, v in spec.items() if k != "mbrs"}
    return spec


@dataclass
class CheckpointManifest:
    root: str
    job: str
    partitioner_spec: dict | None = None
    done_cells: set = field(default_factory=set)
    meta: dict = field(default_factory=dict)

    @property
    def path(self) -> str:
        return os.path.join(self.root, f"{self.job}.manifest.json")

    @staticmethod
    def load_or_create(root: str, job: str, partitioner_spec: dict | None = None,
                       reset_on_mismatch: bool = False) -> "CheckpointManifest":
        """Load the manifest, or create a fresh one.  A stored spec that
        differs from ``partitioner_spec`` is a lineage mismatch: by default
        refuse to resume (raise) — resuming a half-done job under a
        different splitter would silently mix assignments.  With
        ``reset_on_mismatch=True`` the stale manifest is discarded and a
        FRESH one returned instead, for callers whose outputs are rebuilt
        whole-table on the first write (build_tiled_index: static
        partitioned overwrite + overwrite-when-no-done-cells model table),
        so a legitimately changed spec rebuilds from scratch rather than
        wedging the out_root."""
        m = CheckpointManifest(root=root, job=job, partitioner_spec=partitioner_spec)
        os.makedirs(root, exist_ok=True)
        if os.path.exists(m.path):
            with open(m.path) as f:
                d = json.load(f)
            if (partitioner_spec is not None and d.get("partitioner_spec") is not None
                    and _spec_core(d["partitioner_spec"]) != _spec_core(partitioner_spec)):
                if reset_on_mismatch:
                    os.remove(m.path)
                    return m  # fresh manifest: no done cells, no meta
                raise ValueError(
                    "checkpoint manifest was produced by a different partitioner "
                    "spec; refusing to resume (lineage mismatch)")
            m.partitioner_spec = d.get("partitioner_spec", partitioner_spec)
            m.done_cells = set(d.get("done_cells", []))
            m.meta = d.get("meta", {})
        return m

    def pending(self, all_cells) -> list[int]:
        return [int(c) for c in all_cells if int(c) not in self.done_cells]

    def mark_done(self, cells, flush: bool = True) -> None:
        self.done_cells.update(int(c) for c in cells)
        if flush:
            self.flush()

    def flush(self) -> None:
        """Atomic write (tmp + rename) so a kill mid-flush never corrupts."""
        d = {
            "job": self.job,
            "partitioner_spec": self.partitioner_spec,
            "done_cells": sorted(self.done_cells),
            "meta": self.meta,
            "updated_at": time.time(),
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(d, f)
        os.replace(tmp, self.path)


def run_resumable_cells(manifest: CheckpointManifest, all_cells, process_batch, batch_size: int = 64) -> int:
    """Drive a cell-granular job to completion: process pending cells in
    batches, flushing the manifest after each batch.  ``process_batch``
    receives a list of cell ids and must be idempotent per cell (e.g. an
    overwrite of ``cell_id=<id>`` output partitions).  Returns #cells
    processed this run."""
    pending = manifest.pending(all_cells)
    done = 0
    for i in range(0, len(pending), batch_size):
        batch = pending[i:i + batch_size]
        process_batch(batch)
        manifest.mark_done(batch)
        done += len(batch)
    return done

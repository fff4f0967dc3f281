"""tools_kernel_scaling plumbing: identical total work at both levels
(kernel checksums must match across process counts — the efficiency is
meaningless otherwise), witnesses recorded per run, JSON shape stable.

Tiny sizes only — this pins the harness, not the timing (the measured
saturation result lives in BENCH/, gathered on a quiet-witnessed host).
"""

import tools_kernel_scaling as tks


def test_kernel_levels_do_identical_work():
    lo = tks.run_level("kernel", 1, n_cells=6, queries_per_cell=4,
                       rounds=2, stream_total_gb=0, stream_resident_gb=0)
    hi = tks.run_level("kernel", 3, n_cells=6, queries_per_cell=4,
                       rounds=2, stream_total_gb=0, stream_resident_gb=0)
    assert lo["checksum"] == hi["checksum"] > 0
    assert lo["wall_s"] > 0 and hi["wall_s"] > 0
    assert lo["pagetouch_open"] > 0 and hi["pagetouch_close"] > 0


def test_streaming_level_reports_aggregate_bandwidth():
    r = tks.run_level("streaming", 2, n_cells=0, queries_per_cell=0,
                      rounds=1, stream_total_gb=0.2, stream_resident_gb=0.1)
    assert r["aggregate_gbs"] > 0 and r["procs"] == 2

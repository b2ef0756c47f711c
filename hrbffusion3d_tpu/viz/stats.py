"""Per-frame run statistics — the GUI live-plot / stdout-trace analogue.

The reference plots ICP residual + inlier count live (GUI/src/
HRBF_fusion.cpp:284-296) and dumps per-frame timing maps to
``sequence_processing_time.txt`` (HRBFFusion.cpp:172-187).  Headless
equivalent: a JSONL stream of per-frame scalars that any plotting tool
can tail, plus the Stopwatch dump (utils/timing.py).
"""

from __future__ import annotations

import json

import numpy as np


class StatsLogger:
    """Append one JSON line of scalars per frame."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.rows: list[dict] = []
        self._f = open(path, "w") if path else None

    def log_state(self, frame: int, state, extra: dict | None = None):
        row = {
            "frame": int(frame),
            "icp_error": float(np.asarray(state.last_icp_error)),
            "icp_count": int(np.asarray(state.last_icp_count)),
            "dense_frac": float(np.asarray(state.dense_frac)),
            "surfels": int(np.asarray(state.map.count)),
            "t": [float(x) for x in np.asarray(state.t)],
        }
        if extra:
            row.update(extra)
        self.rows.append(row)
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()
        return row

    def close(self):
        if self._f:
            self._f.close()
            self._f = None

"""Per-stage timing instrumentation.

Replaces the reference's ``Stopwatch`` singleton + TICK/TOCK macros
(``Core/src/Utils/Stopwatch.h:68-84``, per-frame maps dumped to
``sequence_processing_time.txt`` in ``~HRBFFusion``, HRBFFusion.cpp:172-187).
The UDP broadcast to Stopviz is replaced by plain aggregation; device work
is synchronised before stopping so timings are honest.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class Stopwatch:
    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.samples[name].append(time.perf_counter() - t0)

    def tick(self, name: str):
        self._t0 = (name, time.perf_counter())

    def tock(self, name: str):
        n, t0 = self._t0
        assert n == name, f"mismatched tick/tock: {n} vs {name}"
        self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "mean_ms": float(a.mean() * 1000),
                "min_ms": float(a.min() * 1000),
                "max_ms": float(a.max() * 1000),
                "count": len(xs),
            }
        return out

    def dump(self, path: str):
        """sequence_processing_time.txt-style dump."""
        with open(path, "w") as f:
            for name, stats in self.summary().items():
                f.write(f"{name} mean={stats['mean_ms']:.3f}ms "
                        f"min={stats['min_ms']:.3f}ms "
                        f"max={stats['max_ms']:.3f}ms n={stats['count']}\n")

    def broadcast(self, host: str = "127.0.0.1", port: int = 45454,
                  signature: int = 0):
        """UDP telemetry packet — the reference Stopwatch streams its timing
        map to the external Stopviz tool every TOCK (Stopwatch.h:136-144,
        signature at HRBFFusion.cpp:63).  Same wire idea, modern encoding:
        one JSON datagram {signature, {name: last_ms}} per call; fires and
        forgets (no listener required)."""
        import socket

        last = {n: xs[-1] * 1000.0 for n, xs in self.samples.items() if xs}
        payload = __import__("json").dumps(
            {"signature": signature, "timings_ms": last}).encode()
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.sendto(payload, (host, port))
        except OSError:
            pass  # telemetry must never take the pipeline down
        finally:
            s.close()


GLOBAL = Stopwatch()

"""PLY export/import of the surfel map.

Replaces ``HRBFFusion::savePly`` (HRBFFusion.cpp:1737-1853): binary
little-endian PLY with position, color, normal, radius, principal
curvatures and submap index per surfel, filtered by a confidence
threshold."""

from __future__ import annotations

import struct

import numpy as np

from ..map.surfel_map import SurfelMap

_PROPS = [
    ("x", "float"), ("y", "float"), ("z", "float"),
    ("red", "uchar"), ("green", "uchar"), ("blue", "uchar"),
    ("nx", "float"), ("ny", "float"), ("nz", "float"),
    ("radius", "float"),
    ("curvature_k1", "float"), ("curvature_k2", "float"),
    ("confidence", "float"),
    ("submap", "int"),
]


def save_ply(path: str, m: SurfelMap, conf_threshold: float = 0.0):
    n = int(m.count)
    pos = np.asarray(m.pos[:n])
    conf = np.asarray(m.conf[:n])
    keep = conf >= conf_threshold
    pos = pos[keep]
    col = (np.clip(np.asarray(m.color[:n])[keep], 0, 1) * 255).astype(np.uint8)
    nrm = np.asarray(m.normal[:n])[keep]
    rad = np.asarray(m.radius[:n])[keep]
    k1 = np.asarray(m.k1[:n])[keep]
    k2 = np.asarray(m.k2[:n])[keep]
    cf = conf[keep]
    sub = np.asarray(m.submap[:n])[keep]

    count = pos.shape[0]
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0",
               f"element vertex {count}"]
        hdr += [f"property {t} {name}" for name, t in _PROPS]
        hdr += ["end_header", ""]
        f.write("\n".join(hdr).encode())
        rec = struct.Struct("<fff BBB fff f ff f i")
        for i in range(count):
            f.write(rec.pack(
                pos[i, 0], pos[i, 1], pos[i, 2],
                col[i, 0], col[i, 1], col[i, 2],
                nrm[i, 0], nrm[i, 1], nrm[i, 2],
                rad[i], k1[i], k2[i], cf[i], int(sub[i]),
            ))
    return count


def load_ply_positions(path: str) -> np.ndarray:
    """Minimal reader for round-tripping our own exports (positions only)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        count = next(int(l.split()[-1]) for l in lines if l.startswith("element vertex"))
        rec = struct.Struct("<fff BBB fff f ff f i")
        out = np.zeros((count, 3), np.float32)
        for i in range(count):
            vals = rec.unpack(f.read(rec.size))
            out[i] = vals[:3]
    return out

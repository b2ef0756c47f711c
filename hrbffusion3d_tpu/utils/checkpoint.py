"""Checkpoint / resume for the full SLAM system.

The reference has no in-flight checkpointing (SURVEY §5: offline PLY +
trajectory artifacts only; 'TPU build should add real map+trajectory+state
checkpointing as a first-class feature').  This serialises the complete
``SLAMState`` pytree (surfel map, pose, prediction maps), the sparse
backend (keyframes, landmarks, observations), and the trajectory — enough
to resume ``FullSLAM`` mid-sequence bit-exactly.
"""

from __future__ import annotations

import io
import pickle
import zlib

import numpy as np

import jax
import jax.numpy as jnp

from ..backend.keyframes import Keyframe, SparseBackend
from ..pipeline.full_slam import FullSLAM
from ..pipeline.slam import SLAMState


def _state_to_arrays(state: SLAMState) -> dict:
    flat, treedef = jax.tree.flatten(state)
    return {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}


def _arrays_to_state(arrays: dict, template: SLAMState) -> SLAMState:
    flat, treedef = jax.tree.flatten(template)
    leaves = [jnp.asarray(arrays[f"leaf_{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves)


def _pattern_fingerprint() -> int:
    """Identity of the active BRIEF test pattern.  Descriptors from
    different patterns are incompatible (Hamming distances and BoW scores
    between them are meaningless), so a checkpoint written under one
    pattern must not silently resume under another (ADVICE r3)."""
    from ..backend.features import _brief_pattern

    pat = np.asarray(_brief_pattern())
    return int(zlib.crc32(pat.tobytes()))


def save(path: str, system: FullSLAM):
    buf = io.BytesIO()
    state_arrays = _state_to_arrays(system.state)
    # active/archive split (cfg.active_capacity > 0): the archive holds
    # every inactive-submap surfel — without it a resumed run loses the
    # whole out-of-window map (ADVICE r3, medium)
    if system.archive is not None:
        state_arrays["archive_data"] = np.asarray(system.archive.data)
        state_arrays["archive_count"] = np.asarray(system.archive.count)
    np.savez_compressed(buf, **state_arrays)
    backend_blob = pickle.dumps({
        "archive_dropped": system.archive_dropped,
        "brief_pattern_crc": _pattern_fingerprint(),
        "keyframes": [
            dict(kf_id=k.kf_id, frame_time=k.frame_time, pose=k.pose,
                 kp_xy=k.kp_xy, kp_cam=k.kp_cam, desc=k.desc,
                 kp_valid=k.kp_valid, landmark_ids=k.landmark_ids,
                 kp_level=k.kp_level,
                 # the 13x13 depth-patch information matrices: without them
                 # restored keyframes silently fall back to the parametric
                 # depth covariance in BA and the resumed trajectory drifts
                 # from the uninterrupted one (the r3 bit-exactness fix)
                 kp_info=k.kp_info)
            for k in system.backend.keyframes
        ],
        "landmarks": system.backend.landmarks,
        "lm_obs": system.backend.lm_obs,
        "next_lm": system.backend._next_lm,
        "trajectory": system.trajectory,
        "timestamps": system.timestamps,
        "kf_of_frame": system.kf_of_frame,
        # keyframe-cadence counters (async path + process_batch read these)
        "last_kf_time": system._last_kf_time,
        "next_kf_id": system._next_kf_id,
        "loop_closures": system.loop_closures,
        # loop-closer dynamic state: prior loop edges feed the essential
        # graph; consistency groups carry the mnCovisibilityConsistencyTh
        # detection window across the resume point
        "loop_edges": (system.loop_closer.loop_edges
                       if system.loop_closer is not None else []),
        "consistent_groups": (system.loop_closer._consistent_groups
                              if system.loop_closer is not None else []),
    })
    with open(path, "wb") as f:
        sb = buf.getvalue()
        f.write(len(sb).to_bytes(8, "little"))
        f.write(sb)
        f.write(zlib.compress(backend_blob))


def load(path: str, system: FullSLAM) -> FullSLAM:
    """Restore into a freshly-constructed FullSLAM (same intr/cfg).  The
    system must have been bootstrapped once (any frame) so the state
    template has the right shapes — or pass one with state=None and we
    build the template lazily from the arrays."""
    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        state_blob = f.read(n)
        backend_blob = zlib.decompress(f.read())
    arrays = dict(np.load(io.BytesIO(state_blob)))
    if system.state is None:
        raise ValueError("bootstrap the system once before load() so the "
                         "SLAMState template exists")
    archive_data = arrays.pop("archive_data", None)
    archive_count = arrays.pop("archive_count", None)
    system.state = _arrays_to_state(arrays, system.state)
    # host mirrors of device counters (process_batch trusts these)
    system._time_host = int(system.state.time)
    system._submap_host = int(system.state.submap_idx)
    if archive_data is not None:
        from ..map import surfel_map as sm

        system.archive = sm.SurfelMap(data=jnp.asarray(archive_data),
                                      count=jnp.asarray(archive_count))
        system._archive_count = int(archive_count)
    else:
        system.archive = None
        system._archive_count = 0

    data = pickle.loads(backend_blob)
    system.archive_dropped = data.get("archive_dropped", 0)
    saved_crc = data.get("brief_pattern_crc")
    if saved_crc is not None and saved_crc != _pattern_fingerprint():
        import warnings

        warnings.warn(
            "checkpoint was written with a different BRIEF pattern — "
            "stored descriptors are incompatible with newly-extracted "
            "ones (Hamming/BoW matching across the resume point will be "
            "meaningless)", RuntimeWarning)
    be = system.backend
    be.keyframes = [Keyframe(**k) for k in data["keyframes"]]
    be.landmarks = data["landmarks"]
    be.lm_obs = data["lm_obs"]
    be._next_lm = data["next_lm"]
    system.trajectory = data["trajectory"]
    system.timestamps = data["timestamps"]
    system.kf_of_frame = data["kf_of_frame"]
    system._last_kf_time = data.get("last_kf_time", system._last_kf_time)
    system._next_kf_id = data.get("next_kf_id", len(be.keyframes))
    system.loop_closures = data.get("loop_closures", [])
    # rebuild the BoW database (deterministic vocabulary)
    if system.loop_closer is not None:
        from ..backend import bow as bow_mod

        system.loop_closer.db = bow_mod.BowDatabase(system.loop_closer.db.n_words)
        for kf in be.keyframes:
            system.loop_closer.db.add(
                jnp.asarray(kf.desc), jnp.asarray(kf.kp_valid))
        system.loop_closer.loop_edges = data.get("loop_edges", [])
        system.loop_closer._consistent_groups = data.get(
            "consistent_groups", [])
    return system

"""Map checkpointing: whole-map save/load with integrity checksum.

Role of the reference's Atlas serialization (``System::SaveAtlas`` ->
boost binary archive ``.osa`` + md5, orb_slam3/src/System.cc:1417-1533,
``Atlas::PreSave/PostLoad`` pointer-to-id rewiring, Atlas.cc:302/335).
The array-of-structs ``MapState`` needs no pointer rewiring — the arrays
ARE the id-based form the reference converts to — so a checkpoint is one
compressed npz plus a manifest with counters and an md5 digest.
"""

from __future__ import annotations

import hashlib
import json
import os

import jax
import numpy as np

from ..models.map_state import MapState

MAGIC = "orb_slam3_ros_tpu-map-v1"


def save_map(path: str, m: MapState, counters: dict) -> str:
    """Write ``<path>`` (npz) + ``<path>.json`` manifest. Returns md5."""
    arrays = {f: np.asarray(jax.device_get(getattr(m, f))) for f in m._fields}
    np.savez_compressed(path, **arrays)
    with open(path if path.endswith(".npz") else path + ".npz", "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    manifest = {
        "magic": MAGIC,
        "md5": digest,
        "counters": counters,
        "shapes": {k: list(v.shape) for k, v in arrays.items()},
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return digest


def load_map(path: str, verify: bool = True) -> tuple[MapState, dict]:
    """Load a checkpoint; raises on checksum mismatch (the reference
    compares the stored md5 on LoadAtlas, System.cc:1471-1533)."""
    with open(path + ".json") as f:
        manifest = json.load(f)
    if manifest.get("magic") != MAGIC:
        raise ValueError(f"not a map checkpoint: {path}")
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if verify:
        with open(npz_path, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()
        if digest != manifest["md5"]:
            raise ValueError(
                f"checkpoint checksum mismatch: {digest} != {manifest['md5']}"
            )
    data = np.load(npz_path)
    import jax.numpy as jnp

    m = MapState(**{k: jnp.asarray(data[k]) for k in MapState._fields})
    return m, manifest["counters"]


def save_system(path: str, slam) -> str:
    """Checkpoint a running pipeline (map + host counters + pose)."""
    return save_map(
        path,
        slam.map,
        {
            "n_kf": slam.n_kf,
            "n_pts": slam.n_pts,
            "frame_id": slam.frame_id,
            "state": slam.state,
            "R_cur": np.asarray(slam.R_cur).tolist(),
            "t_cur": np.asarray(slam.t_cur).tolist(),
        },
    )


def load_system(path: str, slam) -> None:
    """Restore a pipeline in place (capacities must match)."""
    m, counters = load_map(path)
    if m.kf_valid.shape[0] != slam.K_cap or m.pt_valid.shape[0] != slam.P_cap:
        raise ValueError("checkpoint capacities do not match this system")
    slam.map = m
    slam.n_kf = counters["n_kf"]
    slam.n_pts = counters["n_pts"]
    slam.frame_id = counters["frame_id"]
    slam.state = counters["state"]
    slam.R_cur = np.asarray(counters["R_cur"], np.float32)
    slam.t_cur = np.asarray(counters["t_cur"], np.float32)

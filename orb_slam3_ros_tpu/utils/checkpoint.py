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


ATLAS_MAGIC = "orb_slam3_ros_tpu-atlas-v1"


def _system_counters(slam) -> dict:
    c = {
        "n_kf": slam.n_kf,
        "n_pts": slam.n_pts,
        "frame_id": slam.frame_id,
        "state": slam.state,
        "R_cur": np.asarray(slam.R_cur).tolist(),
        "t_cur": np.asarray(slam.t_cur).tolist(),
    }
    if hasattr(slam, "kf_imu_acc"):
        c["imu"] = {
            "initialized": bool(slam.imu_initialized),
            "stage": int(slam.imu_stage),
            "chain_breaks": sorted(int(b) for b in slam.chain_breaks),
            "v_cur": np.asarray(slam.v_cur).tolist(),
            "bg_cur": np.asarray(slam.bg_cur).tolist(),
            "ba_cur": np.asarray(slam.ba_cur).tolist(),
        }
    return c


def save_atlas(path: str, slam) -> str:
    """Checkpoint the WHOLE session: active map + counters + IMU
    side-state + every archived Atlas map (with retrieval signatures and
    its own IMU blocks) + persistent loop edges — the full surface of the
    reference's ``System::SaveAtlas`` (System.cc:1417-1533), which
    serializes every map in the Atlas, not just the active one.

    One compressed npz with section-prefixed keys (``active.<field>``,
    ``arch<i>.<field>``) + a json manifest carrying counters and md5.
    """
    slam.flush()
    arrays: dict[str, np.ndarray] = {}
    for f in slam.map._fields:
        arrays[f"active.{f}"] = np.asarray(jax.device_get(getattr(slam.map, f)))
    if hasattr(slam, "kf_imu_acc"):
        arrays["active.imu_acc"] = np.asarray(slam.kf_imu_acc)
        arrays["active.imu_gyro"] = np.asarray(slam.kf_imu_gyro)
        arrays["active.imu_dts"] = np.asarray(slam.kf_imu_dts)
    manifest: dict = {
        "magic": ATLAS_MAGIC,
        "counters": _system_counters(slam),
        "archived": [],
    }
    atlas = getattr(slam, "atlas", None)
    for i, am in enumerate(atlas.maps if atlas is not None else []):
        for f in am.m._fields:
            arrays[f"arch{i}.{f}"] = np.asarray(jax.device_get(getattr(am.m, f)))
        arrays[f"arch{i}.sigs"] = np.asarray(jax.device_get(am.sigs))
        entry = {"n_kf": am.n_kf, "n_pts": am.n_pts, "imu": None}
        if am.imu is not None:
            arrays[f"arch{i}.imu_acc"] = np.asarray(am.imu["acc"])
            arrays[f"arch{i}.imu_gyro"] = np.asarray(am.imu["gyro"])
            arrays[f"arch{i}.imu_dts"] = np.asarray(am.imu["dts"])
            entry["imu"] = {
                "initialized": bool(am.imu["initialized"]),
                "stage": int(am.imu["stage"]),
                "chain_breaks": sorted(int(b) for b in am.imu["chain_breaks"]),
            }
        manifest["archived"].append(entry)
    lc = getattr(slam, "loop_closer", None)
    if lc is not None:
        arrays["loop.edge_i"] = lc._edge_i
        arrays["loop.edge_j"] = lc._edge_j
        arrays["loop.edge_R"] = lc._edge_R
        arrays["loop.edge_t"] = lc._edge_t
        arrays["loop.edge_s"] = lc._edge_s
        manifest["loop"] = {
            "n_edges": int(lc._n_edges),
            "last_closed_kf": int(lc.last_closed_kf),
        }
    vocab = getattr(slam, "vocab", None)
    if vocab is not None:
        arrays["vocab"] = np.asarray(jax.device_get(vocab))
    npz_path = path if path.endswith(".npz") else path + ".npz"
    np.savez_compressed(npz_path, **arrays)
    with open(npz_path, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    manifest["md5"] = digest
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)
    return digest


def load_atlas(path: str, slam, verify: bool = True) -> None:
    """Restore a whole-session checkpoint in place (System::LoadAtlas
    role). Capacities of ``slam`` must match the checkpoint."""
    import jax.numpy as jnp

    with open(path + ".json") as f:
        manifest = json.load(f)
    if manifest.get("magic") != ATLAS_MAGIC:
        raise ValueError(f"not an atlas checkpoint: {path}")
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if verify:
        with open(npz_path, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()
        if digest != manifest["md5"]:
            raise ValueError(
                f"checkpoint checksum mismatch: {digest} != {manifest['md5']}"
            )
    data = np.load(npz_path)
    m = MapState(
        **{k: jnp.asarray(data[f"active.{k}"]) for k in MapState._fields}
    )
    if m.kf_valid.shape[0] != slam.K_cap or m.pt_valid.shape[0] != slam.P_cap:
        raise ValueError("checkpoint capacities do not match this system")
    c = manifest["counters"]
    slam.map = m
    slam.n_kf = c["n_kf"]
    slam.n_pts = c["n_pts"]
    slam.frame_id = c["frame_id"]
    slam.state = c["state"]
    slam.R_cur = np.asarray(c["R_cur"], np.float32)
    slam.t_cur = np.asarray(c["t_cur"], np.float32)
    slam._ref_cache = None
    if "imu" in c and hasattr(slam, "kf_imu_acc"):
        slam.kf_imu_acc = data["active.imu_acc"].copy()
        slam.kf_imu_gyro = data["active.imu_gyro"].copy()
        slam.kf_imu_dts = data["active.imu_dts"].copy()
        slam.imu_initialized = c["imu"]["initialized"]
        slam.imu_stage = c["imu"]["stage"]
        slam.chain_breaks = set(c["imu"]["chain_breaks"])
        slam.v_cur = np.asarray(c["imu"]["v_cur"], np.float32)
        slam.bg_cur = np.asarray(c["imu"]["bg_cur"], np.float32)
        slam.ba_cur = np.asarray(c["imu"]["ba_cur"], np.float32)
    if "vocab" in data:
        slam.set_vocabulary(jnp.asarray(data["vocab"], jnp.int8))
    atlas = getattr(slam, "atlas", None)
    if atlas is not None:
        from ..models.atlas import ArchivedMap

        atlas.maps = []
        for i, entry in enumerate(manifest["archived"]):
            am_m = MapState(
                **{k: jnp.asarray(data[f"arch{i}.{k}"]) for k in MapState._fields}
            )
            imu = None
            if entry["imu"] is not None:
                imu = dict(
                    acc=data[f"arch{i}.imu_acc"].copy(),
                    gyro=data[f"arch{i}.imu_gyro"].copy(),
                    dts=data[f"arch{i}.imu_dts"].copy(),
                    initialized=entry["imu"]["initialized"],
                    stage=entry["imu"]["stage"],
                    chain_breaks=set(entry["imu"]["chain_breaks"]),
                )
            atlas.maps.append(
                ArchivedMap(
                    m=am_m, n_kf=entry["n_kf"], n_pts=entry["n_pts"],
                    sigs=jnp.asarray(data[f"arch{i}.sigs"]), imu=imu,
                )
            )
    lc = getattr(slam, "loop_closer", None)
    if lc is not None and "loop" in manifest:
        lc._edge_i = data["loop.edge_i"].copy()
        lc._edge_j = data["loop.edge_j"].copy()
        lc._edge_R = data["loop.edge_R"].copy()
        lc._edge_t = data["loop.edge_t"].copy()
        lc._edge_s = data["loop.edge_s"].copy()
        # The edge store is growable (doubles when full): adopt the
        # checkpoint's capacity so _record_loop_edge stays consistent.
        lc.max_loop_edges = int(lc._edge_i.shape[0])
        lc._n_edges = manifest["loop"]["n_edges"]
        lc.last_closed_kf = manifest["loop"]["last_closed_kf"]


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

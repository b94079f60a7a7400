"""Synthetic dataset generator: a ray-traced textured room with exact
ground-truth trajectory, depth, and IMU.

The reference's integration tests are dataset replays (EuRoC/KITTI/TUM-VI
rosbags, SURVEY §4); those blobs are unavailable here, so this module
renders a procedural scene that exercises the same pipeline: textured
surfaces with trackable ORB corners, exact GT poses for ATE scoring, and
synthesizable IMU (gyro/accel from the analytic trajectory).

Scene: the inside of an axis-aligned box (room) with a distinct
high-frequency value-noise texture per wall. Images are rendered by
ray-casting each pixel to the box and bilinearly sampling the wall
texture — fully vectorized JAX, renders on-device.
"""

from __future__ import annotations

import hashlib
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie

# ---------------------------------------------------------------------------
# Sequence cache: rendering is deterministic given the arguments, and the
# test suite re-renders the same handful of sequences in every file/run
# (dominant share of the "fast" suite's latency on a 2-core host). Cache
# rendered sequences in memory per process and on disk across processes.
# Disable with ORB_TPU_SYNTH_CACHE=0; relocate with ORB_TPU_SYNTH_CACHE=<dir>.
# ---------------------------------------------------------------------------

_MEM_CACHE: dict = {}


def _cache_dir():
    v = os.environ.get("ORB_TPU_SYNTH_CACHE", "")
    if v == "0":
        return None
    if v:
        return v
    return os.path.join(
        os.path.expanduser("~"), ".cache", "orb_slam3_ros_tpu", "synth"
    )


def _cache_key(tag: str, kwargs: dict) -> str:
    items = []
    for k in sorted(kwargs):
        v = kwargs[k]
        if isinstance(v, np.ndarray):
            v = v.tolist()
        items.append(f"{k}={v!r}")
    h = hashlib.md5((tag + ";" + ";".join(items)).encode()).hexdigest()[:16]
    return f"{tag}-{h}"


def _cache_load(key: str):
    if key in _MEM_CACHE:
        return _MEM_CACHE[key]
    d = _cache_dir()
    if d is None:
        return None
    path = os.path.join(d, key + ".npz")
    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        return None


def _cache_store(key: str, arrays: dict):
    _MEM_CACHE[key] = arrays
    d = _cache_dir()
    if d is None:
        return
    try:
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, key + ".tmp.npz")
        np.savez(tmp, **arrays)
        os.replace(tmp, os.path.join(d, key + ".npz"))
    except Exception:
        pass


def _value_noise_texture(size: int, seed: int, octaves: int = 5) -> np.ndarray:
    """Multi-octave value noise in [0, 255], strong corner content."""
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), np.float32)
    amp = 1.0
    for o in range(octaves):
        n = 2 ** (o + 3)
        coarse = rng.uniform(-1, 1, size=(n, n)).astype(np.float32)
        # bilinear upsample to size
        idx = np.linspace(0, n - 1, size)
        xi = np.clip(idx.astype(int), 0, n - 2)
        fx = idx - xi
        row = coarse[:, xi] * (1 - fx) + coarse[:, np.minimum(xi + 1, n - 1)] * fx
        tex += amp * (
            row[xi, :] * (1 - fx[:, None]) + row[np.minimum(xi + 1, n - 1), :] * fx[:, None]
        )
        amp *= 0.55
    # Add salt-like blobs for distinct FAST corners.
    n_dots = size * size // 256
    ys = rng.integers(2, size - 3, n_dots)
    xs = rng.integers(2, size - 3, n_dots)
    pol = rng.choice([-1.0, 1.0], n_dots)
    for y, x, p in zip(ys, xs, pol):
        tex[y - 1 : y + 2, x - 1 : x + 2] += 2.5 * p
    tex = tex - tex.min()
    tex = tex / tex.max() * 235.0 + 10.0
    return tex.astype(np.float32)


class RoomScene(NamedTuple):
    half: jnp.ndarray  # [3] box half-extents
    textures: jnp.ndarray  # [6, S, S] one per face (+x,-x,+y,-y,+z,-z)
    tex_size: int


def make_room(seed: int = 0, half=(4.0, 3.0, 2.5), tex_size: int = 1024) -> RoomScene:
    texs = np.stack([_value_noise_texture(tex_size, seed * 7 + i) for i in range(6)])
    return RoomScene(
        half=jnp.asarray(half, jnp.float32),
        textures=jnp.asarray(texs),
        tex_size=tex_size,
    )


def _ray_box_hits(origin, dirs, half):
    """For rays inside the box, the exit distance per face and face uv.

    Returns t_face [..., 6] (inf where ray exits through another face)
    and uv in [0,1]^2 per face [..., 6, 2].
    """
    # Face normals along axes; face k=0..5 -> axis k//2, sign +- per k%2.
    ts = []
    uvs = []
    for k in range(6):
        ax = k // 2
        sgn = 1.0 if k % 2 == 0 else -1.0
        denom = dirs[..., ax]
        t = (sgn * half[ax] - origin[..., ax]) / jnp.where(
            jnp.abs(denom) < 1e-9, 1e-9, denom
        )
        t = jnp.where((t > 1e-4) & (jnp.sign(denom) == sgn), t, jnp.inf)
        p = origin + t[..., None] * dirs
        # uv from the two other axes
        a1, a2 = [a for a in range(3) if a != ax]
        u = (p[..., a1] / half[a1] + 1.0) * 0.5
        v = (p[..., a2] / half[a2] + 1.0) * 0.5
        inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        t = jnp.where(inside, t, jnp.inf)
        ts.append(t)
        uvs.append(jnp.stack([u, v], axis=-1))
    return jnp.stack(ts, axis=-1), jnp.stack(uvs, axis=-2)


def _sample_tex(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    s = tex.shape[0]
    x = jnp.clip(uv[..., 0], 0.0, 1.0) * (s - 1)
    y = jnp.clip(uv[..., 1], 0.0, 1.0) * (s - 1)
    x0 = jnp.clip(x.astype(jnp.int32), 0, s - 2)
    y0 = jnp.clip(y.astype(jnp.int32), 0, s - 2)
    fx = x - x0
    fy = y - y0
    v00 = tex[y0, x0]
    v01 = tex[y0, x0 + 1]
    v10 = tex[y0 + 1, x0]
    v11 = tex[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


@partial(jax.jit, static_argnames=("height", "width", "cam_model"))
def render(
    scene: RoomScene,
    R_wc: jnp.ndarray,
    t_wc: jnp.ndarray,
    cam_params: jnp.ndarray,
    height: int = 480,
    width: int = 752,
    cam_model: str = "pinhole",
):
    """Render the camera view (grayscale [H, W] f32 in [0,255]) and the
    depth map [H, W] (z in camera frame) for pose (R_wc, t_wc) = camera
    to world. ``cam_model="kb8"`` renders raw fisheye imagery (ray per
    pixel from the KB8 unprojection)."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    if cam_model == "kb8":
        from ..ops import cameras as _cams

        uv = jnp.stack([xg, yg], axis=-1)
        dirs_c = _cams.kb8_unproject(cam_params, uv)
    else:
        fx, fy, cx, cy = (
            cam_params[0], cam_params[1], cam_params[2], cam_params[3]
        )
        dirs_c = jnp.stack(
            [(xg - cx) / fx, (yg - cy) / fy, jnp.ones_like(xg)], axis=-1
        )
    dirs_w = jnp.einsum("ij,hwj->hwi", R_wc, dirs_c)
    origin = jnp.broadcast_to(t_wc, dirs_w.shape)
    ts, uvs = _ray_box_hits(origin, dirs_w, scene.half)
    face = jnp.argmin(ts, axis=-1)  # [H, W]
    t_hit = jnp.min(ts, axis=-1)
    uv = jnp.take_along_axis(uvs, face[..., None, None], axis=-2)[..., 0, :]
    # Sample each face texture, select.
    vals = jnp.stack(
        [_sample_tex(scene.textures[k], uv) for k in range(6)], axis=-1
    )
    img = jnp.take_along_axis(vals, face[..., None], axis=-1)[..., 0]
    # Hit point in camera frame is t_hit * dirs_c, whose z-component is
    # t_hit (dirs_c has z = 1) — so t_hit IS the camera z-depth.
    depth = t_hit
    return img, depth


def orbit_trajectory(n_frames: int, dt: float = 0.05, seed: int = 1):
    """Smooth camera trajectory inside the room: slow orbit + bobbing,
    camera looking toward a moving target. Returns (R_wc [N,3,3],
    t_wc [N,3]) as numpy, plus per-frame timestamps."""
    t = np.arange(n_frames) * dt
    # position: ellipse around center
    px = 1.8 * np.sin(0.25 * t)
    py = 1.2 * np.sin(0.17 * t + 0.8)
    pz = 0.4 * np.sin(0.33 * t)
    pos = np.stack([px, py, pz], axis=-1).astype(np.float64)
    # look-at point wanders on the +x wall
    look = np.stack(
        [np.full_like(t, 4.0), 1.5 * np.sin(0.11 * t), 0.8 * np.cos(0.13 * t)],
        axis=-1,
    )
    Rs = []
    for i in range(n_frames):
        z = look[i] - pos[i]
        z = z / np.linalg.norm(z)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rs.append(np.stack([x, y, z], axis=-1))  # columns = camera axes in world
    return np.asarray(Rs, np.float32), pos.astype(np.float32), t


def loop_trajectory(n_frames: int, dt: float = 0.1, radius: float = 1.2):
    """Closed circular trajectory: the camera orbits the room center
    looking outward and returns to its start — the loop-closure test
    case. Completes exactly one revolution over n_frames."""
    t = np.arange(n_frames) * dt
    th = 2 * np.pi * np.arange(n_frames) / (n_frames - 6)  # revisit at end
    px = radius * np.cos(th)
    py = radius * np.sin(th)
    pz = 0.15 * np.sin(2 * th)
    pos = np.stack([px, py, pz], axis=-1)
    Rs = []
    for i in range(n_frames):
        z = np.array([np.cos(th[i]), np.sin(th[i]), 0.0])  # look outward
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rs.append(np.stack([x, y, z], axis=-1))
    return np.asarray(Rs, np.float32), pos.astype(np.float32), t


def multiloop_trajectory(n_frames: int, dt: float = 0.1,
                         radius: float = 1.2, revs: int = 3):
    """Multi-revolution circular trajectory: ``revs`` full orbits of the
    room looking outward, with slow vertical/radial modulation so the
    revisits are close but not identical — the long-sequence soak case
    (every revolution re-observes the first one's views, so a loop
    closure can fire per revolution)."""
    t = np.arange(n_frames) * dt
    th = 2 * np.pi * revs * np.arange(n_frames) / (n_frames - 6)
    r = radius * (1.0 + 0.04 * np.sin(0.07 * t))
    px = r * np.cos(th)
    py = r * np.sin(th)
    pz = 0.12 * np.sin(2 * th) + 0.05 * np.sin(0.11 * t)
    pos = np.stack([px, py, pz], axis=-1)
    Rs = []
    for i in range(n_frames):
        z = np.array([np.cos(th[i]), np.sin(th[i]), 0.0])  # look outward
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rs.append(np.stack([x, y, z], axis=-1))
    return np.asarray(Rs, np.float32), pos.astype(np.float32), t


class SynthSequence(NamedTuple):
    images: np.ndarray  # [N, H, W] f32
    R_wc: np.ndarray  # [N, 3, 3]
    t_wc: np.ndarray  # [N, 3]
    timestamps: np.ndarray  # [N]
    cam_params: np.ndarray  # [9] pinhole
    depths: np.ndarray | None
    images_right: np.ndarray | None = None  # [N, H, W] rectified right
    baseline: float = 0.0


def make_sequence(
    n_frames: int = 30,
    height: int = 240,
    width: int = 376,
    dt: float = 0.1,
    seed: int = 0,
    with_depth: bool = False,
    trajectory: str = "orbit",
    stereo_baseline: float = 0.0,
) -> SynthSequence:
    """Render a full sequence (host-side convenience for tests/bench),
    memoized in memory and on disk (rendering is deterministic).

    ``stereo_baseline`` > 0 also renders a rectified right view (camera
    displaced by +baseline along the camera x-axis)."""
    kwargs = dict(
        n_frames=n_frames, height=height, width=width, dt=dt, seed=seed,
        with_depth=with_depth, trajectory=trajectory,
        stereo_baseline=stereo_baseline,
    )
    key = _cache_key("seq", kwargs)
    hit = _cache_load(key)
    if hit is not None:
        return SynthSequence(
            images=hit["images"], R_wc=hit["R_wc"], t_wc=hit["t_wc"],
            timestamps=hit["timestamps"], cam_params=hit["cam_params"],
            depths=hit.get("depths"), images_right=hit.get("images_right"),
            baseline=stereo_baseline,
        )
    seq = _make_sequence_impl(**kwargs)
    arrays = dict(
        images=seq.images, R_wc=seq.R_wc, t_wc=seq.t_wc,
        timestamps=seq.timestamps, cam_params=seq.cam_params,
    )
    if seq.depths is not None:
        arrays["depths"] = seq.depths
    if seq.images_right is not None:
        arrays["images_right"] = seq.images_right
    _cache_store(key, arrays)
    return seq


def _make_sequence_impl(
    n_frames, height, width, dt, seed, with_depth, trajectory,
    stereo_baseline,
) -> SynthSequence:
    scene = make_room(seed=seed)
    f = 0.55 * width
    cam = np.asarray(
        [f, f, (width - 1) / 2.0, (height - 1) / 2.0, 0, 0, 0, 0, 0], np.float32
    )
    if trajectory == "loop":
        R_wc, t_wc, ts = loop_trajectory(n_frames, dt=dt)
    elif trajectory.startswith("multiloop"):
        # "multiloop" = 3 revolutions; "multiloopN" = N. Angular rate
        # sets the inter-keyframe translation baseline — too slow and
        # monocular triangulation starves the sliding-window map
        # (parallax ~1% of depth at 1 deg/frame).
        revs = int(trajectory[len("multiloop"):] or 3)
        R_wc, t_wc, ts = multiloop_trajectory(n_frames, dt=dt, revs=revs)
    else:
        R_wc, t_wc, ts = orbit_trajectory(n_frames, dt=dt, seed=seed)
    imgs, deps, imgs_r = [], [], []
    for i in range(n_frames):
        img, dep = render(
            scene, jnp.asarray(R_wc[i]), jnp.asarray(t_wc[i]), jnp.asarray(cam),
            height=height, width=width,
        )
        imgs.append(np.asarray(img))
        if with_depth:
            deps.append(np.asarray(dep))
        if stereo_baseline > 0:
            t_r = t_wc[i] + R_wc[i] @ np.asarray(
                [stereo_baseline, 0, 0], np.float32
            )
            img_r, _ = render(
                scene, jnp.asarray(R_wc[i]), jnp.asarray(t_r), jnp.asarray(cam),
                height=height, width=width,
            )
            imgs_r.append(np.asarray(img_r))
    return SynthSequence(
        images=np.stack(imgs),
        R_wc=R_wc,
        t_wc=t_wc,
        timestamps=ts,
        cam_params=cam,
        depths=np.stack(deps) if with_depth else None,
        images_right=np.stack(imgs_r) if stereo_baseline > 0 else None,
        baseline=stereo_baseline,
    )


# ---------------------------------------------------------------------------
# Visual-inertial sequence: analytically differentiable trajectory so IMU
# measurements (gyro = vee(R^T dR/dt), specific force = R^T (a - g)) come
# from exact autodiff derivatives rather than finite differences.
# ---------------------------------------------------------------------------


def _vi_pose_fn(t):
    """Smooth camera/body pose (R_wb(t) [3,3], p_wb(t) [3]) inside the
    room, looking mostly at the +x wall. Deliberately dynamic (peak
    acceleration ~5 m/s^2): IMU scale/gravity observability needs
    excitation, the same reason EuRoC sequences begin with a shake."""
    px = 1.0 * jnp.sin(0.45 * t) + 0.12 * jnp.sin(2.6 * t)
    py = 0.7 * jnp.sin(0.31 * t + 0.7) + 0.10 * jnp.sin(3.1 * t + 0.4)
    pz = 0.3 * jnp.sin(0.53 * t) + 0.08 * jnp.sin(2.2 * t + 1.1)
    p = jnp.stack([px, py, pz])
    look = jnp.stack(
        [4.0 + 0.0 * t, 1.4 * jnp.sin(0.23 * t), 0.9 * jnp.cos(0.19 * t)]
    )
    z = look - p
    z = z / jnp.linalg.norm(z)
    up = jnp.asarray([0.0, 0.0, 1.0])
    x = jnp.cross(z, up)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-1)
    return R, p


def _vi_pose_loop_fn(t):
    """Smooth LOOPING body pose: a circular sweep inside the room
    looking outward, returning to the start view after ``_VI_LOOP_T``
    seconds (the visual-inertial loop-closure sequence), with enough
    high-frequency excitation for gravity/scale observability."""
    T = _VI_LOOP_T
    th = 2.0 * jnp.pi * t / T
    r = 1.0
    p = jnp.stack([
        r * jnp.cos(th) + 0.10 * jnp.sin(2.6 * t),
        r * jnp.sin(th) + 0.09 * jnp.sin(3.1 * t + 0.4),
        0.22 * jnp.sin(0.9 * t) + 0.07 * jnp.sin(2.2 * t + 1.1),
    ])
    look = jnp.stack([
        3.5 * jnp.cos(th), 3.5 * jnp.sin(th), 0.5 * jnp.sin(0.23 * t)
    ])
    z = look - p
    z = z / jnp.linalg.norm(z)
    up = jnp.asarray([0.0, 0.0, 1.0])
    x = jnp.cross(z, up)
    x = x / jnp.linalg.norm(x)
    y = jnp.cross(z, x)
    R = jnp.stack([x, y, z], axis=-1)
    return R, p


_VI_LOOP_T = 12.0  # seconds per loop revolution


def make_vi_sequence(
    n_frames: int = 40,
    height: int = 240,
    width: int = 376,
    frame_dt: float = 0.1,
    imu_per_frame: int = 10,
    seed: int = 0,
    gravity=None,
    bg=None,
    ba=None,
    noise_g: float = 0.0,
    noise_a: float = 0.0,
    stereo_baseline: float = 0.0,
    with_depth: bool = False,
    trajectory: str = "wander",
):
    """Cached wrapper around :func:`_make_vi_sequence_impl` (same
    memoization rationale as :func:`make_sequence`).

    ``trajectory``: "wander" (default, quasi-periodic excitation) or
    "loop" (circular sweep revisiting its start after ~12 s)."""
    kwargs = dict(
        n_frames=n_frames, height=height, width=width, frame_dt=frame_dt,
        imu_per_frame=imu_per_frame, seed=seed,
        gravity=None if gravity is None else np.asarray(gravity),
        bg=None if bg is None else np.asarray(bg),
        ba=None if ba is None else np.asarray(ba),
        noise_g=noise_g, noise_a=noise_a, stereo_baseline=stereo_baseline,
        with_depth=with_depth,
    )
    if trajectory != "wander":  # keep pre-existing cache keys valid
        kwargs["trajectory"] = trajectory
    key = _cache_key("viseq", kwargs)
    hit = _cache_load(key)
    if hit is not None:
        seq = SynthSequence(
            images=hit["images"], R_wc=hit["R_wc"], t_wc=hit["t_wc"],
            timestamps=hit["timestamps"], cam_params=hit["cam_params"],
            depths=hit.get("depths"), images_right=hit.get("images_right"),
            baseline=stereo_baseline,
        )
        imu = {k: hit["imu_" + k] for k in
               ("acc", "gyro", "dts", "vel", "gravity", "bg", "ba")}
        return seq, imu
    seq, imu = _make_vi_sequence_impl(**kwargs)
    arrays = dict(
        images=seq.images, R_wc=seq.R_wc, t_wc=seq.t_wc,
        timestamps=seq.timestamps, cam_params=seq.cam_params,
        **{"imu_" + k: np.asarray(v) for k, v in imu.items()},
    )
    if seq.depths is not None:
        arrays["depths"] = seq.depths
    if seq.images_right is not None:
        arrays["images_right"] = seq.images_right
    _cache_store(key, arrays)
    return seq, imu


def _make_vi_sequence_impl(
    n_frames, height, width, frame_dt, imu_per_frame, seed, gravity, bg,
    ba, noise_g, noise_a, stereo_baseline, with_depth,
    trajectory="wander",
):
    """Render frames + exact IMU for the analytic trajectory.

    Returns (SynthSequence, imu dict) where imu has per-frame sample
    blocks ``acc [N, M, 3], gyro [N, M, 3], dts [N, M]`` covering the
    interval *ending* at each frame (block i integrates frame i-1 -> i;
    block 0 is zero-padded).
    """
    from ..ops import lie  # noqa

    g = np.array([0.0, 0.0, -9.81]) if gravity is None else np.asarray(gravity)
    bg = np.zeros(3) if bg is None else np.asarray(bg)
    ba = np.zeros(3) if ba is None else np.asarray(ba)
    rng = np.random.default_rng(seed + 100)

    pose_fn = _vi_pose_loop_fn if trajectory == "loop" else _vi_pose_fn
    pose_jit = jax.jit(pose_fn)
    dR_fn = jax.jit(jax.jacfwd(lambda t: pose_fn(t)[0]))
    v_fn = jax.jit(jax.jacfwd(lambda t: pose_fn(t)[1]))
    a_fn = jax.jit(jax.jacfwd(jax.jacfwd(lambda t: pose_fn(t)[1])))

    scene = make_room(seed=seed)
    f = 0.55 * width
    cam = np.asarray(
        [f, f, (width - 1) / 2.0, (height - 1) / 2.0, 0, 0, 0, 0, 0], np.float32
    )
    ts = np.arange(n_frames) * frame_dt
    imgs, Rs, ps, imgs_r, deps = [], [], [], [], []
    for i in range(n_frames):
        R, p = pose_jit(jnp.asarray(ts[i]))
        img_i, dep_i = render(scene, R, p, jnp.asarray(cam),
                              height=height, width=width)
        imgs.append(np.asarray(img_i))
        if with_depth:
            deps.append(np.asarray(dep_i))
        Rs.append(np.asarray(R))
        ps.append(np.asarray(p))
        if stereo_baseline > 0:
            p_r = p + R @ jnp.asarray([stereo_baseline, 0.0, 0.0])
            imgs_r.append(np.asarray(render(scene, R, p_r, jnp.asarray(cam),
                                            height=height, width=width)[0]))

    dt_imu = frame_dt / imu_per_frame
    acc = np.zeros((n_frames, imu_per_frame, 3), np.float32)
    gyro = np.zeros((n_frames, imu_per_frame, 3), np.float32)
    dts = np.zeros((n_frames, imu_per_frame), np.float32)
    vel = np.zeros((n_frames, 3), np.float32)
    for i in range(n_frames):
        vel[i] = np.asarray(v_fn(jnp.asarray(ts[i])))
        if i == 0:
            continue
        for k in range(imu_per_frame):
            tk = ts[i - 1] + k * dt_imu
            R, _ = pose_jit(jnp.asarray(tk))
            dR = np.asarray(dR_fn(jnp.asarray(tk)))
            omega_hat = np.asarray(R).T @ dR
            omega = np.array(
                [omega_hat[2, 1], omega_hat[0, 2], omega_hat[1, 0]]
            )
            a_w = np.asarray(a_fn(jnp.asarray(tk)))
            gyro[i, k] = omega + bg + rng.normal(size=3) * noise_g
            acc[i, k] = np.asarray(R).T @ (a_w - g) + ba + rng.normal(size=3) * noise_a
            dts[i, k] = dt_imu
    seq = SynthSequence(
        images=np.stack(imgs), R_wc=np.stack(Rs), t_wc=np.stack(ps),
        timestamps=ts, cam_params=cam,
        depths=np.stack(deps) if with_depth else None,
        images_right=np.stack(imgs_r) if stereo_baseline > 0 else None,
        baseline=stereo_baseline,
    )
    return seq, dict(acc=acc, gyro=gyro, dts=dts, vel=vel, gravity=g, bg=bg, ba=ba)

"""Scene data model as JAX pytrees (reference: scene.cuh:9-166).

The reference holds AoS structs (Sphere/Triangle/Material/BvhNode) behind raw
device pointers in a master ``Scene`` struct broadcast through __constant__
memory. The TPU design is structure-of-arrays: every primitive attribute is a
flat, padded float32/int32 array so a batch of rays can gather against it with
XLA-friendly static shapes, and the whole scene is a pytree that `jit` treats
as ordinary operands (XLA keeps it resident in HBM across steps — the analogue
of the reference's one-time H2D upload, scene.cu:243-265).

Differentiability: `Materials` and the environment map are the differentiable
leaves (the north-star parameters). Geometry arrays are data; static counts and
render settings are hashable aux fields so each scene shape compiles once.

Triangles are stored post-BVH-build in edge form: p1, e1 = p2-p1, e2 = p3-p1,
and geometric normal normalise(cross(e2, e1)) — same convention as the
reference after its build-time conversion (scene.cu:1029-1035).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padding primitives: far enough that padded spheres
# can never be hit (negative discriminant) yet small enough that squaring it
# stays finite in float32.
PAD_COORD = 1e17


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Materials:
    """Deduplicated material table, SoA (reference: scene.cuh:42-59).

    All arrays have leading dim M (padded). These are the primary
    differentiable parameters of the framework.
    """

    diffuse_albedo: jnp.ndarray  # (M, 3)
    specular_albedo: jnp.ndarray  # (M, 3)
    emitted: jnp.ndarray  # (M, 3)
    metallicity: jnp.ndarray  # (M,)
    roughness: jnp.ndarray  # (M,)
    index_of_refraction: jnp.ndarray  # (M,)  0 == opaque


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Pinhole camera with precomputed near-plane basis
    (reference: scene.cuh:132-149, scene.cu:62-76)."""

    position: jnp.ndarray  # (3,)
    forward: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    scaled_right: jnp.ndarray  # (3,)
    scaled_up: jnp.ndarray  # (3,)
    near_plane_top_left: jnp.ndarray  # (3,)
    inv_width: jnp.ndarray  # ()
    inv_height: jnp.ndarray  # ()
    vertical_fov: float = dataclasses.field(metadata=dict(static=True), default=0.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render settings carried as pytree aux data
    (reference: the `image` DSL line + CLI flags, scene.cu:793-800)."""

    width: int = dataclasses.field(metadata=dict(static=True), default=1920)
    height: int = dataclasses.field(metadata=dict(static=True), default=1080)
    rays_per_pixel: int = dataclasses.field(metadata=dict(static=True), default=1)
    bounces: int = dataclasses.field(metadata=dict(static=True), default=3)
    exposure: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    # Max rays/pixel processed per wavefront pass; bounds live-ray memory
    # exactly like the reference's MAX_RAYS_PER_PIXEL_PER_PASS=20
    # (raytracing.cu:109).
    max_rays_per_pixel_per_pass: int = dataclasses.field(
        metadata=dict(static=True), default=20
    )
    # Reorder rays by Morton key between bounces (reference `no_sort` flag).
    sort_rays: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # Reorder only after bounces below this index: reordering pays through
    # intersection coherence, which stops mattering once most of the
    # wavefront is dead (rays sky out fast on open scenes). 0 = always.
    # Default 5 per the v5e depth scan (SCAN_r03.json: -1: 96.2 ms, 2: 93.8,
    # 3: 84.5, 4: 80.2, 5: 79.8 on the bench grad step — deeper sorting
    # kept paying once the saved-permutation residual halved its cost).
    sort_depth: int = dataclasses.field(metadata=dict(static=True), default=5)
    # Triangle intersector: "auto" (brute for small scenes, packet
    # otherwise), "brute", "packet" (ray-tile clustered — the fast path),
    # or "bvh" (lockstep stack traversal).
    intersector: str = dataclasses.field(metadata=dict(static=True), default="auto")
    # Packet intersector: rays per tile and per-tile hit-cluster capacity
    # (tile 64 + cluster_tris 256 measured best on v5e with the fused
    # kernel; the cap only bounds the XLA fallback's pair budget).
    packet_tile: int = dataclasses.field(metadata=dict(static=True), default=64)
    packet_cap: int = dataclasses.field(metadata=dict(static=True), default=64)
    # Sweep engine for the packet intersector: "auto" picks the fused Pallas
    # walk+sweep kernel on TPU and the XLA while_loop elsewhere. Explicit
    # values: "xla", "pallas", "fused", plus "*_interpret" debug variants.
    packet_backend: str = dataclasses.field(metadata=dict(static=True), default="auto")
    # Fused-kernel slab-entry early-out (BVH-style front-to-back skip of
    # pairs no slab-hitting ray can improve on, tested per ray against the
    # cull's hit bitmask; exact — ops/pallas/fused.SKIP_SLACK). Default ON:
    # measured 81.7 → 79.1 ms on the bench grad step at tile=64/C=256
    # (v5e, scripts/scan_skip.py, SCAN_r03.json); it only engages on the
    # fused resident path, and is bit-exact there by construction.
    packet_skip: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # Two-level cull: sub-AABBs per cluster block (models/cluster.split_aabbs).
    # 1 = one BVH node box per block (round-1 behaviour); S > 1 culls each
    # block against S tight chunk boxes OR-reduced — strictly fewer swept
    # pairs, identical results. Must divide cluster_tris. Default 1: every
    # split config measured slower on v5e (e.g. 87.9 → 95.1 ms at
    # tile=32/C=128 — the S× wider cull outruns its pruning; SCAN_r03.json).
    cull_split: int = dataclasses.field(metadata=dict(static=True), default=1)
    # Hierarchical cull: G > 0 groups G consecutive clusters (BVH-cut DFS
    # order, so siblings) under one tight super-AABB; a cheap first cull
    # pass over the supers gates 128-box chunks of the main cull with
    # per-tile scalar predicates (ops/pallas/cull.cull_tiles_gated), so
    # most of the (tile, K*split) slab matrix is never computed. Gating is
    # conservative (a sub-box hit implies its super hits), so entries and
    # masks are bit-equal to the flat cull. G * cull_split must divide 128.
    # 0 = flat cull (default): gating does recover cull cost where the cull
    # is wide (95.1 → 93.8 ms at tile=32/C=128/S=2 with G=16), but every
    # such wide-cull config loses to the shipped tile=64/C=256 anyway
    # (79.1 ms), where the flat cull is too cheap to gate (SCAN_r03.json).
    cull_hier: int = dataclasses.field(metadata=dict(static=True), default=0)
    # Shading engine for forward renders: "auto" uses the whole-pass Pallas
    # bounce megakernel (ops/pallas/shade.py — per-tile dead-ray skipping,
    # no per-bounce HBM round-trips) whenever megakernel_eligible says the
    # scene qualifies (brute intersector, constant sky, SMEM-sized tables);
    # "xla" forces the wavefront path (also used automatically for
    # differentiable/reparam rendering).
    shade_engine: str = dataclasses.field(
        metadata=dict(static=True), default="auto"
    )
    # Sub-clusters per block (PERF_NOTES roadmap item 0 / VERDICT r4 #1):
    # 1 = one cull box per (16, cluster_tris) block (round-4 behaviour).
    # 2 = the paired-small-cluster design: the BVH is cut at
    # cluster_tris/2-triangle sub-clusters, two consecutive sub-clusters
    # share each 128-lane block, and the cull runs at sub-cluster
    # granularity — tighter boxes, ~1.5-2x fewer effective triangle tests
    # (skip_sim C-scan) — while the MT sweep keeps full-width lane-aligned
    # blocks with unhit halves masked to MISS. Only the fused1 backend
    # understands packed tables; requires cull_split == 1.
    cluster_pack: int = dataclasses.field(metadata=dict(static=True), default=1)
    # Morton reorder engine: "argsort" = XLA bitonic argsort (total order);
    # "count" = stable matmul counting sort on the key's high origin bits
    # (ops/sort.py) — bit-identical images either way (any permutation is;
    # the unsort restores ray order). Default "auto": per-regime — count's
    # scatter-apply wins up to 2^17-row chunks (SCAN_r03: ~0.4 ms under
    # argsort on the bench grad step) and loses on 2^18-row full-res blocks
    # (SCAN_r04: teapot 10 spp 3.40 vs 2.77 s — round 3's global "count"
    # default was the full-res regression).
    sort_engine: str = dataclasses.field(metadata=dict(static=True), default="auto")
    # Reorder key: "morton" = the reference's origin/direction Morton proxy
    # (scene.cu:480-485); "cullhit" = first+second slab-hit cluster index
    # (ops/morton.first2_cluster_keys) — attacks the packet intersector's
    # tile-union cost directly (sim: 2.37x fewer swept MT tests/ray on the
    # teapot b1 wavefront, matching the full-signature upper bound) at the
    # price of one extra (R, K) slab pass per sorted bounce. MEASURED NET
    # LOSS on v5e (scan_sortkey --schedule: 49.5 ms morton vs 56.6 cullhit
    # on the bench grad shape): the XLA-side key pass costs more than the
    # tighter tiles save once live prefixes shrink bounces 2+, so the
    # default stays "morton". Images are bit-identical under any key (the
    # unsort restores ray order). "auto" resolves per intersector: cullhit
    # when the packet path is active, morton otherwise (brute/bvh paths
    # have no tile-union cost to attack).
    sort_key: str = dataclasses.field(metadata=dict(static=True), default="morton")
    # Static per-bounce live-prefix divisors (dead-ray compaction without
    # the runtime lax.switch, whose branches copy the full wavefront state
    # in and out — XLA conditional semantics). Entry b is the divisor for
    # bounce b (prefix = ceil(R / divisor) rounded up to the sort quantum;
    # bounces past the tuple reuse its last entry). The wavefront's dynamic
    # live bound is checked against each static prefix and any violation
    # is reported through the exactness certificate — render orchestration
    # then retries with the schedule off (pipeline.render_framebuffer), so
    # a stale schedule can never corrupt an image. () = dynamic lax.switch.
    # Calibrate with render/diff.calibrate_live_schedule.
    live_schedule: tuple = dataclasses.field(
        metadata=dict(static=True), default=()
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Full scene: geometry + BVH + materials + environment + camera.

    Array leading dims (S spheres, T triangles, M materials, N BVH nodes,
    H×W env map) are padded to TPU-friendly multiples; true counts live in
    static aux fields.
    """

    # Spheres (not in the BVH, by reference design — scene.cuh:118-123)
    sphere_center: jnp.ndarray  # (S, 3)
    sphere_radius: jnp.ndarray  # (S,)

    # Triangles, edge representation (post-build)
    tri_p1: jnp.ndarray  # (T, 3)
    tri_e1: jnp.ndarray  # (T, 3)  p2 - p1
    tri_e2: jnp.ndarray  # (T, 3)  p3 - p1
    tri_normal: jnp.ndarray  # (T, 3)  normalise(cross(e2, e1))

    # Per-primitive material index: spheres at [0, S), triangles at [S, S+T)
    # (reference: scene.cuh:110-116). Stored as one array indexed by the
    # shared hit-index space.
    material_index: jnp.ndarray  # (S + T,) int32

    materials: Materials

    # Flat BVH over triangles (leaf: child2 <= child1, triangles
    # [child2, child1); inner: children are node indices — scene.cuh:82-100).
    bvh_min: jnp.ndarray  # (N, 3)
    bvh_max: jnp.ndarray  # (N, 3)
    bvh_child1: jnp.ndarray  # (N,) int32
    bvh_child2: jnp.ndarray  # (N,) int32

    # Cluster cut of the BVH for dense TPU intersection (models/cluster.py):
    # K cluster AABBs + uniform triangle blocks + slot→triangle map. The
    # blocks carry one extra degenerate dummy row (index K) that the fused
    # closest-hit kernel's sentinel pairs read.
    cluster_min: jnp.ndarray  # (K * config.cull_split, 3) cull sub-boxes
    cluster_max: jnp.ndarray  # (K * config.cull_split, 3)
    cluster_blocks: jnp.ndarray  # (K + 1, 16, C)
    cluster_slot_tri: jnp.ndarray  # (K*C,) int32, -1 for padding slots

    environment_map: jnp.ndarray  # (H, W, 3) linear radiance
    camera: Camera

    # Scene bounds for Morton-key normalisation (correct-extent form; see
    # ops/morton.py on reference quirk Q5)
    min_coord: jnp.ndarray  # (3,)
    inv_extent: jnp.ndarray  # (3,)

    config: RenderConfig = dataclasses.field(metadata=dict(static=True))
    sphere_count: int = dataclasses.field(metadata=dict(static=True))
    triangle_count: int = dataclasses.field(metadata=dict(static=True))
    material_count: int = dataclasses.field(metadata=dict(static=True))
    bvh_node_count: int = dataclasses.field(metadata=dict(static=True))
    # Largest [child2, child1) leaf span — static bound for traversal's
    # leaf-intersection loop.
    max_leaf_size: int = dataclasses.field(metadata=dict(static=True))
    num_clusters: int = dataclasses.field(metadata=dict(static=True), default=1)
    cluster_tris: int = dataclasses.field(metadata=dict(static=True), default=256)

    @property
    def num_pixels(self) -> int:
        return self.config.width * self.config.height

    def replace(self, **kwargs) -> "Scene":
        return dataclasses.replace(self, **kwargs)


def round_up(n: int, multiple: int) -> int:
    return max(multiple, -(-n // multiple) * multiple)


def pad_rows(arr: np.ndarray, target: int, fill: float) -> np.ndarray:
    """Pad axis 0 of ``arr`` to ``target`` rows with ``fill``."""
    pad = target - arr.shape[0]
    if pad <= 0:
        return arr
    pad_block = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad_block], axis=0)


def make_materials(
    diffuse: np.ndarray,
    specular: np.ndarray,
    emitted: np.ndarray,
    metallicity: np.ndarray,
    roughness: np.ndarray,
    ior: np.ndarray,
    pad_to: Optional[int] = None,
) -> Materials:
    m = diffuse.shape[0]
    target = pad_to if pad_to is not None else round_up(m, 8)
    return Materials(
        diffuse_albedo=jnp.asarray(pad_rows(diffuse.astype(np.float32), target, 0.0)),
        specular_albedo=jnp.asarray(pad_rows(specular.astype(np.float32), target, 0.0)),
        emitted=jnp.asarray(pad_rows(emitted.astype(np.float32), target, 0.0)),
        metallicity=jnp.asarray(pad_rows(metallicity.astype(np.float32), target, 0.0)),
        roughness=jnp.asarray(pad_rows(roughness.astype(np.float32), target, 0.0)),
        index_of_refraction=jnp.asarray(pad_rows(ior.astype(np.float32), target, 0.0)),
    )


def precompute_camera(
    position: np.ndarray,
    forward: np.ndarray,
    up: np.ndarray,
    vertical_fov: float,
    width: int,
    height: int,
) -> Camera:
    """Near-plane basis precompute (reference: scene.cu:62-76): right-handed
    ``right = up × forward``, near plane at distance 1 with height
    2·tan(fov/2), width scaled by aspect ratio."""
    position = np.asarray(position, np.float32)
    forward = np.asarray(forward, np.float32)
    up = np.asarray(up, np.float32)
    right = np.cross(up, forward)
    near_plane_height = np.float32(2.0 * np.tan(0.5 * vertical_fov))
    near_plane_width = np.float32(near_plane_height * width / height)
    scaled_right = near_plane_width * right
    scaled_up = near_plane_height * up
    top_left = forward - 0.5 * scaled_right + 0.5 * scaled_up
    return Camera(
        position=jnp.asarray(position),
        forward=jnp.asarray(forward),
        up=jnp.asarray(up),
        scaled_right=jnp.asarray(scaled_right.astype(np.float32)),
        scaled_up=jnp.asarray(scaled_up.astype(np.float32)),
        near_plane_top_left=jnp.asarray(top_left.astype(np.float32)),
        inv_width=jnp.float32(1.0 / (width - 1)) if width > 1 else jnp.float32(1.0),
        inv_height=jnp.float32(1.0 / (height - 1)) if height > 1 else jnp.float32(1.0),
        vertical_fov=float(vertical_fov),
    )

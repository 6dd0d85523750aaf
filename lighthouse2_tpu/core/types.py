"""Host/device data contract — the SoA analog of common_classes.h.

Reference: lib/RenderSystem/common_classes.h (CoreTri/CoreMaterial/Core*Light/
ViewPyramid) and lib/RenderSystem/rendersystem.h:65-72 (RenderSettings).

Everything that crosses into jit is a registered pytree of jnp arrays with
static shapes; compile-time knobs live in the frozen `RenderConfig`
(the analog of the reference's core_settings.h compile-time defines, see
SURVEY.md §5.6).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

# Light type tags (common_classes.h:275-356 defines 4 light types)
LIGHT_TRI = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2
LIGHT_DIRECTIONAL = 3

# Path state flags (rendercore_optix7/kernels/pathtracer.h:26-33)
S_SPECULAR = 1       # previous vertex was specular (skip NEE MIS there)
S_BOUNCED = 2        # path bounced diffusely at least once
S_VIASPECULAR = 4
S_BOUNCEDTWICE = 8   # second diffuse bounce → reference kills the path


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) render configuration.

    Tier-1/2 config analog (common_settings.h + per-core core_settings.h,
    SURVEY.md §5.6). Because it is static, changing any field recompiles —
    same cost model as the reference's compile-time defines.
    """
    width: int = 512
    height: int = 512
    spp_per_pass: int = 1
    max_path_length: int = 16          # core_settings.h:25 (Optix7) / 64 (PrimeRef)
    max_diffuse_bounces: int = 1000    # optix7 caps at 2 (S_BOUNCEDTWICE); PrimeRef lifts
    russian_roulette: bool = True
    clamp_fireflies: bool = True
    consistent_normals: bool = True
    bsdf: str = "lambert"              # "lambert" | "disney" (kernels/bsdf.h:7-18)
    geometry_epsilon: float = 1e-4     # rendersystem.h:67
    clamp_value: float = 10.0          # camera.h:44
    clamp_direct: float = 15.0         # rendersystem.h:69
    clamp_indirect: float = 2.5        # rendersystem.h:70
    filter_enabled: bool = False       # SVGF (RenderCore_Optix7Filter)
    taa_enabled: bool = False
    max_is_lights: int = 8             # lights_shared.h:25 MAXISLIGHTS
    tri_chunk: int = 1024              # brute-force intersector chunk
    use_bvh: bool = True
    # "auto" = pallas cluster kernel on TPU, lockstep JAX BVH on CPU;
    # "cluster" | "lockstep" | "brute" force a specific intersector
    intersector: str = "auto"
    # BLUENOISE (rendercore_optix7/core_settings.h:24-34 ships it ON): blue-
    # noise sampler for camera dims 0-3 (spp<256), NEE dims 4/5 (spp<2),
    # BSDF dims 6/7 (spp<256). Default ON for reference parity — measured
    # cost +3.3% on the bathroom regen pass (4794 -> 4950 ms, r5 notes)
    blue_noise: bool = True
    # skydome IBL importance sampling (host_skydome.cpp:20-47 IBL define):
    # the sky joins NEE as one extra light slot with CDF-table sampling and
    # MIS-weighted implicit misses. Off by default (reference parity — the
    # reference gates it behind a compile-time define too). Only active when
    # the sky has >1 texel AND the scene built IBL tables at sync.
    sky_ibl: bool = False
    kernel_interpret: bool = False     # run pallas kernels interpreted (tests)
    # order rays in 32x32 pixel tiles so each 1024-ray kernel block is
    # spatially coherent (packet traversal); auto-disabled unless w,h % 32
    tile_order: bool = True
    # per-bounce ray binning (cluster intersector): sort BOUNCE wavefronts
    # by origin-cell + direction-morton before tracing so packet blocks stay
    # coherent at bounce>=1 and dead lanes collapse into skippable tail
    # blocks (the TPU analog of the reference's stream compaction,
    # pathtracer.h:233). Primary rays are never sorted (tile order is
    # already optimal — measured, tools/visit_histogram.py).
    ray_sort: bool = True
    # sort shadow batches too (origin-morton + octant). ON by default:
    # although per-lane unions are small (~24 on bathroom), each lane picks
    # a random light so unsorted blocks mix direction SIGNS — the scalar
    # frustum walk degenerates to visiting the whole top tree (measured
    # 1.9s of a 4.2s bathroom pass). Octant-sorted blocks restore tight
    # frustums (union ~8) for ~6ms of sort machinery per bounce
    shadow_sort: bool = True
    # scene-sharded multi-chip mode (parallel/scene_shard.py): triangles are
    # sharded over a mesh axis and per-hit shading rows arrive via psum, so
    # shading must consume payload rows directly (no global gather packs)
    scene_sharded: bool = False
    # path regeneration (persistent wavefront pool): dead lanes immediately
    # restart a fresh sample of their own pixel each bounce iteration, so the
    # dense per-bounce trace/shade work tracks ~100% occupancy instead of the
    # tail of a dying wavefront (the TPU answer to the reference's stream
    # compaction, pathtracer.h:233 — compaction shrinks the launch, regen
    # keeps the static pool full). The pool persists across passes
    # (AccumState.pool) so samples are never truncated; per-pixel sample
    # counts live in AccumState.pixel_count and finalize() divides by them.
    path_regen: bool = False
    # rematerialize each bounce in the backward pass (jax.checkpoint):
    # differentiating 16 unrolled bounces at 262k lanes stores ~165 GB of
    # residuals without it (SURVEY §7.3.6 "remat per bounce") — mandatory
    # for deep differentiable renders, off for forward-only work
    remat: bool = False
    dtype: Any = jnp.float32

    def tiled(self) -> bool:
        return (self.tile_order and self.width % 32 == 0
                and self.height % 32 == 0)

    @property
    def n_paths(self) -> int:
        return self.width * self.height * self.spp_per_pass


@struct.dataclass
class ViewPyramid:
    """Camera frustum handed to cores (common_classes.h:362-385).

    p1/p2/p3 = top-left / top-right / bottom-left of the image plane at the
    focal distance (camera.cpp:96-117). spread_angle = FOV / vertical pixels.
    """
    pos: jnp.ndarray            # [3]
    p1: jnp.ndarray             # [3]
    p2: jnp.ndarray             # [3]
    p3: jnp.ndarray             # [3]
    aperture: jnp.ndarray       # scalar
    spread_angle: jnp.ndarray   # scalar
    image_plane: jnp.ndarray    # scalar (BDPT camera pdf)
    focal_distance: jnp.ndarray # scalar
    distortion: jnp.ndarray     # scalar (barrel)


@struct.dataclass
class Rays:
    """A wavefront of rays, SoA (core_settings.h:78-86 path-state analog)."""
    origin: jnp.ndarray   # [N,3]
    dir: jnp.ndarray      # [N,3]


@struct.dataclass
class Hits:
    """Intersection results (core_settings.h:91 hitData analog)."""
    t: jnp.ndarray        # [N] — BIG_T on miss
    prim: jnp.ndarray     # [N] int32 global triangle id, -1 on miss
    inst: jnp.ndarray     # [N] int32 instance id, -1 on miss
    u: jnp.ndarray        # [N] barycentric u
    v: jnp.ndarray        # [N] barycentric v


@struct.dataclass
class CoreStats:
    """Per-frame device-side statistics (core_api_base.h:30-61 analog).

    Ray counts are jnp scalars computed on device; times are filled host-side
    by the core wrapper.
    """
    primary_rays: jnp.ndarray
    bounce1_rays: jnp.ndarray
    deep_rays: jnp.ndarray
    shadow_rays: jnp.ndarray

    @staticmethod
    def zero():
        z = jnp.zeros((), jnp.int32)
        return CoreStats(z, z, z, z)

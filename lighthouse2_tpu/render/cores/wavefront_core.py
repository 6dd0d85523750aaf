"""Built-in render cores.

  - "wavefront"  — the fast progressive path tracer (rendercore_optix7 analog)
  - "primeref"   — validation core: same algorithm, MAXPATHLENGTH 64, no
                   diffuse-bounce cap, no russian roulette, no firefly clamp
                   (RenderCore_PrimeRef analog: "REFERENCE, for image
                   validation", apps/imguiapp/main.cpp:170)
"""
from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.cores.base import RenderCore, register_core
from lighthouse2_tpu.render.wavefront import (
    AccumState, render_pass_auto, finalize,
)


@register_core("wavefront")
class WavefrontCore(RenderCore):
    def __init__(self, config: RenderConfig):
        super().__init__(config)
        self.state = None

    def on_target_changed(self):
        self.state = None

    def render(self, device_scene, view, converge: bool = True) -> dict:
        if self.state is None or not converge:
            self.state = AccumState.make(self.config)   # Convergence::Restart
        t0 = time.perf_counter()
        self.state, stats = render_pass_auto(
            device_scene, view, self.state, self.config)
        jax.block_until_ready(self.state.accumulator)
        wall = time.perf_counter() - t0
        ext = int(stats["total_extension"])
        shad = int(stats["total_shadow"])
        if self.state.pixel_count is not None:
            # regen executor: lanes complete samples asynchronously, so the
            # CoreStats spp is the per-pixel completed-sample count (mean
            # and min reported; sample_count only counts passes). In this
            # mode "primary_rays" = samples completed this pass.
            pc = np.asarray(self.state.pixel_count)
            spp_stat = {"spp": float(pc.mean()), "spp_min": float(pc.min())}
        else:
            spp_stat = {"spp": int(self.state.sample_count)}
        self.stats = {
            "render_time": wall,
            "primary_rays": int(stats["primary_rays"]),
            "extension_rays": ext,
            "shadow_rays": shad,
            "total_rays": ext + shad,
            "mrays_per_s": (ext + shad) / max(wall, 1e-9) / 1e6,
            **spp_stat,
            "extension_per_bounce": np.asarray(stats["extension_rays"]),
            "shadow_per_bounce": np.asarray(stats["shadow_rays"]),
        }
        return self.stats

    def get_image(self) -> np.ndarray:
        img = finalize(self.state)
        return np.asarray(img).reshape(self.config.height, self.config.width, 3)


@register_core("wavefront_filter")
class FilteredWavefrontCore(RenderCore):
    """1-spp real-time core with SVGF + TAA (RenderCore_Optix7Filter analog).

    Each render() traces ONE pass, splits direct/indirect, filters with
    temporal history; converge=False resets the history (camera moved)."""

    def __init__(self, config: RenderConfig):
        config = dataclasses.replace(config, filter_enabled=True)
        super().__init__(config)
        self.state = None
        self.filter_state = None
        self.taa_state = None
        self.image = None
        self.prev_view = None     # previous frame's (jittered) ViewPyramid
        self.frame_idx = 0

    def on_target_changed(self):
        self.state = self.filter_state = self.taa_state = None
        self.prev_view = None
        self.frame_idx = 0

    def render(self, device_scene, view, converge: bool = True) -> dict:
        from lighthouse2_tpu.render.filter import (
            FilterState, TAAState, svgf_filter, taa, unsharpen, jittered_view)
        import jax.numpy as jnp
        h, w = self.config.height, self.config.width
        if self.filter_state is None:
            # NOTE: converge=False (camera moved) does NOT reset history —
            # motion-vector reprojection + consistency gating handle it
            # (Optix7Filter keeps its history across camera motion too).
            self.filter_state = FilterState.make(h, w)
            self.taa_state = TAAState.make(h, w)
        if self.config.taa_enabled:
            # 4-phase Halton subpixel jitter (rendercore.cpp:734-743)
            view, _ = jittered_view(view, self.frame_idx, w, h)
        t0 = time.perf_counter()
        state = AccumState.make(self.config)   # fresh accumulator every frame
        state, stats = render_pass_auto(device_scene, view, state, self.config)
        aux = stats["filter_aux"]
        img = lambda x: jnp.asarray(x).reshape(h, w, *x.shape[1:])
        spp = max(1, self.config.spp_per_pass)
        direct = img(state.accumulator[:, :3]) / spp
        indirect = img(aux["indirect"]) / spp
        world_pos = img(aux["world_pos"])
        color, self.filter_state = svgf_filter(
            direct, indirect, img(aux["albedo"]), img(aux["normal"]),
            img(aux["depth"]), world_pos, self.filter_state,
            direct_clamp=self.config.clamp_direct,
            indirect_clamp=self.config.clamp_indirect,
            prev_view=self.prev_view)
        if self.config.taa_enabled:
            color, self.taa_state = taa(color, self.taa_state,
                                        world_pos=world_pos,
                                        prev_view=self.prev_view)
            color = unsharpen(color)
        self.prev_view = view
        self.frame_idx += 1
        self.image = np.asarray(color)
        jax.block_until_ready(color)
        wall = time.perf_counter() - t0
        ext = int(stats["total_extension"])
        shad = int(stats["total_shadow"])
        self.stats = {
            "render_time": wall,
            "primary_rays": int(stats["primary_rays"]),
            "extension_rays": ext, "shadow_rays": shad,
            "total_rays": ext + shad,
            "mrays_per_s": (ext + shad) / max(wall, 1e-9) / 1e6,
            "spp": spp,
        }
        return self.stats

    def get_image(self) -> np.ndarray:
        return self.image


@register_core("bdpt")
class BDPTCore(WavefrontCore):
    """Bidirectional path tracer (RenderCore_OptixPrime_BDPT analog,
    render/bdpt.py). Validation-grade settings: no russian roulette, no
    firefly clamp (like the reference's conservative BDPT core)."""

    def __init__(self, config: RenderConfig):
        config = dataclasses.replace(config, russian_roulette=False,
                                     clamp_fireflies=False)
        super().__init__(config)

    def render(self, device_scene, view, converge: bool = True) -> dict:
        from lighthouse2_tpu.render.bdpt import render_pass_bdpt_jit
        if self.state is None or not converge:
            self.state = AccumState.make(self.config)
        t0 = time.perf_counter()
        self.state, stats = render_pass_bdpt_jit(
            device_scene, view, self.state, self.config)
        jax.block_until_ready(self.state.accumulator)
        wall = time.perf_counter() - t0
        ext = int(stats["total_extension"])
        shad = int(stats["total_shadow"])
        self.stats = {
            "render_time": wall,
            "primary_rays": int(stats["primary_rays"]),
            "extension_rays": ext, "shadow_rays": shad,
            "total_rays": ext + shad,
            "mrays_per_s": (ext + shad) / max(wall, 1e-9) / 1e6,
            "spp": int(self.state.sample_count),
        }
        return self.stats


@register_core("primeref")
class PrimeRefCore(WavefrontCore):
    def __init__(self, config: RenderConfig):
        config = dataclasses.replace(
            config,
            max_path_length=64,            # RenderCore_PrimeRef/core_settings.h:25
            max_diffuse_bounces=1 << 30,
            russian_roulette=False,
            clamp_fireflies=False,
        )
        super().__init__(config)


@register_core("minimal")
class MinimalCore(RenderCore):
    """Teaching-stub core — the smallest valid backend
    (RenderCore_Minimal/rendercore.cpp:46-78: stores geometry, plots every
    vertex as a white dot). Pins the contract floor: consume DeviceScene +
    ViewPyramid, return an image + stats."""

    def __init__(self, config: RenderConfig):
        super().__init__(config)
        self.image = None

    @staticmethod
    def _pass(device_scene, view, config):
        import functools
        import jax.numpy as jnp
        from lighthouse2_tpu.core.geometry import dot

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def run(scene, v, cfg):
            t = scene.tris
            verts = jnp.concatenate(
                [t.v0, t.v0 + t.e1, t.v0 + t.e2], 0)       # [3T, 3]
            right = v.p2 - v.p1
            up = v.p3 - v.p1
            n = jnp.cross(right, up)
            d = verts - v.pos[None]
            denom = dot(d, n[None])
            k = dot(v.p1[None] - v.pos[None], n[None]) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1e-12)
            q = v.pos[None] + k[:, None] * d - v.p1[None]
            s = dot(q, right[None]) / jnp.maximum(dot(right, right), 1e-12)
            tt = dot(q, up[None]) / jnp.maximum(dot(up, up), 1e-12)
            ok = (k > 0) & (s >= 0) & (s < 1) & (tt >= 0) & (tt < 1)
            px = jnp.clip((s * cfg.width).astype(jnp.int32), 0,
                          cfg.width - 1)
            py = jnp.clip((tt * cfg.height).astype(jnp.int32), 0,
                          cfg.height - 1)
            idx = jnp.where(ok, py * cfg.width + px, 0)
            img = jnp.zeros((cfg.width * cfg.height,), jnp.float32)
            img = img.at[idx].max(jnp.where(ok, 1.0, 0.0))
            return jnp.repeat(img[:, None], 3, 1)

        return run(device_scene, view, config)

    def render(self, device_scene, view, converge: bool = True) -> dict:
        t0 = time.perf_counter()
        img = self._pass(device_scene, view, self.config)
        jax.block_until_ready(img)
        wall = time.perf_counter() - t0
        h, w = self.config.height, self.config.width
        self.image = np.asarray(img).reshape(h, w, 3)
        self.stats = {"render_time": wall, "primary_rays": 0,
                      "extension_rays": 0, "shadow_rays": 0, "total_rays": 0,
                      "mrays_per_s": 0.0, "spp": 1}
        return self.stats

    def get_image(self) -> np.ndarray:
        return self.image


@register_core("preview")
class PreviewCore(RenderCore):
    """Primary-ray preview core — the RenderCore_SoftRasterizer-class parity
    core (rasterizer.cpp; Render builds the camera from the ViewPyramid at
    rendercore.cpp:205-218). One cheap jit: trace primary rays only, shade
    albedo x (N.L headlight + ambient), sky on miss. Doubles as the
    interactive-preview path (BASELINE config 1) and fills the z-buffer
    analog (depth image in stats)."""

    def __init__(self, config: RenderConfig):
        config = dataclasses.replace(config, max_path_length=1)
        super().__init__(config)
        self.image = None
        self.depth = None

    @staticmethod
    def _pass(device_scene, view, config):
        import functools
        import jax.numpy as jnp
        from lighthouse2_tpu.render.wavefront import (
            generate_eye_rays, _intersect, make_shading, untile_image,
            prepare_cluster_pay)
        from lighthouse2_tpu.render.sky import sample_skydome
        from lighthouse2_tpu.core.geometry import dot

        @functools.partial(jax.jit, static_argnames=("cfg",))
        def run(scene, v, cfg):
            paths = generate_eye_rays(v, cfg, 0)
            o, d = paths["origin"], paths["dir"]
            pay = prepare_cluster_pay(scene, cfg)
            t, prim, u, uv_v, payload = _intersect(scene, o, d, cfg,
                                                   paths["alive"],
                                                   pay_tiles=pay)
            hit = prim >= 0
            ts = jnp.where(hit, t, 1.0)
            sd = make_shading(scene, d, ts, prim, u, uv_v, v.spread_angle,
                              cfg, payload=payload)
            # headlight N.L + ambient floor (the rasterizer's per-pixel
            # textured shading analog, rasterizer.cpp)
            ndl = jnp.abs(dot(sd.n_shading, -d))
            lit = sd.color * (0.25 + 0.75 * ndl)[:, None]
            emis = jnp.where(sd.emissive[:, None], sd.color, lit)
            col = jnp.where(hit[:, None], emis, sample_skydome(scene.sky, d))
            depth = jnp.where(hit, t, jnp.inf)
            wh = cfg.width * cfg.height
            spp = cfg.spp_per_pass
            col = untile_image(col.reshape(spp, wh, 3), cfg).mean(0)
            depth = untile_image(depth.reshape(spp, wh, 1), cfg).min(0)[:, 0]
            return col, depth

        return run(device_scene, view, config)

    def render(self, device_scene, view, converge: bool = True) -> dict:
        t0 = time.perf_counter()
        col, depth = self._pass(device_scene, view, self.config)
        jax.block_until_ready(col)
        wall = time.perf_counter() - t0
        h, w = self.config.height, self.config.width
        self.image = np.asarray(col).reshape(h, w, 3)
        self.depth = np.asarray(depth).reshape(h, w)
        n = self.config.n_paths
        self.stats = {
            "render_time": wall,
            "primary_rays": n,
            "extension_rays": n, "shadow_rays": 0, "total_rays": n,
            "mrays_per_s": n / max(wall, 1e-9) / 1e6,
            "spp": self.config.spp_per_pass,
        }
        return self.stats

    def get_image(self) -> np.ndarray:
        return self.image

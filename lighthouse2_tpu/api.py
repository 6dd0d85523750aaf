"""RenderAPI — the thin app-facing facade (reference: render_api.h:28-69).

Owns a HostScene + Camera + a pluggable render core, and drives the per-frame
dirty-sync → render → finalize loop (rendersystem.cpp:214-301 analog).

    api = RenderAPI.create("wavefront", width=512, height=512)
    api.scene.add_quad(...); api.scene.add_material(...)
    api.camera.look_at((0, 1, 5), (0, 1, 0))
    api.render()                 # progressive pass (Converge)
    img = api.get_ldr_image()    # tonemapped uint8-ready [H,W,3]
"""
from __future__ import annotations

import dataclasses

import numpy as np

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.camera import Camera
from lighthouse2_tpu.render.cores.base import create_core
from lighthouse2_tpu.render.tonemap import tonemap


class RenderAPI:
    def __init__(self, core, config: RenderConfig):
        self.scene = HostScene()
        self.config = config
        self.camera = Camera(pixel_count=(config.width, config.height))
        self.core = core
        self._camera_snapshot = None

    @staticmethod
    def create(core_name: str = "wavefront", config: RenderConfig | None = None,
               **config_kw) -> "RenderAPI":
        config = config or RenderConfig(**config_kw)
        return RenderAPI(create_core(core_name, config), config)

    # -- frame loop ----------------------------------------------------------

    def _camera_changed(self) -> bool:
        snap = (tuple(self.camera.position), tuple(self.camera.direction),
                self.camera.fov, self.camera.aperture,
                self.camera.focal_distance, self.camera.distortion)
        changed = snap != self._camera_snapshot
        self._camera_snapshot = snap
        return changed

    def render(self, converge: bool | None = None) -> dict:
        """SynchronizeSceneData + core Render (rendersystem.cpp:214-237).
        converge=None auto-restarts when camera or scene changed."""
        scene_dirty = self.scene.dirty
        device_scene = self.scene.sync(rebuild_bvh=self.config.use_bvh)
        cam_moved = self._camera_changed()
        if converge is None:
            converge = not (scene_dirty or cam_moved)
        self.camera.pixel_count = (self.config.width, self.config.height)
        self.camera.aspect_ratio = self.config.width / self.config.height
        view = self.camera.get_view()
        return self.core.render(device_scene, view, converge=converge)

    def get_image(self) -> np.ndarray:
        """Linear HDR [H,W,3] float32."""
        return self.core.get_image()

    def get_ldr_image(self) -> np.ndarray:
        """Tonemapped [H,W,3] float in [0,1] using the camera's tonemap params."""
        img = self.get_image()
        return np.asarray(tonemap(
            img, method=self.camera.tonemapper, gamma=self.camera.gamma,
            contrast=self.camera.contrast, brightness=self.camera.brightness))

    def device_scene(self):
        """The synced DeviceScene (for debug instrumentation)."""
        return self.scene.sync(rebuild_bvh=self.config.use_bvh)

    # -- probing (core_api_base.h:57-60 / rendersystem.cpp:249-256) ----------

    def probe(self, x: int, y: int) -> dict:
        """Pixel probe: returns prim/material/distance at pixel (x, y)."""
        from lighthouse2_tpu.render.probe import probe_pixel
        device_scene = self.scene.sync(rebuild_bvh=self.config.use_bvh)
        return probe_pixel(device_scene, self.camera.get_view(),
                           self.config, x, y)

    # -- persistence ---------------------------------------------------------

    def serialize_camera(self, path):
        self.camera.serialize(path)

    def deserialize_camera(self, path):
        try:
            self.camera = Camera.deserialize(path)
        except FileNotFoundError:
            pass

    def serialize_materials(self, path):
        """RenderAPI::SerializeMaterials analog (render_api.h / main.cpp:273)."""
        self.scene.serialize_materials(path)

    def deserialize_materials(self, path):
        """RenderAPI::DeserializeMaterials analog (main.cpp:67)."""
        try:
            return self.scene.deserialize_materials(path)
        except FileNotFoundError:
            return 0

    def set_setting(self, name: str, value):
        self.core.setting(name, value)

    def shutdown(self):
        self.core.shutdown()

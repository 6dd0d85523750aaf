"""Camera (reference: lib/RenderSystem/camera.cpp).

Produces the `ViewPyramid` consumed by render cores (camera.cpp:96-117):
spread_angle = FOV/pixel_count.y, p1/p2/p3 = top-left/top-right/bottom-left
image-plane corners at the focal distance. Includes XML-free JSON
(de)serialization — the analog of camera.cpp:154-212.
"""
from __future__ import annotations

import dataclasses
import json
import math

import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.core.types import ViewPyramid


@dataclasses.dataclass
class Camera:
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    direction: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0, 0, -1], np.float32))
    focal_distance: float = 5.0
    aperture: float = 0.0
    distortion: float = 0.0
    fov: float = 40.0            # degrees (camera.h:34)
    aspect_ratio: float = 1.0
    pixel_count: tuple = (512, 512)   # (w, h)
    # tonemap params (camera.h:40-47), used by render.tonemap
    brightness: float = 0.0
    contrast: float = 0.0
    gamma: float = 2.2
    tonemapper: int = 4          # reinhard-jodie default
    clamp_value: float = 10.0

    def __post_init__(self):
        self.position = np.asarray(self.position, np.float32)
        d = np.asarray(self.direction, np.float32)
        self.direction = d / np.linalg.norm(d)
        self.aspect_ratio = self.pixel_count[0] / self.pixel_count[1]

    def look_at(self, origin, target):
        """camera.cpp:64-69."""
        self.position = np.asarray(origin, np.float32)
        d = np.asarray(target, np.float32) - self.position
        self.direction = (d / np.linalg.norm(d)).astype(np.float32)

    def matrix(self):
        """(right, up, forward) per CalculateMatrix (camera.cpp:40-57)."""
        z = self.direction
        y = (np.array([1, 0, 0], np.float32) if abs(z[1]) > 0.99
             else np.array([0, 1, 0], np.float32))
        x = np.cross(z, y)
        x = x / np.linalg.norm(x)
        y = np.cross(x, z)
        return x, y, z

    def get_view(self) -> ViewPyramid:
        right, up, forward = self.matrix()
        spread = (self.fov * math.pi / 180.0) / self.pixel_count[1]
        screen_size = math.tan(self.fov / 2 / (180 / math.pi))
        c = self.position + self.focal_distance * forward
        sx = screen_size * self.focal_distance * self.aspect_ratio
        sy = screen_size * self.focal_distance
        p1 = c - sx * right + sy * up
        p2 = c + sx * right + sy * up
        p3 = c - sx * right - sy * up
        u1 = c - screen_size * right * self.aspect_ratio + screen_size * up
        u2 = c + screen_size * right * self.aspect_ratio + screen_size * up
        u3 = c - screen_size * right * self.aspect_ratio - screen_size * up
        image_plane = float(np.linalg.norm(u1 - u2) * np.linalg.norm(u1 - u3))
        f = jnp.float32
        v3 = lambda a: jnp.asarray(a, jnp.float32)
        return ViewPyramid(
            pos=v3(self.position), p1=v3(p1), p2=v3(p2), p3=v3(p3),
            aperture=f(self.aperture), spread_angle=f(spread),
            image_plane=f(image_plane), focal_distance=f(self.focal_distance),
            distortion=f(self.distortion),
        )

    # -- serialization (camera.cpp:154-212 analog, JSON instead of XML) ------

    def serialize(self, path):
        d = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
             for k, v in dataclasses.asdict(self).items()}
        with open(path, "w") as fh:
            json.dump(d, fh, indent=2)

    @staticmethod
    def deserialize(path) -> "Camera":
        with open(path) as fh:
            d = json.load(fh)
        d["position"] = np.asarray(d["position"], np.float32)
        d["direction"] = np.asarray(d["direction"], np.float32)
        d["pixel_count"] = tuple(d["pixel_count"])
        return Camera(**d)

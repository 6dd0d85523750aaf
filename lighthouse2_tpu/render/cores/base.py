"""The render-core contract — CoreAPI_Base re-imagined functionally.

Reference (core_api_base.h:78-114): cores are DLLs implementing
Init/SetTarget/Set*/Render/Shutdown, loaded by name at runtime
(core_api_base.cpp:119-132). Here a core is a Python class registered by
name; "DLL loading" becomes `create_core(name)`, device upload is the
DeviceScene pytree, and Render is a jitted pass. CoreStats parity: every
render returns a stats dict (ray counts, per-stage wall times).
"""
from __future__ import annotations

import time

import numpy as np

from lighthouse2_tpu.core.types import RenderConfig

_REGISTRY: dict[str, type] = {}


def register_core(name):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.core_name = name
        return cls
    return deco


def create_core(name: str, config: RenderConfig | None = None) -> "RenderCore":
    """CreateCoreAPI analog (core_api_base.cpp:119-132)."""
    # late imports so every built-in core self-registers
    from lighthouse2_tpu.render.cores import wavefront_core  # noqa: F401
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown render core '{name}' (available: {sorted(_REGISTRY)})")
    return _REGISTRY[name](config or RenderConfig())


class RenderCore:
    """Base class defining the core contract (CoreAPI_Base analog)."""

    core_name = "base"

    def __init__(self, config: RenderConfig):
        self.config = config
        self.stats: dict = {}

    # SetTarget (core_api_base.h:83): (re)size the render target
    def set_target(self, width: int, height: int, spp: int = 1):
        import dataclasses
        self.config = dataclasses.replace(
            self.config, width=width, height=height, spp_per_pass=spp)
        self.on_target_changed()

    def on_target_changed(self):
        pass

    def setting(self, name: str, value):
        """String-keyed runtime settings (core_api_base.h Setting analog;
        rendercore.cpp:597-615 accepts what it knows)."""
        import dataclasses
        known = {"epsilon": "geometry_epsilon", "clampValue": "clamp_value",
                 "clampDirect": "clamp_direct", "clampIndirect": "clamp_indirect"}
        if name in known:
            self.config = dataclasses.replace(self.config, **{known[name]: value})

    def render(self, device_scene, view, converge: bool = True) -> dict:
        raise NotImplementedError

    def get_image(self) -> np.ndarray:
        raise NotImplementedError

    def shutdown(self):
        pass


class StageTimer:
    """CPU-side stage timing helper (cudaEvent/CoreStats analog)."""

    def __init__(self):
        self.times = {}

    def stage(self, name):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                timer.times[name] = timer.times.get(name, 0.0) + (
                    time.perf_counter() - self.t0)

        return _Ctx()

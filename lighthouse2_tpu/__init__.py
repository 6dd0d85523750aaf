"""lighthouse2_tpu — a TPU-native differentiable wavefront path tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Lighthouse 2
(BartStam/lighthouse2): host-side scene system (glTF/OBJ, scene graph, instancing,
Disney/Lambert materials, 4 light types, HDR skydomes, animation/skinning) feeding
render "cores" that run a generate/extend/shade wavefront path tracer with NEE+MIS,
progressive accumulation and SVGF/TAA filtering — all as SoA device arrays, jitted
wavefront steps, and multi-chip sharding over a jax Mesh.

Layer map (mirrors SURVEY.md §1 but TPU-first):
  core/      math + host/device data contract (reference: lib/RenderSystem/common_classes.h)
  scene/     host scene system (reference: lib/RenderSystem/host_*.cpp)
  bvh/       SAH BVH build + flatten (reference: lib/RenderCore_Bart/bvh.cpp)
  render/    render cores: wavefront PT, reference tracer, filters
             (reference: lib/rendercore_optix7, lib/RenderCore_Bart)
  parallel/  device mesh / sharding layer (no reference analog; single-GPU there)
  diff/      differentiable-rendering utilities + FD validation
  utils/     timers, stats, config, image I/O
"""

__version__ = "0.1.0"

from lighthouse2_tpu.api import RenderAPI  # noqa: F401

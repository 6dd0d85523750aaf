"""Differentiable scene parameterizations.

The reference never differentiates (BASELINE.json adds that requirement); the
analog of its host→core setters (SetMaterials/SetLights/SetGeometry,
core_api_base.h:78-114) here are pure functions that insert parameter pytrees
into a DeviceScene with every derived array recomputed in jnp, so gradients
flow from pixels back into the parameters:

  - materials: any DeviceMaterials field (color, roughness, ...);
  - lights: area-light radiance (NEE + implicit-hit paths);
  - geometry: vertex positions — e1/e2/tri9/face normals/areas are re-derived
    differentiably; BVH traversal itself is stop_gradient'd and the hit is
    re-evaluated by refine_hit (bvh/traverse.py), so these grads are the
    reparameterized-hit estimator of SURVEY.md §7.3.3.
"""
from __future__ import annotations

import jax.numpy as jnp

from lighthouse2_tpu.scene.device_scene import DeviceScene


def set_material_fields(scene: DeviceScene, **fields) -> DeviceScene:
    """Replace DeviceMaterials fields (e.g. color=[M,3]) differentiably."""
    return scene.replace(materials=scene.materials.replace(**fields))


def set_light_radiance(scene: DeviceScene, tri_radiance) -> DeviceScene:
    """Replace area-light radiance [LT,3]; energy (importance-sampling weight)
    is re-derived like host_light.cpp:25-41 but kept out of the gradient so
    the light-pick pdf stays a detached probability (the postponed-pdf
    convention — sampling distributions are not differentiated)."""
    import jax
    energy = jax.lax.stop_gradient(jnp.sum(jnp.asarray(tri_radiance), -1))
    return scene.replace(lights=scene.lights.replace(
        tri_radiance=jnp.asarray(tri_radiance), tri_energy=energy))


def displace_vertices(scene: DeviceScene, offset) -> DeviceScene:
    """Apply per-triangle-vertex world-space offsets [T,3,3] (or broadcastable)
    and re-derive every dependent triangle array differentiably.

    Vertex normals/alphas are kept fixed (their dependence on positions is a
    smooth-shading modeling choice, not part of the light-transport gradient
    contract); geometric face normal, area and the traversal/refine layouts
    are recomputed.
    """
    tris = scene.tris
    offset = jnp.asarray(offset, jnp.float32)
    v0 = tris.v0 + offset[:, 0]
    v1 = tris.v0 + tris.e1 + offset[:, 1]
    v2 = tris.v0 + tris.e2 + offset[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    cr = jnp.cross(e1, e2)
    nlen = jnp.sqrt(jnp.maximum(jnp.sum(cr * cr, -1), 1e-30))
    face_n = cr / nlen[:, None]
    area = 0.5 * nlen
    tri9 = jnp.concatenate([v0.T, e1.T, e2.T], 0)
    new_tris = tris.replace(
        v0=v0, e1=e1, e2=e2, face_n=face_n, area=area,
        inv_area=1.0 / jnp.maximum(area, 1e-30), tri9=tri9)
    scene = scene.replace(tris=new_tris)
    if scene.bvh is not None:
        # traversal stays on the UN-displaced BVH (stop_gradient inside the
        # kernel); refine_hit must see the displaced triangles
        scene = scene.replace(bvh=scene.bvh.replace(tri9=tri9))
    if scene.cbvh is not None:
        # refresh the cluster tiles' triangle geometry (payload rows AND the
        # bmat hit-test plane forms) so the kernel tracks displaced vertices
        # exactly like the lockstep path's live leaf tests — without this,
        # shadow-ray epsilons measured against the displaced surface
        # self-occlude against the stale kernel geometry (the round-2
        # test_vertex_grad_with_bvh FD discontinuity). Traversal boxes stay
        # stale; gradients reattach per ray (render/fetch.py), never
        # through the bake.
        import jax
        from lighthouse2_tpu.bvh.clusters import rebake_geometry
        scene = scene.replace(cbvh=jax.lax.stop_gradient(
            rebake_geometry(scene.cbvh, tri9)))
    return scene


def material_color_params(scene: DeviceScene):
    """(extract, insert) pair for optimizing material base colors."""
    def extract(s):
        return s.materials.color

    def insert(s, color):
        return set_material_fields(s, color=color)

    return extract(scene), insert

from lighthouse2_tpu.render.cores.base import RenderCore, create_core  # noqa: F401

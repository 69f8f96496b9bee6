from customnerf_tpu.models.field import NeRFField, FieldConfig
from customnerf_tpu.models.renderer import (
    RenderSettings,
    render_rays,
    render_rays_fast,
)

__all__ = ["NeRFField", "FieldConfig", "RenderSettings", "render_rays",
           "render_rays_fast"]

from customnerf_tpu.utils.image import linear_to_srgb, srgb_to_linear
from customnerf_tpu.utils.misc import seed_everything

__all__ = ["linear_to_srgb", "srgb_to_linear", "seed_everything"]

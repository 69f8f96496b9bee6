from customnerf_tpu.engine.trainer import Trainer

__all__ = ["Trainer"]

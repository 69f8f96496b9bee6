from customnerf_tpu.data.base import NeRFDataset, RayBatch

__all__ = ["NeRFDataset", "RayBatch"]

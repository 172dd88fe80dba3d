from gmpi_tpu.data.datasets import AFHQCat, DATASETS, FFHQ, MetFaces, get_dataset
from gmpi_tpu.data.loader import ShardedLoader

__all__ = ["AFHQCat", "DATASETS", "FFHQ", "MetFaces", "ShardedLoader", "get_dataset"]

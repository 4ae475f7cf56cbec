from loongx_tpu.data.datasets import (  # noqa: F401
    SeedDataset,
    SubjectPairDataset,
    ImageConditionDataset,
    CartoonDataset,
    build_dataset,
)
from loongx_tpu.data.loader import iterate_batches, prefetch_to_device  # noqa: F401

"""Data layer (L4): batch schema, datasets, bucketed padding."""
from packppi_tpu.data.batch import ProteinBatch, pad_features, stack_batch  # noqa: F401

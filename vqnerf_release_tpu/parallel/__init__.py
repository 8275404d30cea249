"""Parallelism layer: device mesh, batch sharding, pjit train steps.

The reference's entire distribution surface (SURVEY.md §2.3) is data
parallelism: tf.distribute.MirroredStrategy over the ray batch
(trainvali.py:436-486) plus multi-process view sharding for geometry
extraction (gen_geo.py:141-146). Here both collapse into one idiom: a 1-D
jax.sharding.Mesh over the 'rays' axis; batches are sharded over it,
params are replicated, and XLA inserts the psum gradient all-reduce over
ICI automatically.
"""

from .mesh import (batch_sharding, get_mesh, replicate, shard_batch,
                   pad_to_multiple)

__all__ = ["get_mesh", "batch_sharding", "shard_batch", "replicate",
           "pad_to_multiple"]

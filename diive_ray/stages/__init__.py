"""Operator stages: each module exposes functions that take and return
``ray.data.Dataset`` (or pure Arrow-batch kernels used inside
``map_batches``)."""

from cuking_tpu.parallel.submatrix import Submatrix, num_shards  # noqa: F401

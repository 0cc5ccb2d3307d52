from cuking_tpu.ops.bitset import PlaneLayout, allocate_planes, pack_genotypes  # noqa: F401
from cuking_tpu.ops.king_math import king_from_counts  # noqa: F401

"""Host-sharded plane storage for multi-host pod slices.

The reference's memory-relief mechanism is process-level sharding: each GPU
job stores only its Submatrix's sample ranges (cuking.cu:507-517,
README.md:94-98).  On a pod slice the analogous property is that each HOST
materializes only the sample row-blocks its local chips own: ingest filters
the COO entries to the host's global row ranges (exactly like the shard
ingest filter, cuking.cu:675-678), packs them into per-device numpy blocks,
and assembles a globally-sharded ``jax.Array`` via
``jax.make_array_from_single_device_arrays`` — no host ever holds the whole
cohort's bitset.

Single-process runs degenerate to "all devices are local", which is how the
unit tests cover this path on the 8-device CPU mesh.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuking_tpu.ops import bitset
from cuking_tpu.ops.bitset import PlaneLayout
from cuking_tpu.parallel.ring import AXIS


class HostShardedStorage:
    """This host's slice of the sample-sharded global plane array.

    Global layout: device at mesh position ``p`` (row-major over
    ``mesh.devices``) owns global sample rows ``[p*nd, (p+1)*nd)``; rows at
    or past ``num_samples`` are padding (all-ones = missing, self-masking).
    This host stores one ``[2, nd, W]`` block per local device,
    concatenated in mesh-position order.
    """

    def __init__(
        self,
        layout: PlaneLayout,
        num_samples: int,
        mesh: Mesh,
        row_multiple: int = 1,
    ):
        self.layout = layout
        self.num_samples = num_samples
        self.mesh = mesh
        num_devices = mesh.devices.size
        nd = -(-max(num_samples, 1) // num_devices)
        self.nd = -(-nd // row_multiple) * row_multiple
        self.n_pad = self.nd * num_devices
        process = jax.process_index()
        # (mesh position, device) pairs owned by this process, mesh order.
        self.local_blocks = [
            (p, d)
            for p, d in enumerate(mesh.devices.flat)
            if d.process_index == process
        ]
        self._block_of = {p: k for k, (p, _) in enumerate(self.local_blocks)}
        # O(1) vectorized lookups for the ingest hot path (avoid per-element
        # Python dispatch on ~10⁷-entry COO arrays).
        self._block_lut = np.full(num_devices, -1, np.int64)
        for k, (p, _) in enumerate(self.local_blocks):
            self._block_lut[p] = k
        self.planes = bitset.allocate_planes(
            self.nd * len(self.local_blocks), layout
        )
        self.version = 0

    def mark_mutated(self) -> None:
        self.version += 1

    # -- the ingest-facing surface (duck-typed like PanelStorage) ----------

    def contains(self, global_idx: np.ndarray) -> np.ndarray:
        """True for samples stored on this host (cf. cuking.cu:675-678)."""
        global_idx = np.asarray(global_idx)
        valid = (global_idx >= 0) & (global_idx < self.num_samples)
        positions = np.minimum(global_idx // self.nd, len(self._block_lut) - 1)
        return valid & (self._block_lut[positions] >= 0)

    def storage_offsets(self, global_idx: np.ndarray) -> np.ndarray:
        """Global sample index → row in this host's concatenated blocks;
        callers must only pass indices with ``contains(idx)`` true."""
        global_idx = np.asarray(global_idx)
        block = self._block_lut[global_idx // self.nd]
        return block * self.nd + global_idx % self.nd

    # -- assembly ----------------------------------------------------------

    def to_global_array(self) -> jax.Array:
        """Per-device blocks → one globally-sharded [2, n_pad, W] jax.Array."""
        sharding = NamedSharding(self.mesh, P(None, AXIS, None))
        shards = [
            jax.device_put(
                self.planes[:, k * self.nd : (k + 1) * self.nd, :], d
            )
            for k, (_, d) in enumerate(self.local_blocks)
        ]
        return jax.make_array_from_single_device_arrays(
            (2, self.n_pad, self.layout.words), sharding, shards
        )

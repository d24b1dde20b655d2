"""Multi-chip / multi-host parallelism (all NEW vs the single-GPU reference).

* :mod:`.mesh` — device mesh setup + multi-host runtime init.
* :mod:`.dp` — data-parallel batched detection (shard_map over images).
* :mod:`.ring_match` — sharded 2-NN matching (ppermute descriptor ring).
"""

from .mesh import DATA_AXIS, init_distributed, make_mesh
from .dp import make_dp_detect_fn, shard_batch
from .ring_match import make_ring_match_fn
from .scaling import measure_dp_scaling

__all__ = ["DATA_AXIS", "init_distributed", "make_mesh",
           "make_dp_detect_fn", "shard_batch", "make_ring_match_fn",
           "measure_dp_scaling"]

"""Multi-host orchestration over a TPU pod slice.

The reference has no distributed layer at all (SURVEY 2/5.8: composition is
by separate invocations + join_outputs.py). Here a pod-slice run is:

  1. `initialize()` on every host (jax.distributed handshake over DCN);
  2. build the global pixel mesh with `pod_mesh()`;
  3. shard the camera bundle with `shard_rays(...)` - each host holds only
     its local pixel rows;
  4. run the same fused render under jit with pixel shardings: XLA SPMD
     partitions everything, the forward pass needs zero collectives (rays
     are independent), and any gradient reduction becomes a psum over ICI;
  5. gather per-host image pieces with `jax.experimental.multihost_utils`
     or write per-host npz files and merge with scripts/join_outputs.py.

On a single host all of this degrades gracefully to the local-mesh path
used by the tests (8 virtual CPU devices) and the driver's multichip dry
run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from blacklight_tpu.parallel.sharding import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed handshake; no-op when already initialized or when
    running single-process (the common local case).

    Must run before anything initializes the XLA backend (jax.devices()
    etc.), so the already-initialized check inspects the distributed
    global state rather than process_count()."""
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # Environment-driven (TPU pod slices auto-configure)
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass  # single-process run
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(axis_name: str = "pixels") -> Mesh:
    """1-D global mesh over every device of every process."""
    return make_mesh(jax.devices(), axis_name)


def local_slice(n: int) -> slice:
    """The [start, stop) pixel range this process owns for an n-ray bundle
    sharded over the pod mesh (block distribution by process index)."""
    nproc = jax.process_count()
    pid = jax.process_index()
    per = -(-n // nproc)
    return slice(pid * per, min((pid + 1) * per, n))

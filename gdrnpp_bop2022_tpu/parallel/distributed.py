"""Multi-host initialization + cross-process helpers.

Replaces the reference's launcher matrix (torch.distributed init_dist,
horovod init_hvd, lightning strategies — core/utils/my_comm.py:174-234,
main_gdrn.py:197-225) with `jax.distributed.initialize`: every host runs
the same program; the global device mesh spans all hosts (ICI intra-slice,
DCN across slices); collectives come from sharded jit, and the few genuine
host-side aggregations (eval result gathering) use process_allgather.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Initialize multi-host JAX. No-ops on single host (the common case on
    one chip/slice-per-process setups auto-detect via TPU env vars)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def gather_results(local_rows: list) -> list:
    """Gather python-object result rows from all processes to all
    (reference: my_comm.all_gather of pickled predictions :70-173). Uses a
    host allgather over fixed-size pickle buffers."""
    if jax.process_count() == 1:
        return list(local_rows)
    import pickle
    from jax.experimental import multihost_utils

    payload = pickle.dumps(local_rows)
    n = np.array([len(payload)], np.int64)
    max_n = int(multihost_utils.process_allgather(n).max())
    buf = np.zeros(max_n, np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    sizes = multihost_utils.process_allgather(n)[:, 0]
    bufs = multihost_utils.process_allgather(buf)
    out = []
    for i in range(jax.process_count()):
        out.extend(pickle.loads(bufs[i, :int(sizes[i])].tobytes()))
    return out

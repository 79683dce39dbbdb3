"""Multi-host (multi-process) distributed execution.

The reference is a single-process codebase — its only parallelism is
torch.nn.DataParallel (/root/reference/test_train.py:386-388). The
TPU-native multi-host equivalents (SURVEY.md §2.7):

- `initialize()` — jax.distributed.initialize: starts/joins the cluster
  coordination service. On TPU pods every argument is discovered from the
  TPU environment; on CPU/GPU pass coordinator_address/num_processes/
  process_id explicitly (tests run 2 CPU processes with gloo collectives,
  tests/test_distributed.py).
- `global_mesh()` — one jax.sharding.Mesh over every chip of every host;
  GSPMD then emits ICI collectives inside a slice and DCN collectives
  across slices from the same sharding annotations (no NCCL-style API to
  mirror).
- `host_local_batch_to_global()` — per-host input feeding: each process
  loads only its rows of the global batch (DataLoader num_shards/shard_id)
  and jax.make_array_from_process_local_data assembles the global array
  without any cross-host data movement.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: str = "gloo") -> None:
    """Join the JAX distributed runtime. Idempotent; no-op when the args
    are absent and no TPU cluster environment is present (single process).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    if coordinator_address is None and num_processes is None:
        # TPU pods auto-discover; anything else stays single-process. The
        # registry is ClusterEnv._cluster_types — the real TPU detectors
        # (GceTpuCluster/GkeTpuCluster) are grandchildren of ClusterEnv, so
        # __subclasses__() would miss them and silently no-op on real pods.
        try:
            import jax._src.clusters as clusters
            kinds = getattr(clusters.ClusterEnv, "_cluster_types", None) \
                or clusters.ClusterEnv.__subclasses__()
            auto = any(c.is_env_present() for c in kinds)
        except Exception:
            auto = False
        if not auto:
            return
    # NB: nothing before jax.distributed.initialize may touch the backend
    # (jax.devices()/default_backend() would pin a single-process runtime),
    # so platform checks read the config, not the backend.
    platforms = jax.config.jax_platforms or ""
    if num_processes is not None or platforms.startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation",
                              cpu_collectives)
        except Exception:
            pass  # already initialized or unsupported jaxlib — let init try
    jax.distributed.initialize(coordinator_address, num_processes, process_id)
    _INITIALIZED = True


def global_mesh(n_model: int = 1) -> Mesh:
    """Mesh over all hosts' devices: ("data", "model") with the data axis
    spanning processes (jax.devices() orders devices process-contiguously,
    so each process's addressable shards are contiguous rows)."""
    return make_mesh(n_model=n_model, devices=jax.devices())


def process_batch_bounds(global_batch: int) -> tuple[int, int]:
    """[start, stop) rows of the global batch owned by this process.

    Requires the data-parallel batch to tile the process count (each
    process feeds the contiguous rows its devices own — jax.devices()
    orders devices process-contiguously along the mesh data axis). A
    model-parallel-heavy mesh whose data axis is smaller than the process
    count cannot satisfy this; shrink n_model or grow the batch."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"multi-host feeding needs the global batch (= mesh data-axis "
            f"chunk, {global_batch}) to be a multiple of the process count "
            f"({n}); use a mesh with data >= {n} processes x its per-chip "
            f"batch, or run single-host")
    per = global_batch // n
    p = jax.process_index()
    return p * per, (p + 1) * per


def host_local_batch_to_global(batch, mesh: Mesh):
    """Dict of per-host numpy arrays (this host's batch rows) -> global
    jax.Arrays sharded over the mesh "data" axis."""
    nproc = jax.process_count()

    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        gshape = (x.shape[0] * nproc, *x.shape[1:])
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), x, gshape)

    return jax.tree.map(put, batch)


def host_replicated_to_global(tree, mesh: Mesh):
    """Identical per-host arrays -> fully-replicated global jax.Arrays
    (used for validation batches: every process walks the same val data, so
    outputs stay replicated and np.asarray works on every host)."""
    import numpy as np

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x, x.shape)

    return jax.tree.map(put, tree)

"""Multi-host process-group support for geometry extraction.

The reference shards the long light-visibility extraction across GPUs by
launching N independent processes with `--num_p N --p_i i`
(geo/NeuS-ours2/gen_geo.py:141-146, README.md:51-53). The TPU-native
equivalent is a jax.distributed process group over TPU hosts: each host
joins the group, takes the view shard for its process index, and shards
each view's ray axis over its *local* devices (the ICI-connected chips it
owns) — collectives never cross DCN because params are replicated and
views are independent.

Composition rule (all optional, all composable):
  * `--num-hosts/--host-id` (or env-provided process group): views split
    across hosts automatically.
  * `--num-p/--p-i` on top subdivides each host's shard further (e.g. to
    run two extraction processes per host), giving
    num_p * process_count total slots.
  * `--devices` shards each view's rays over the host's local chips.
"""

__all__ = ["init_distributed", "compose_view_shard", "local_mesh"]


def init_distributed(coordinator=None, num_hosts=None, host_id=None):
    """Join (or skip) the JAX process group.

    Single-host (no coordinator, num_hosts absent or <= 1): no-op,
    returns (0, 1). Multi-host: calls jax.distributed.initialize — on
    Cloud TPU pods coordinator/num/host_id are auto-detected from the
    metadata server, so all three may stay None; off-pod they must be
    given explicitly. Returns (process_index, process_count).
    """
    import jax

    multi = bool(coordinator) or (num_hosts is not None and num_hosts > 1)
    if not multi:
        return 0, 1
    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num_hosts is not None:
        kwargs["num_processes"] = num_hosts
    if host_id is not None:
        kwargs["process_id"] = host_id
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def compose_view_shard(num_p, p_i, process_index, process_count):
    """Fold the host grid into the reference's --num_p/--p_i view split.

    Returns (total_shards, shard_index) such that every (host, local
    process) pair owns a distinct slot and the union covers all views —
    the same contiguous-range math as gen_geo.py:141-146, applied to
    num_p * process_count slots. With no local split (num_p None) the
    hosts alone form the grid; with one host it degrades to the
    reference behavior exactly.
    """
    if process_count <= 1:
        return num_p, p_i
    if num_p is None:
        return process_count, process_index
    if p_i is None:
        raise ValueError("--num-p given without --p-i")
    return num_p * process_count, p_i * process_count + process_index


def local_mesh(devices_arg="all"):
    """Ray mesh over this host's local devices (multi-host safe: never
    spans DCN). devices_arg: 'all' or an int count; None/<=1 -> None."""
    import jax

    from .mesh import get_mesh

    avail = jax.local_devices()
    if devices_arg in (None, "", "1", 1):
        return None
    n = len(avail) if devices_arg == "all" else int(devices_arg)
    if n <= 1:
        return None
    if n > len(avail):
        raise ValueError(
            f"--devices {n} but only {len(avail)} local devices")
    return get_mesh(avail[:n])

"""Child process for the 2-host jax.distributed exercise test.

Run by tests/test_multihost.py with JAX_PLATFORMS=cpu and 4 virtual
devices per process: initializes the distributed runtime, checks the
process/device topology, exercises the `eop_tpu.parallel.dist` object
collectives (the reference's gloo side-channel equivalents,
`/root/reference/yolox/utils/dist.py:68-267`), and runs one pjit-sharded
computation over the global 8-device mesh so a cross-process collective
actually executes.
"""

from __future__ import annotations

import sys


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
    )

    import numpy as np

    from eop_tpu.parallel import dist, make_mesh, shard_batch

    assert dist.get_world_size() == num_procs, dist.get_world_size()
    assert dist.get_rank() == pid
    assert dist.get_local_size() == 4, jax.local_device_count()
    assert jax.device_count() == 4 * num_procs
    assert dist.is_main_process() == (pid == 0)

    dist.synchronize()  # barrier

    # object all_gather with rank-dependent payload SIZES (exercises the
    # padded-pickle path)
    payload = {"rank": pid, "blob": b"x" * (100 + 400 * pid)}
    gathered = dist.all_gather(payload)
    assert [g["rank"] for g in gathered] == list(range(num_procs))
    assert [len(g["blob"]) for g in gathered] == [
        100 + 400 * i for i in range(num_procs)
    ]

    got = dist.gather({"r": pid}, dst=0)
    assert (len(got) == num_procs) == (pid == 0)

    seed = dist.shared_random_seed()
    seeds = dist.all_gather(int(seed))
    assert len(set(seeds)) == 1, seeds  # same seed everywhere

    # global-mesh collective: batch sharded over all 8 devices across the
    # two processes; the jitted psum must see every host's shard
    import jax.numpy as jnp

    mesh = make_mesh()
    local = np.full((4, 8), float(pid + 1), np.float32)  # 4 rows per host
    with mesh:
        sb = shard_batch(mesh, {"x": local})
        assert sb["x"].shape == (4 * num_procs, 8), sb["x"].shape  # global
        total = jax.jit(lambda x: jnp.sum(x))(sb["x"])
        # replicated output: read this host's addressable copy
        total = float(np.asarray(total.addressable_data(0)))
    # global batch = rank0 rows (1.0) + rank1 rows (2.0)
    expect = 8.0 * (sum(range(1, num_procs + 1)) * 4)
    assert total == expect, (total, expect)

    print(f"MULTIHOST_CHILD_OK rank={pid} total={total}")


if __name__ == "__main__":
    main()

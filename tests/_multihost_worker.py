"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process initializes jax.distributed against a shared local coordinator,
sees 4 local CPU devices (8 global), loads only its `host_local_slice` of
the global batch, and runs ONE jitted train step through the real
DiffusionModel — executing the `jax.make_array_from_process_local_data`
branch of shard_batch (parallel/mesh.py) that single-process tests can
never reach. Process 0 writes the resulting loss for the parent to compare
against the single-process run.

Run as: python tests/_multihost_worker.py <process_id> <coordinator_port> <out.json>
"""

import json
import os
import sys


def main():
    proc_id, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import numpy as np

    from diffsplitting_tpu.parallel.mesh import host_local_slice
    from diffsplitting_tpu.train import DiffusionModel
    from tests.test_trainer import synth_batch, tiny_opt

    model = DiffusionModel(tiny_opt("indi", in_ch=2, out_ch=2), seed=0)

    global_batch = synth_batch(b=8, seed=42)
    local = {k: host_local_slice(v) for k, v in global_batch.items()}
    assert local["input"].shape[0] == 4, "each process feeds only its slice"
    model.feed_data(local)

    # the multi-process branch must have produced GLOBAL arrays: full batch
    # dim reassembled across hosts, only 4 of 8 shards addressable here
    arr = model.data["input"]
    assert arr.shape[0] == 8, f"global batch not reassembled: {arr.shape}"
    assert len(arr.addressable_shards) == 4, len(arr.addressable_shards)
    assert not arr.is_fully_addressable

    model.optimize_parameters()
    loss = float(model.log_dict["l_pix"])  # fully-replicated scalar

    if proc_id == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss}, f)


if __name__ == "__main__":
    main()

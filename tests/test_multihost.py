"""The multi-host feeding path, actually executed.

SURVEY §2.5's per-host data-loading contract: on a multi-process pod each
host feeds only `host_local_slice` of the global batch and `shard_batch`
assembles global arrays with `jax.make_array_from_process_local_data`.
That branch is gated on `jax.process_count() > 1` and is dead code in every
single-process test — here two real processes (jax.distributed over a local
coordinator, CPU devices) run one DiffusionModel train step through it and
must reproduce the single-process loss exactly (same global batch, same
seed, same 8-device mesh).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_trainer import synth_batch, tiny_opt


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, attempt):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out_path = str(tmp_path / f"worker0_{attempt}.json")

    env = dict(os.environ)
    env["PYTHONPATH"] = repo  # drop the axon site: pure-CPU subprocesses
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_multihost_worker.py", str(i), str(port),
             out_path],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    errs = [stderr for p, (_, stderr) in zip(procs, outs) if p.returncode != 0]
    if errs:
        return None, errs[0]
    with open(out_path) as f:
        return json.load(f)["loss"], None


@pytest.mark.slow
def test_two_process_feeding_matches_single_process(tmp_path):
    # the coordination service's heartbeats are wall-clock-sensitive: under a
    # fully loaded host (the rest of the suite) a worker can get evicted and
    # die through no fault of the code under test — retry once before failing
    multi_loss, err = _run_workers(tmp_path, 0)
    if multi_loss is None:
        multi_loss, err = _run_workers(tmp_path, 1)
    assert multi_loss is not None, f"workers failed twice:\n{err[-3000:]}"

    # single-process reference: same model seed, same global batch, same
    # 8-device mesh (conftest gives this process 8 virtual CPU devices)
    from diffsplitting_tpu.train import DiffusionModel

    model = DiffusionModel(tiny_opt("indi", in_ch=2, out_ch=2), seed=0)
    model.feed_data(synth_batch(b=8, seed=42))
    model.optimize_parameters()
    single_loss = float(model.log_dict["l_pix"])

    np.testing.assert_allclose(multi_loss, single_loss, rtol=1e-5)

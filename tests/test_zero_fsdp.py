"""ZeRO-1 / FSDP sharding over the 8-virtual-CPU 'data' mesh.

Checks (parallel/zero.py + trainer wiring):
  * training with sharded Adam moments (ZeRO-1) matches replicated training
    numerically — the math is unchanged, only placement moves;
  * per-device optimizer-state memory actually shrinks ~N×;
  * FSDP (params sharded too) trains, keeps params sharded across steps, and
    matches the replicated loss;
  * checkpoint resume re-applies the sharding.
"""

import numpy as np

from diffsplitting_tpu.parallel import tree_device_bytes
from diffsplitting_tpu.train import DiffusionModel

from tests.test_trainer import synth_batch, tiny_opt


def _losses(model, batch, steps=3):
    out = []
    for _ in range(steps):
        model.feed_data(batch)
        model.optimize_parameters()
        out.append(float(model.get_current_log()["l_pix"]))
    return out


def _zero_opt(tmp_path, fsdp=False):
    opt = tiny_opt("indi", tmp_path, in_ch=2, out_ch=2)
    opt["train"]["optimizer"]["zero"] = True
    if fsdp:
        opt["model"]["param_sharding"] = "fsdp"
    return opt


def test_zero_spec_shards_production_kernels():
    from diffsplitting_tpu.parallel import zero_spec

    # production UNet conv kernels shard (full ~n× win on these leaves)
    for shape in ((3, 3, 64, 64), (3, 3, 256, 512), (1, 1, 512, 512)):
        spec = zero_spec(shape, 8)
        assert list(spec).count("data") == 1, (shape, spec)
    # scalars / small affines stay replicated
    assert tuple(zero_spec((), 8)) == ()
    assert tuple(zero_spec((64,), 8)) == ()
    # indivisible dims fall back to the next-largest divisible one
    spec = zero_spec((5, 1024), 8)
    assert tuple(spec) == (None, "data")


def test_zero1_matches_replicated(tmp_path):
    batch = synth_batch()
    base = DiffusionModel(tiny_opt("indi", tmp_path, in_ch=2, out_ch=2), seed=0)
    zero = DiffusionModel(_zero_opt(tmp_path), seed=0)
    l_base = _losses(base, batch)
    l_zero = _losses(zero, batch)
    np.testing.assert_allclose(l_base, l_zero, rtol=1e-5, atol=1e-6)


def test_zero1_shards_opt_state_memory(tmp_path):
    import jax

    n = jax.device_count()
    base = DiffusionModel(tiny_opt("indi", tmp_path, in_ch=2, out_ch=2), seed=0)
    zero = DiffusionModel(_zero_opt(tmp_path), seed=0)
    b_repl = tree_device_bytes(base.opt_state)
    b_zero = tree_device_bytes(zero.opt_state)
    # the tiny test net keeps sub-2048-elem leaves replicated (zero_spec
    # min_shard_elems), so the win here is ~2.5×; production UNets' smallest
    # kernels are (3,3,64,64)=36k elems and shard fully (~n×)
    assert b_zero < b_repl / 2, (b_zero, b_repl, n)

    # sharding must survive an optimization step (output constraints hold)
    batch = synth_batch()
    zero.feed_data(batch)
    zero.optimize_parameters()
    assert tree_device_bytes(zero.opt_state) < b_repl / 2
    # params remain replicated under ZeRO-1 (each device holds the full tree)
    leaf = jax.tree_util.tree_leaves(zero.params)[0]
    assert leaf.is_fully_replicated


def test_fsdp_params_sharded_and_match(tmp_path):
    import jax

    n = jax.device_count()
    batch = synth_batch()
    base = DiffusionModel(tiny_opt("indi", tmp_path, in_ch=2, out_ch=2), seed=0)
    fsdp = DiffusionModel(_zero_opt(tmp_path, fsdp=True), seed=0)

    p_repl = tree_device_bytes(base.params)
    p_fsdp = tree_device_bytes(fsdp.params)
    assert p_fsdp < p_repl / 1.5, (p_fsdp, p_repl, n)

    l_base = _losses(base, batch)
    l_fsdp = _losses(fsdp, batch)
    np.testing.assert_allclose(l_base, l_fsdp, rtol=1e-5, atol=1e-6)
    # params still sharded after steps
    assert tree_device_bytes(fsdp.params) < p_repl / 1.5

    # inference still runs (params gather on use)
    fsdp.set_new_noise_schedule(fsdp.opt["model"]["beta_schedule"]["val"], "val")
    fsdp.feed_data({"input": batch["input"]})
    out = fsdp.test(continuous=False)
    assert np.isfinite(np.asarray(out)).all()


def test_zero_resume_reapplies_sharding(tmp_path):
    import jax

    n = jax.device_count()
    batch = synth_batch()
    model = DiffusionModel(_zero_opt(tmp_path), seed=0)
    model.feed_data(batch)
    model.optimize_parameters()
    model.save_network(epoch=1, iter_step=1)

    opt2 = _zero_opt(tmp_path)
    opt2["path"]["resume_state"] = str(tmp_path / "I1_E1")
    resumed = DiffusionModel(opt2, seed=1)
    assert resumed.begin_step == 1
    # restored opt state keeps the zero sharding (no bigger than pre-save)
    assert tree_device_bytes(resumed.opt_state) <= int(
        tree_device_bytes(model.opt_state) * 1.05
    ), n
    resumed.feed_data(batch)
    resumed.optimize_parameters()
    assert np.isfinite(float(resumed.get_current_log()["l_pix"]))

"""Device-resident random-patch pool: the TPU-native training data path.

The reference's train loop materializes a fresh random patch batch on the
host every iteration and ships it to the device (torch DataLoader feeding
CUDA; /root/reference/split.py:141-270 + data/split_dataset.py:227-278).
Through the axon TPU tunnel that per-iteration host->device put (a) costs
wall time in the hot loop and (b) LEAKS its payload in host RAM — the 40k
soak (results/soak_split) measured 54.6 GB/hour at 128-px batch-8, i.e.
~the full batch payload retained per put.

`DevicePatchPool` replaces per-iteration transfers with ONE upload: the
full normalized-source frame stacks move to the device at construction
(Hagen scale: 50 frames x 512^2 x 2ch f32 = 100 MB), and every training
batch is drawn ON DEVICE by a single jitted program — random frame pick,
random patch offsets (`lax.dynamic_slice`), paired horizontal flip, target
normalization, and the weighted-sum input, exactly mirroring
`SplitDataset.__getitem__` (split_dataset.py:244-279). The host never
touches pixels again; the tunnel carries only the PRNG key fold-in.

Semantics parity with the host path (tested in tests/test_device_pool.py):
  * frame/offset distribution matches `_get_location` (random_patching):
    offsets uniform over [0, H-P) (exclusive high, like np integers);
  * `uncorrelated_channels` draws channel-2 frames independently
    (split_dataset.py:247-249);
  * paired hflip with p=0.5 when transforms enabled (:236-242);
  * target = channel-concat, normalized by (mean_target, std_target);
  * input = weights . normalized target (joint-InDI path) or
    normalize_inp(weights . raw patches) (:267-274);
  * `target_channel_idx` slicing (:276-279).

The stacks are passed to the jitted draw as ARGUMENTS (a closure-captured
100 MB stack would inline into the remote-compile payload and blow the
tunnel's body limit — CLAUDE.md), and the jit is built ONCE per pool (a
fresh jit per call would re-trace every iteration — the ChunkRunner
lesson).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


class DevicePatchPool:
    """Draws training batches on device from a resident frame-stack pair.

    Parameters
    ----------
    dataset : SplitDataset
        The configured training dataset (random_patching=True). Its frame
        data, normalization stats, and augmentation flags are reused so the
        pool cannot drift from the host path's semantics.
    batch_size : int
    seed : int
        Independent of the dataset's numpy seed: the pool has its own
        counter-based key stream (fold_in(base, step)).
    mesh : jax.sharding.Mesh, optional
        When given, stacks are replicated over the mesh and drawn batches
        are sharded over its 'data' axis, so multi-device training consumes
        them without resharding.
    """

    def __init__(self, dataset, batch_size: int, seed: int = 0, mesh=None):
        P = int(dataset._patch_size)
        F = int(dataset._frameN)
        stack0 = np.stack(
            [np.asarray(f, np.float32) for f in dataset._data_dict[0][:F]])
        stack1 = np.stack(
            [np.asarray(f, np.float32) for f in dataset._data_dict[1][:F]])
        if stack0.ndim == 3:  # (F,H,W) grayscale -> (F,H,W,1)
            stack0 = stack0[..., None]
            stack1 = stack1[..., None]
        assert stack0.shape == stack1.shape, "channel stacks must align"
        _, H, W, C = stack0.shape
        assert H >= P and W >= P, f"patch {P} exceeds frame {H}x{W}"

        self._B, self._P, self._F, self._C = int(batch_size), P, F, C
        self._H, self._W = H, W
        self._uncorrelated = bool(dataset._uncorrelated_channels)
        self._transforms = bool(dataset._enable_transforms)
        self._from_norm_target = bool(dataset._input_from_normalized_target)
        self._tci = dataset._target_channel_idx
        w = dataset._channel_weights
        self._w0, self._w1 = float(w[0]), float(w[1])
        # scalars / (1,1,2C) target stats, as device constants via closure
        # (tiny — unlike the stacks these don't bloat the compile payload)
        mean_t = np.asarray(dataset._mean_target, np.float32).reshape(1, 1, 1, -1)
        std_t = np.asarray(dataset._std_target, np.float32).reshape(1, 1, 1, -1)
        mean_i = np.float32(dataset._mean_inp)
        std_i = np.float32(dataset._std_inp)

        self._mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # batch sharding mirrors parallel.mesh.shard_batch: fall back to
            # replication when B doesn't divide the mesh data axis (else the
            # with_sharding_constraint fails at trace time)
            if batch_size % mesh.devices.size == 0:
                self._out_shard = NamedSharding(mesh, PartitionSpec("data"))
            else:
                self._out_shard = NamedSharding(mesh, PartitionSpec())
            # replicate() handles multi-host (device_put can't target
            # non-addressable devices; it assembles via
            # make_array_from_callback) and is ONE explicit upload on
            # single-host — never a deferred bare device_put (CLAUDE.md)
            from ..parallel.mesh import replicate

            self._stack0 = replicate(stack0, mesh)
            self._stack1 = replicate(stack1, mesh)
        else:
            self._out_shard = None
            # ONE upload (explicit placement: a bare device_put would defer /
            # land on the uncommitted default and re-feed per call — CLAUDE.md)
            self._stack0 = jax.device_put(stack0, jax.devices()[0])
            self._stack1 = jax.device_put(stack1, jax.devices()[0])
        self._base_key = jax.random.PRNGKey(seed)
        self._step = 0

        B, uncorrelated, transforms = self._B, self._uncorrelated, self._transforms
        from_norm_target, tci = self._from_norm_target, self._tci
        w0, w1 = self._w0, self._w1

        def draw(stack0, stack1, key):
            kf1, kf2, kh, kw, kflip = jax.random.split(key, 5)
            f1 = jax.random.randint(kf1, (B,), 0, F)
            f2 = jax.random.randint(kf2, (B,), 0, F) if uncorrelated else f1
            # exclusive-high to match np.default_rng.integers(0, H - P)
            h0 = (jax.random.randint(kh, (B,), 0, H - P)
                  if H > P else jnp.zeros((B,), jnp.int32))
            w0_ = (jax.random.randint(kw, (B,), 0, W - P)
                   if W > P else jnp.zeros((B,), jnp.int32))

            def cut(stack, f, h, w):
                return jax.lax.dynamic_slice(stack, (f, h, w, 0), (1, P, P, C))[0]

            p1 = jax.vmap(cut, in_axes=(None, 0, 0, 0))(stack0, f1, h0, w0_)
            p2 = jax.vmap(cut, in_axes=(None, 0, 0, 0))(stack1, f2, h0, w0_)
            if transforms:
                flip = jax.random.bernoulli(kflip, 0.5, (B,))[:, None, None, None]
                p1 = jnp.where(flip, p1[:, :, ::-1, :], p1)
                p2 = jnp.where(flip, p2[:, :, ::-1, :], p2)

            target = (jnp.concatenate([p1, p2], axis=-1) - mean_t) / std_t
            if from_norm_target:
                inp = w0 * target[..., 0:C] + w1 * target[..., C:2 * C]
            else:
                inp = (w0 * p1 + w1 * p2 - mean_i) / std_i
            if tci is not None:
                target = target[..., tci:tci + 1]
            out = {"input": inp.astype(jnp.float32),
                   "target": target.astype(jnp.float32)}
            if self._out_shard is not None:
                out = jax.lax.with_sharding_constraint(
                    out, {"input": self._out_shard, "target": self._out_shard})
            return out

        # the pure draw is exposed (draw_fn/stacks/base_key) so the trainer
        # can FUSE it into the train-step jit: standalone draw() costs one
        # extra tunnel dispatch per iteration (plus an eager fold_in), which
        # measured the pool path SLOWER than the leaking host loader on the
        # 1-core host (6.89 vs 8.14 it/s, results/soak_split_pool round 4)
        self.draw_fn = draw
        self._draw_jit = jax.jit(draw)  # built once; stacks stay arguments

    # ------------------------------------------------------------------ api
    @property
    def stacks(self):
        """Device-resident (stack0, stack1) — pass as jit ARGUMENTS."""
        return self._stack0, self._stack1

    @property
    def base_key(self):
        return self._base_key

    def draw(self):
        """One device-resident {'input','target'} batch; advances the stream."""
        key = jax.random.fold_in(self._base_key, self._step)
        self._step += 1
        return self._draw_jit(self._stack0, self._stack1, key)

    def epoch(self, batches: int):
        """Generator of `batches` draws (one reference-style 'epoch')."""
        for _ in range(batches):
            yield self.draw()

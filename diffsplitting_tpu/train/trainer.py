"""DiffusionModel — the trainer/inference wrapper around process + Flax nets.

API parity with the reference's `DDPM(BaseModel)` wrapper
(/root/reference/model/model.py): create_model(opt) →  object exposing
feed_data / optimize_parameters / test / sample / set_loss /
set_new_noise_schedule / get_current_log / get_current_visuals /
save_network / load_network / print_network, plus begin_step/begin_epoch
resume bookkeeping.

TPU-native internals:
  * a single jitted train step (value_and_grad → optax.adam → apply_updates)
    with donated params/opt-state buffers; the only host↔device traffic per
    step is the input batch and the scalar loss.
  * inference = the process's `lax.scan` sampler, jitted per (shape, T);
    trajectories stay on device until pulled by get_current_visuals.
  * data parallelism: params replicated over a `Mesh`, batches sharded on the
    leading axis (parallel/mesh.py) — GSPMD inserts the gradient psum
    (replaces torch nn.DataParallel, networks.py:177-179).
  * `finetune_norm` (model.py:26-35) freezes every parameter whose path does
    not contain 'transformer' via an optax mask.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffsplitting_tpu.diffusion import build_ddpm_schedule
from diffsplitting_tpu.parallel import make_mesh, replicate, shard_batch
from diffsplitting_tpu.parallel.mesh import init_on_host
from .checkpoints import load_checkpoint, save_checkpoint
from .factory import define_generator

logger = logging.getLogger("base")


def _fingerprint(x):
    """Cheap content stamp for feed_data's re-feed check: shape + corner
    elements. numpy only — jax.Arrays are immutable (and reading their
    elements would force a device sync through the tunnel)."""
    if isinstance(x, np.ndarray) and x.size:
        flat = x.reshape(-1)
        return (x.shape, float(flat[0]), float(flat[-1]), float(flat[x.size // 2]))
    return None


def _fp_equal(a, b) -> bool:
    # NaN-containing stamps compare unequal → harmless extra re-feed
    la = jax.tree_util.tree_leaves(a, is_leaf=lambda t: isinstance(t, tuple))
    lb = jax.tree_util.tree_leaves(b, is_leaf=lambda t: isinstance(t, tuple))
    return len(la) == len(lb) and all(x == y for x, y in zip(la, lb))


def create_model(opt, **kwargs) -> "DiffusionModel":
    m = DiffusionModel(opt, **kwargs)
    logger.info("Model [%s] is created.", m.__class__.__name__)
    return m


class DiffusionModel:
    def __init__(self, opt, mesh=None, seed: int = 0, dtype=None, use_mesh: bool = True):
        self.opt = opt
        self.which = opt["model"]["which_model_G"]
        self.process, self.nets = define_generator(opt, dtype=dtype)
        self.base_rng = jax.random.PRNGKey(seed)
        self._rng_counter = 0
        # dropout-mask RNG impl (see _dropout_key): rbg unless opted out
        self._dropout_prng = str(
            (opt.get("train") or {}).get("dropout_prng") or "rbg")

        self.mesh = mesh if mesh is not None else (make_mesh() if use_mesh else None)

        # ZeRO-1 / FSDP opt-ins (parallel/zero.py): shard Adam moments (and
        # with 'fsdp', the params themselves) over the 'data' axis instead of
        # replicating — GSPMD inserts the gather/scatter collectives
        train_opt = opt.get("train") or {}
        self.zero_opt_state = bool((train_opt.get("optimizer") or {}).get("zero"))
        self.fsdp_params = (opt["model"].get("param_sharding") == "fsdp")

        # ---------------- params init
        model_opt = opt["model"]
        in_ch = model_opt["unet"]["in_channel"]
        size = model_opt["diffusion"]["image_size"]
        x0 = jnp.zeros((1, size, size, in_ch), jnp.float32)
        t0 = jnp.zeros((1,), jnp.float32)
        params = {}
        for i, (role, net) in enumerate(self.nets.items()):
            key = jax.random.fold_in(self.base_rng, i)
            # init on host CPU: orthogonal-init QR is pathologically slow on TPU
            params[role] = init_on_host(net.init, key, x0, t0)["params"]
        if self.which == "joint_indi":
            from diffsplitting_tpu.diffusion import JointInDIProcess

            params["extra"] = JointInDIProcess.init_extra_params()
        self.params = self._place_params(params)

        # ---------------- optimizer
        self.phase = opt.get("phase", "train")
        from diffsplitting_tpu.train.optim import make_lr, maybe_accumulate

        opt_cfg = (opt["train"].get("optimizer") or {}) if opt.get("train") else {}
        lr = make_lr(
            float(opt_cfg.get("lr") or 1e-4),
            opt_cfg.get("schedule"),
            int(opt["train"].get("n_iter") or 0) if opt.get("train") else 0,
        )
        if model_opt.get("finetune_norm"):
            # freeze every param whose path lacks 'transformer' (model.py:26-35)
            def labels(p):
                lab = jax.tree_util.tree_map_with_path(
                    lambda path, _: "train"
                    if any("transformer" in str(k) for k in path)
                    else "freeze",
                    p,
                )
                if not any(
                    l == "train" for l in jax.tree_util.tree_leaves(lab)
                ):
                    # the reference fails loudly here too (torch Adam with an
                    # empty param list raises); a silent all-frozen run would
                    # burn the training budget doing nothing
                    raise ValueError(
                        "finetune_norm matched no trainable parameters "
                        "(no param path contains 'transformer')"
                    )
                return lab

            tx = optax.multi_transform(
                {"train": optax.adam(lr), "freeze": optax.set_to_zero()}, labels
            )
        else:
            tx = optax.adam(lr)
        # opt-in gradient clipping (train.optimizer.grad_clip: float|"auto");
        # OFF by default for reference parity (bare Adam, model.py:39-40) —
        # see train/clipping.py for when/why to enable it
        from diffsplitting_tpu.train.clipping import maybe_clip

        tx = maybe_clip(tx, opt_cfg)
        # gradient accumulation wraps the WHOLE chain so clipping acts on
        # the k-step mean gradient at update time (train/optim.py)
        tx = maybe_accumulate(tx, opt_cfg)
        self.tx = tx
        # jit the optimizer-state init: eagerly it dispatches one zeros_like
        # per param leaf, which is pathological through a remote-TPU tunnel
        self.opt_state = self._place_opt_state(jax.jit(self.tx.init)(self.params))

        # ---------------- EMA (opt-in; the reference declares an
        # ema_scheduler config block but never reads it — enable with
        # train.ema_scheduler.enabled: true)
        # ---------------- DeepCache serving mode (opt-in; exact chain is the
        # default). Config: model.deepcache: {interval: k, depth: d} — full
        # UNet refresh every k-th reverse step, shallow levels only in
        # between (diffusion/deepcache.py). interval=1 reproduces the exact
        # chain; the measured sweet spot on v5e is (5,1): 1.58× (BENCH_NOTES).
        dc_opt = opt["model"].get("deepcache") or {}
        self.deepcache = None
        if dc_opt.get("interval"):
            iv = dc_opt["interval"]
            self.deepcache = (iv if iv == "auto" else int(iv),
                              int(dc_opt.get("depth") or 1))
        self._warned_dc_continuous = False

        # ---------------- sliding-window Picard serving mode (opt-in;
        # latency lever for LOW-BATCH requests: W consecutive timesteps
        # batch as one (W·B) forward, advance is tolerance-gated —
        # diffusion/parallel_sampling.py. Config: model.sliding_window:
        # {window: W, tau: x}; tau=0 is the frozen-noise sequential chain.
        sw_opt = opt["model"].get("sliding_window") or {}
        self.sliding_window = None
        self.last_sliding_sweeps = None
        if sw_opt.get("window"):
            _tau = sw_opt.get("tau")
            self.sliding_window = (int(sw_opt["window"]),
                                   0.1 if _tau is None else float(_tau))

        # ---------------- respaced DDIM serving mode (opt-in; the largest
        # serving lever for long ddpm/sr3 chains: S ≪ T steps through the
        # same trained net — diffusion/ddim.py. Config: model.ddim:
        # {steps: S, eta: η}; η=0 deterministic (default), η=1 over the
        # full sequence reproduces the ancestral chain's math.
        dd_opt = opt["model"].get("ddim") or {}
        self.ddim = None
        if dd_opt.get("steps"):
            _eta = dd_opt.get("eta")
            self.ddim = (int(dd_opt["steps"]),
                         0.0 if _eta is None else float(_eta))
        self._warned_sw_continuous = False
        self._warned_dd_continuous = False

        # ---------------- W8A8 quantized serving mode (opt-in; v5e's MXU
        # runs s8×s8→s32 at 2× the bf16 rate — results/probe_int8.json.
        # Config: model.quant: {bits: 8, calib: K, updown: bool, clip: r} —
        # serving forwards route through the int8 walker
        # (models/quant_unet.py) after a one-time activation-scale
        # calibration. Approximate (like DeepCache); exact chain default.
        q_opt = opt["model"].get("quant") or {}
        self.quant = None
        if q_opt.get("bits"):
            if int(q_opt["bits"]) != 8:
                raise ValueError("model.quant.bits: only 8 is supported")
            self.quant = {
                "calib": int(q_opt.get("calib") or 8),
                "updown": bool(q_opt.get("updown", False)),
                "shortcut": bool(q_opt.get("shortcut", False)),
                "attn": bool(q_opt.get("attn", False)),
                "clip": float(q_opt.get("clip") or 1.0),
            }
        self._quant_trees: Dict = {}  # kind -> [(src_params, qtree), ...]
        self._cached_nets: Dict = {}  # (role, depth) -> CachedUNet

        # model.sampler_chunk: K>0 runs conditional sr3/ddpm test() as
        # ⌈T/K⌉ jitted K-step scan chunks + host loop — bit-identical to the
        # single scan, for shapes whose full-T program breaks the compiler
        # (the 512²×2000 chain kernel-faults the tunnel's TPU worker)
        self.sampler_chunk = int(opt["model"].get("sampler_chunk") or 0)

        ema_opt = (opt.get("train") or {}).get("ema_scheduler") or {}
        self.use_ema = bool(ema_opt.get("enabled", False))
        self.ema_decay = float(ema_opt.get("ema_decay", 0.9999))
        self.ema_start = int(ema_opt.get("step_start_ema", 5000))
        self.ema_params = None  # materialized after load_network (resume-safe)
        self.global_step = 0

        # ---------------- schedules + resume
        self.log_dict = OrderedDict()
        self.data = None
        self.prediction = None
        self.begin_step = 0
        self.begin_epoch = 0
        self.schedule_phase = None
        self.current_sched = None  # DDPMSchedule for ddpm/sr3
        self.current_T = None      # int for indi/joint_indi
        self._train_step = None
        self._pool = None  # fused device-pool (attach_pool)
        self._infer_cache: Dict = {}

        self.set_new_noise_schedule(opt["model"]["beta_schedule"]["train"], "train")
        self.load_network()
        if self.use_ema and self.ema_params is None:
            # seeded from the (possibly restored) params, AFTER load_network
            self.ema_params = jax.tree_util.tree_map(jnp.array, self.params)

    # ------------------------------------------------------------- placement
    def _place_params(self, tree):
        if self.fsdp_params:
            from diffsplitting_tpu.parallel.zero import shard_tree_zero

            return shard_tree_zero(tree, self.mesh)
        return replicate(tree, self.mesh)

    def _place_opt_state(self, tree):
        if self.zero_opt_state or self.fsdp_params:
            from diffsplitting_tpu.parallel.zero import shard_tree_zero

            return shard_tree_zero(tree, self.mesh)
        return replicate(tree, self.mesh)

    # ------------------------------------------------------------- rng
    def _next_rng(self):
        self._rng_counter += 1
        return jax.random.fold_in(self.base_rng, 0x5EED + self._rng_counter)

    # ------------------------------------------------------------- schedules
    def set_new_noise_schedule(self, schedule_opt, schedule_phase="train"):
        """Switch train/val schedule (reference model.py:93-100).

        ddpm/sr3 rebuild the schedule pytree; InDI variants only track the
        step count (indi.py:46-47).
        """
        if self.schedule_phase == schedule_phase:
            return
        self.schedule_phase = schedule_phase
        if self.which in ("ddpm", "sr3"):
            self.current_sched = build_ddpm_schedule(schedule_opt)
        else:
            self.current_T = int(schedule_opt["n_timestep"])

    def set_loss(self, device=None):
        """No-op: loss fns are pure and built in the process (API parity)."""

    # ------------------------------------------------------------- data
    def feed_data(self, data):
        """Host batch (numpy, NHWC) -> device, batch-sharded over the mesh.

        Re-feeding the IDENTICAL array objects (e.g. a fixed overfit batch
        every iteration) skips the device transfer: through the axon TPU
        tunnel every host→device put leaks its payload in host RAM (measured
        ~3.5MB/iter on the 40k-iter quality run → host OOM at 130GB). The
        previous host arrays are retained while cached so ids can't be
        recycled by the allocator.

        Contract: arrays must NOT be mutated in place after feeding — a
        loader that refills one preallocated buffer per step must pass fresh
        arrays (all in-repo loaders do). As a backstop, a cheap content
        fingerprint (corner elements + shape) is checked alongside id(), so
        an in-place refill of the same buffer re-feeds instead of silently
        training on the stale batch.
        """
        key = jax.tree_util.tree_map(id, data)
        fp = jax.tree_util.tree_map(_fingerprint, data)
        if (
            getattr(self, "_fed_ids", None) == key
            and self.data is not None
            and _fp_equal(self._fed_fp, fp)
        ):
            return
        self.data = shard_batch(data, self.mesh)
        self._fed_ids = key
        self._fed_fp = fp
        self._fed_host_ref = data  # pin: id() stays unique while cached

    # ------------------------------------------------------------- training
    def _apply(self, role, params, x, t, train=False, rng=None):
        net = self.nets[role]
        if not train:
            # W8A8 param trees (model.quant) carry int8 kernels + scales at
            # quantized conv sites — dispatched on the (static) tree
            # structure, so one cached sampler serves both precisions
            from diffsplitting_tpu.models.quant_unet import is_quantized_tree

            if is_quantized_tree(params[role]):
                from diffsplitting_tpu.models.quant_unet import quant_unet_apply

                return quant_unet_apply(net, {"params": params[role]}, x, t)
            # apply_unet is the plain flax forward unless DSP_FUSED=1 opts in
            # to the Pallas conv+GN path — which is equality-tested but was
            # MEASURED SLOWER end-to-end on v5e (XLA already fuses conv+GN;
            # BENCH_NOTES round 2, experimental/fused_forward.py)
            from diffsplitting_tpu.models import apply_unet

            return apply_unet(net, {"params": params[role]}, x, t)
        rngs = {"dropout": self._dropout_key(rng)} if rng is not None else None
        return net.apply({"params": params[role]}, x, t, deterministic=False, rngs=rngs)

    def _dropout_key(self, rng):
        """Dropout-mask stream for the train forward.

        Threefry generates mask bits per element on the VPU — measured 31%
        of the flagship 128² train step (results/bench_train_chip.jsonl:
        31.9% → 46.3% MFU with dropout off). Deriving the dropout stream as
        an `rbg` key (TPU hardware RNG) recovers most of it (41.7% MFU with
        dropout ON) while every other stream (diffusion t/noise sampling,
        init) stays threefry. Opt-out: train.dropout_prng="threefry".
        """
        if self._dropout_prng != "rbg":
            return rng
        bits = rng if jnp.issubdtype(rng.dtype, jnp.integer) else (
            jax.random.key_data(rng))
        # derive exactly 4 uint32 words whatever the ambient impl's key size
        # is (threefry: 2 words; rbg — e.g. under a global --prng rbg run —
        # already 4: blind duplication would build an invalid 8-word key)
        bits = bits.reshape(-1)
        words = jnp.concatenate([bits] * 4)[:4]
        return jax.random.wrap_key_data(words.astype(jnp.uint32), impl="rbg")

    def _cached_apply(self, role, depth, params, xin, lvl, deep=None):
        """DeepCache forward with the same structure dispatch as `_apply`:
        W8A8 param trees (model.quant) route through the cache-split walker
        (models/quant_unet.py cached_unet_apply — int8 MXU convs in BOTH the
        full refresh and the shallow pass), plain trees through the flax
        re-assembly (models/deepcache.py CachedUNet). Identical
        `(out, deep)` contract either way, so every cached sampler in
        diffusion/deepcache.py serves both precisions unchanged."""
        pr = params[role]
        from diffsplitting_tpu.models.quant_unet import is_quantized_tree

        if is_quantized_tree(pr):
            from diffsplitting_tpu.models.quant_unet import cached_unet_apply

            return cached_unet_apply(self.nets[role], {"params": pr}, xin,
                                     lvl, deep, cache_depth=depth)
        cnet = self._cached_nets.get((role, depth))
        if cnet is None:
            from diffsplitting_tpu.models.deepcache import CachedUNet

            cnet = CachedUNet.from_unet(self.nets[role], depth)
            self._cached_nets[(role, depth)] = cnet
        if deep is None:
            return cnet.apply({"params": pr}, xin, lvl)
        return cnet.apply({"params": pr}, xin, lvl, deep)

    def _build_train_step(self):
        process, which = self.process, self.which

        def loss_fn(params, rng, batch, sched):
            d_rng, p_rng = jax.random.split(rng)
            if which == "joint_indi":
                r1, r2 = jax.random.split(d_rng)
                d1 = lambda x, t: self._apply("net_ch1", params, x, t, train=True, rng=r1)
                d2 = lambda x, t: self._apply("net_ch2", params, x, t, train=True, rng=r2)
                loss, logs = process.p_losses(d1, d2, p_rng, batch, num_timesteps=sched)
                from diffsplitting_tpu.diffusion import JointInDIProcess

                logs = dict(logs, **JointInDIProcess.extra_param_logs(params["extra"]))
            elif which == "indi":
                d = lambda x, t: self._apply("net", params, x, t, train=True, rng=d_rng)
                loss = process.p_losses(d, p_rng, batch, num_timesteps=sched)
                logs = {}
            else:  # ddpm / sr3
                d = lambda x, t: self._apply("net", params, x, t, train=True, rng=d_rng)
                loss = process.p_losses(d, sched, p_rng, batch)
                logs = {}
            return loss, logs

        use_ema, decay, start = self.use_ema, self.ema_decay, self.ema_start

        # ZeRO-1/FSDP: pin output shardings so GSPMD can't drift placements
        # across steps (e.g. silently re-shard replicated params, or gather
        # sharded Adam moments back to replicated)
        mesh, zero, fsdp = self.mesh, self.zero_opt_state, self.fsdp_params

        def _constrain(tree, sharded):
            if mesh is None or not (zero or fsdp):
                return tree
            from jax.sharding import NamedSharding, PartitionSpec as P

            from diffsplitting_tpu.parallel.zero import zero_spec

            n = mesh.shape["data"]

            def c(x):
                spec = zero_spec(x.shape, n) if sharded else P()
                return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

            return jax.tree_util.tree_map(c, tree)

        # The per-step training key is derived INSIDE the jit from the base
        # key + counter (identical fold_in math to the old eager _next_rng):
        # an eager fold_in per iteration is one extra tunnel RPC in the hot
        # loop. Same for the fused pool draw below.
        base_rng = self.base_rng
        pool = self._pool

        def step(params, opt_state, ema, step_no, rng_counter, batch, sched):
            rng = jax.random.fold_in(base_rng, 0x5EED + rng_counter)
            if pool is not None:
                # batch == (stack0, stack1): draw the patch batch on device
                # as part of the train step — zero extra dispatches/iter.
                # Keyed by global step (resume-stable); the standalone
                # pool.draw() stream is fold_in(base, draws-so-far) instead.
                dkey = jax.random.fold_in(pool.base_key, step_no)
                batch = pool.draw_fn(batch[0], batch[1], dkey)
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, rng, batch, sched
            )
            # pre-clip global grad norm, logged every step: the 512² late-run
            # loss spikes were only attributable post-hoc because nothing
            # recorded the gradient scale (one fused reduction — free)
            logs = dict(logs, grad_norm=optax.global_norm(grads))
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = _constrain(params, sharded=fsdp)
            opt_state = _constrain(opt_state, sharded=True)
            if use_ema:
                # before step_start_ema: track params exactly; after: decay
                d = jnp.where(step_no < start, 0.0, decay)
                ema = jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p, ema, params
                )
                ema = _constrain(ema, sharded=fsdp)
            return params, opt_state, ema, loss, logs

        static = (6,) if which in ("indi", "joint_indi") else ()
        return jax.jit(step, donate_argnums=(0, 1, 2), static_argnums=static)

    def attach_pool(self, pool):
        """Fuse a DevicePatchPool into the train step: every batch is drawn
        on device INSIDE the step jit (no per-iter feed_data, no standalone
        draw dispatch, no eager fold_in — each of those is a tunnel RPC).
        Pass None to detach. optimize_parameters() then ignores feed_data."""
        self._pool = pool
        self._train_step = None  # rebuild with the fused draw

    def optimize_parameters(self):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        sched = self.current_sched if self.which in ("ddpm", "sr3") else self.current_T
        self._rng_counter += 1  # key derived in-jit from this counter
        self.global_step += 1
        self.params, self.opt_state, self.ema_params, loss, logs = self._train_step(
            self.params,
            self.opt_state,
            self.ema_params if self.use_ema else {},
            self.global_step,
            self._rng_counter,
            self._pool.stacks if self._pool is not None else self.data,
            sched,
        )
        if not self.use_ema:
            self.ema_params = None
        # keep device scalars here — converting would force a host sync every
        # step; get_current_log() materializes floats at read time (print_freq)
        self.log_dict["l_pix"] = loss
        for k, v in logs.items():
            self.log_dict[k] = v

    # ------------------------------------------------------------- inference
    def _inference_params(self, params):
        """Opt-in (DSP_PRECAST=1): pre-cast Conv/Dense weights to the nets'
        bf16 compute dtype outside the sampling scan (bit-identical — flax
        does the same rounding per step; models/precision.py). MEASURED
        NEGATIVE on v5e (BENCH_NOTES round 2: XLA already hoists the converts
        and bf16 loop-carried weights lose 1–8%), so default OFF."""
        import os

        if os.environ.get("DSP_PRECAST") == "1" and any(
            getattr(n, "dtype", None) == jnp.bfloat16 for n in self.nets.values()
        ):
            from diffsplitting_tpu.models import cast_unet_params_for_inference

            return cast_unet_params_for_inference(params)
        return params

    def set_deepcache(self, interval, depth: int = 1):
        """Toggle DeepCache serving at runtime (CLI surfaces call this).

        `interval=None` or `0` restores the exact chain; any interval ≥ 1
        routes test()/sample() through the cached sampler; `"auto"` picks
        the interval from the chain length (see _dc_interval). Clears the
        jitted-sampler cache so the next test() picks up the change.
        """
        if interval:
            iv = interval if interval == "auto" else int(interval)
            self.deepcache = (iv, int(depth))
        else:
            self.deepcache = None
        self._infer_cache.clear()

    def set_sliding_window(self, window, tau: float = 0.1):
        """Toggle sliding-window Picard serving at runtime (CLI surfaces).

        `window=None`/`0` restores the default sampler; window ≥ 1 routes
        test()/sample() through the windowed parallel sampler
        (parallel_sampling.py). tau=0 reproduces the frozen-noise
        sequential chain exactly; tau>0 advances past converged steps.
        Mutually exclusive with DeepCache (different chain semantics).
        """
        self.sliding_window = (int(window), float(tau)) if window else None
        self._infer_cache.clear()

    def _sliding_window_active(self, kind, continuous) -> bool:
        if self.sliding_window is None or kind not in ("test", "sample"):
            return False
        if continuous:
            # windowed loop keeps no trajectory frames
            if not self._warned_sw_continuous:
                logger.warning(
                    "sliding_window ignores continuous=True sampling — "
                    "running the exact chain for trajectory requests"
                )
                self._warned_sw_continuous = True
            return False
        if self.which in ("ddpm", "sr3") and not self.process.conditional:
            return kind == "sample"
        return kind == "test"

    def set_ddim(self, steps, eta: float = 0.0):
        """Toggle respaced DDIM serving at runtime (CLI surfaces).

        `steps=None`/`0` restores the exact ancestral chain; steps=S runs
        the reverse process as S respaced DDIM steps (diffusion/ddim.py) —
        ddpm/sr3 families only (InDI natively supports any step budget via
        num_timesteps). Composes with DeepCache (cached respaced chain,
        interval over the S respaced steps); mutually exclusive with
        sliding-window.
        """
        self.ddim = (int(steps), float(eta)) if steps else None
        self._infer_cache.clear()

    def _ddim_active(self, kind, continuous) -> bool:
        if self.ddim is None or kind not in ("test", "sample"):
            return False
        if continuous:
            # DDIM loop keeps no trajectory frames
            if not self._warned_dd_continuous:
                logger.warning(
                    "ddim ignores continuous=True sampling — running the "
                    "exact chain for trajectory requests"
                )
                self._warned_dd_continuous = True
            return False
        if self.which not in ("ddpm", "sr3"):
            return False  # InDI respaces natively via num_timesteps
        if not self.process.conditional:
            return kind == "sample"
        return kind == "test"

    def set_quant(self, bits, calib: int = 8, updown: bool = False,
                  shortcut: bool = False, attn: bool = False,
                  clip: float = 1.0):
        """Toggle W8A8 quantized serving at runtime (CLI surfaces).

        `bits=None`/`0` restores the bf16/f32 exact forward; bits=8 routes
        test()/sample() denoiser forwards through the int8 MXU walker
        (models/quant_unet.py) after a one-time activation-scale calibration
        on the current serving inputs. `updown`/`shortcut` extend coverage
        to the Down/Upsample and 1×1 shortcut convs, `attn` to the
        SelfAttention QKV/proj 1×1 convs; `clip` scales the
        calibrated activation range (e.g. 0.9 clips the top 10%).
        Composes with DeepCache (the cache-split walker serves int8 full
        AND shallow passes, `_cached_apply`), DDIM, chunked sampling and
        sliding-window.
        """
        if bits:
            if int(bits) != 8:
                raise ValueError("set_quant: only 8-bit is supported")
            self.quant = {"calib": int(calib), "updown": bool(updown),
                          "shortcut": bool(shortcut), "attn": bool(attn),
                          "clip": float(clip)}
        else:
            self.quant = None
        self._quant_trees.clear()
        self._infer_cache.clear()

    def _calib_inputs(self, role: str, kind: str):
        """Build the (net_in, t) calibration batch for one denoiser: rows
        span the reverse chain's timesteps at the serving spatial shape.
        Deterministic (fixed PRNG) so repeated serving sessions quantize
        identically."""
        K = max(2, self.quant["calib"])
        rng = jax.random.PRNGKey(0xCA11B)
        ch = self.opt["model"]["diffusion"]["channels"]
        size = self.opt["model"]["diffusion"]["image_size"]

        cond = None
        if self.data is not None and "input" in self.data:
            cond = jnp.asarray(self.data["input"][:1], jnp.float32)

        if self.which in ("ddpm", "sr3"):
            sched = self.current_sched
            T = sched.num_timesteps
            ts = np.unique(np.linspace(0, T - 1, K).astype(np.int64))
            gam = np.asarray(sched.sqrt_alphas_cumprod_prev)[ts + 1]  # (K,)
            use_cond = self.process.conditional and kind == "test" and cond is not None
            if use_cond:
                h, w = cond.shape[1], cond.shape[2]
            else:
                h = w = size
            # x0 proxy: the conditioner when it matches the target channels
            # (SR3: the upsampled LR is an excellent stand-in), else zeros —
            # GroupNorm ahead of every quantized site makes the absmax
            # insensitive to the exact proxy
            if use_cond and cond.shape[-1] == ch:
                x0p = cond
            else:
                x0p = jnp.zeros((1, h, w, ch), jnp.float32)
            eps = jax.random.normal(rng, (len(ts), h, w, ch), jnp.float32)
            g = jnp.asarray(gam, jnp.float32)[:, None, None, None]
            x_t = g * x0p + jnp.sqrt(1.0 - g * g) * eps
            if use_cond:
                net_in = jnp.concatenate(
                    [jnp.tile(cond, (len(ts), 1, 1, 1)), x_t], axis=-1)
            else:
                net_in = x_t
            # sr3 nets see the continuous noise level, ddpm the (f32) step
            tvec = (jnp.asarray(gam, jnp.float32) if self.which == "sr3"
                    else jnp.asarray(ts, jnp.float32))
            return net_in, tvec

        # indi / joint_indi: the net walks bridge states x_t from t_start→0;
        # calibrate on the (channel-tiled, bridge-noised) serving input at a
        # spread of t values — mirroring inference's input construction
        # (indi.py:170-173: x_t = tile(x_in) + ε·(t·e))
        in_ch = self.nets[role].in_channel
        if cond is None:
            cond = jnp.zeros((1, size, size, in_ch), jnp.float32)
        if cond.shape[-1] != in_ch:
            assert in_ch % cond.shape[-1] == 0
            cond = jnp.tile(cond, (1, 1, 1, in_ch // cond.shape[-1]))
        tvals = np.linspace(1.0 / K, 1.0, K).astype(np.float32)
        proc = self.process
        if self.which == "joint_indi":
            proc = proc.indi1 if role == "net_ch1" else proc.indi2
        noise_scale = jnp.asarray(
            [float(proc.get_t_times_e(jnp.float32(t))) for t in tvals],
            jnp.float32)[:, None, None, None]
        eps = jax.random.normal(rng, (K,) + cond.shape[1:], jnp.float32)
        net_in = cond + eps * noise_scale
        return net_in, jnp.asarray(tvals)

    def _build_quant_tree(self, params, kind: str):
        """Calibrate + quantize every denoiser role; returns the placed
        W8A8 tree (models/quant_unet.py). One forward compile per role."""
        from diffsplitting_tpu.models.quant_unet import (
            collect_act_absmax,
            iter_quant_sites,
            quantize_unet_params,
        )

        q = self.quant
        host = jax.device_get(params)
        out = {}
        for role, net in self.nets.items():
            net_in, tvec = self._calib_inputs(role, kind)
            stats_fn = jax.jit(
                lambda v, xx, tt, _net=net: collect_act_absmax(
                    _net, v, xx, tt)[1]
            )
            stats = jax.device_get(
                stats_fn({"params": params[role]}, net_in, tvec))
            out[role] = quantize_unet_params(
                host[role], {k: float(v) for k, v in stats.items()},
                updown=q["updown"], shortcut=q["shortcut"],
                attn=q.get("attn", False), clip_ratio=q["clip"],
            )
            logger.info(
                "W8A8: quantized %s (%d int8 conv sites, calib batch %d)",
                role,
                sum(1 for _ in iter_quant_sites(out[role])),
                net_in.shape[0],
            )
        for k, v in host.items():
            if k not in out:  # joint_indi 'extra' scalars
                out[k] = v
        return replicate(out, self.mesh)

    def _maybe_quantize(self, params, kind: str):
        if self.quant is None or kind not in ("test", "sample"):
            return params
        for src, qt in self._quant_trees.get(kind, []):
            if src is params:
                return qt
        qt = self._build_quant_tree(params, kind)
        self._quant_trees.setdefault(kind, []).append((params, qt))
        return qt

    def _serving_params(self, params, kind: str):
        """Final param transform before a serving call: W8A8 when
        model.quant is set (replaces the opt-in precast — incompatible
        trees), else the precast hook."""
        if self.quant is not None and kind in ("test", "sample"):
            return self._maybe_quantize(params, kind)
        return self._inference_params(params)

    def _dc_interval(self, T: int) -> int:
        """Resolve the refresh interval for a T-step chain.

        'auto' = clamp(round(0.4·T), 1, 5): the round-3 schedule study
        (BENCH_NOTES) showed fidelity tracks the refresh SPAN, not the
        interval — ≥45 dB holds at span ≤ ~2/5 of the chain (N=10→4,
        N=25/50→5) and the 2000-step chains measured best at 5.
        """
        iv, _ = self.deepcache
        if iv == "auto":
            return max(1, min(5, round(0.4 * T)))
        return iv

    def _deepcache_active(self, kind, continuous) -> bool:
        if self.deepcache is None or kind not in ("test", "sample"):
            return False
        if continuous:
            # the cached loops return only the final frame; trajectory
            # capture would defeat the cache's scan-carry design
            if not self._warned_dc_continuous:
                logger.warning(
                    "deepcache ignores continuous=True sampling — "
                    "running the exact chain for trajectory requests"
                )
                self._warned_dc_continuous = True
            return False
        if kind == "sample":
            # unconditional generation (sample.py): ddpm/sr3 with no condition
            return self.which in ("ddpm", "sr3") and not self.process.conditional
        if self.which in ("ddpm", "sr3") and not self.process.conditional:
            return False  # unconditional models serve through sample()
        return True

    def _infer_fn(self, kind, shape, continuous, extra=None, clip_denoised=True):
        """jitted sampler, cached per (kind, shape, schedule, continuous, clip)."""
        T_key = self.current_T if self.which in ("indi", "joint_indi") else (
            self.current_sched.num_timesteps
        )
        use_dc = self._deepcache_active(kind, continuous)
        use_sw = self._sliding_window_active(kind, continuous)
        use_dd = self._ddim_active(kind, continuous)
        if use_sw and (use_dc or use_dd):
            raise ValueError(
                "model.sliding_window is mutually exclusive with "
                "model.deepcache / model.ddim (different chain semantics) — "
                "unset all but one (set_deepcache(None) / "
                "set_sliding_window(None) / set_ddim(None)). DeepCache and "
                "DDIM DO compose (cached respaced chain)."
            )
        chunkable = (
            self.sampler_chunk > 0 and not continuous and kind == "test"
            and self.which in ("ddpm", "sr3") and self.process.conditional
        )
        use_chunk = chunkable and not use_dc and not use_sw and not use_dd
        # DDIM composes with chunking the same way DeepCache does (the
        # 512²-class chains ride ⌈S/K⌉ jitted chunks) — but only when the
        # respaced chain actually exceeds one chunk; at S ≤ K the single
        # cached-jit scan is the same program without host-loop overhead
        dd_chunk = (use_dd and chunkable
                    and min(self.ddim[0], T_key) > self.sampler_chunk)
        key = (kind, shape, self.schedule_phase, T_key, continuous, extra,
               clip_denoised, self.deepcache if use_dc else None,
               self.sampler_chunk
               if (use_chunk or ((use_dc and chunkable) or dd_chunk)) else 0,
               self.sliding_window if use_sw else None,
               self.ddim if use_dd else None)
        if key in self._infer_cache:
            return self._infer_cache[key]
        if use_dd and use_dc:
            fn = self._build_ddim_deepcache_fn(clip_denoised, kind=kind,
                                               shape=shape, chunked=dd_chunk)
            self._infer_cache[key] = fn
            return fn
        if use_dd:
            fn = self._build_ddim_fn(clip_denoised, kind=kind, shape=shape,
                                     chunked=dd_chunk)
            self._infer_cache[key] = fn
            return fn
        if use_sw:
            fn = self._build_sliding_window_fn(extra, clip_denoised,
                                               kind=kind, shape=shape)
            self._infer_cache[key] = fn
            return fn
        if use_dc:
            if chunkable:
                # DeepCache + chunked scans compose: the cache rides the
                # chunk carry (512²-class chains, cached_p_sample_loop_chunked)
                fn = self._build_deepcache_chunked_fn(clip_denoised)
            else:
                fn = jax.jit(self._build_deepcache_fn(
                    extra, clip_denoised, kind=kind, shape=shape))
            self._infer_cache[key] = fn
            return fn

        process, which = self.process, self.which

        if use_chunk:
            from diffsplitting_tpu.diffusion.common import ChunkRunner

            sched, chunk = self.current_sched, self.sampler_chunk
            runner = ChunkRunner()  # one compile for this cached fn's lifetime

            def chunked_fn(params, x_in, rng):
                # host loop over jitted K-step scans — NOT wrapped in an
                # outer jit; params/cond stay jit args inside
                da = lambda p, xx, tt: self._apply("net", p, xx, tt)  # noqa: E731
                return process.p_sample_loop_chunked(
                    da, params, sched, rng, x_in, chunk,
                    clip_denoised=clip_denoised, runner=runner,
                )

            self._infer_cache[key] = chunked_fn
            return chunked_fn

        if which in ("indi", "joint_indi"):
            T = self.current_T
            t_start = 0.5 if which == "joint_indi" else 1.0
            if extra is not None:
                t_start = extra

            def fn(params, x_in, rng):
                if which == "joint_indi":
                    d1 = lambda x, t: self._apply("net_ch1", params, x, t)
                    d2 = lambda x, t: self._apply("net_ch2", params, x, t)
                    return process.inference(
                        d1, d2, rng, x_in, continuous=continuous,
                        num_timesteps=T, t_float_start=t_start,
                    )
                d = lambda x, t: self._apply("net", params, x, t)
                return process.inference(
                    d, rng, x_in, continuous=continuous,
                    num_timesteps=T, t_float_start=t_start,
                )

        elif kind == "sample":  # unconditional generation
            sched = self.current_sched
            batch_size = shape[0]

            def fn(params, x_in, rng):
                d = lambda x, t: self._apply("net", params, x, t)
                return process.sample(d, sched, rng, batch_size=batch_size, continuous=continuous)

        else:  # conditional reverse diffusion on the input
            sched = self.current_sched

            def fn(params, x_in, rng):
                d = lambda x, t: self._apply("net", params, x, t)
                return process.p_sample_loop(
                    d, sched, rng, x_in, clip_denoised=clip_denoised,
                    continuous=continuous,
                )

        jfn = jax.jit(fn)
        self._infer_cache[key] = jfn
        return jfn

    def _build_deepcache_fn(self, extra, clip_denoised, kind="test", shape=None):
        """Cached-sampler variant of _infer_fn's closures: the 1.58×
        measured serving win (BENCH_NOTES), reachable from config/CLI.
        kind='sample' builds the unconditional-generation chain over the
        static `shape` instead of a condition input.

        Params stay jit ARGUMENTS (EMA weights work; closure-captured trees
        also blow the tunnel's remote-compile payload limit, CLAUDE.md)."""
        depth = self.deepcache[1]
        interval = self._dc_interval(
            self.current_T if self.which in ("indi", "joint_indi")
            else self.current_sched.num_timesteps
        )
        process, which = self.process, self.which

        def appliers(role):
            def full(params):
                return lambda xin, lvl: self._cached_apply(
                    role, depth, params, xin, lvl)

            def shallow(params):
                return lambda xin, lvl, deep: self._cached_apply(
                    role, depth, params, xin, lvl, deep)

            return full, shallow

        if which in ("indi", "joint_indi"):
            from diffsplitting_tpu.diffusion.deepcache import (
                cached_indi_inference,
                cached_joint_indi_inference,
            )

            T = self.current_T
            t_start = extra if extra is not None else (
                0.5 if which == "joint_indi" else 1.0
            )
            if which == "joint_indi":
                f1, s1 = appliers("net_ch1")
                f2, s2 = appliers("net_ch2")

                def fn(params, x_in, rng):
                    return cached_joint_indi_inference(
                        process, rng, x_in,
                        (f1(params), s1(params)), (f2(params), s2(params)),
                        interval=interval, num_timesteps=T,
                        t_float_start=t_start,
                    )
            else:
                f, s = appliers("net")

                def fn(params, x_in, rng):
                    return cached_indi_inference(
                        process, rng, x_in, f(params), s(params),
                        interval=interval, num_timesteps=T,
                        t_float_start=t_start,
                    )
        else:  # sr3/ddpm reverse chain (conditional test or unconditional sample)
            from diffsplitting_tpu.diffusion.deepcache import cached_p_sample_loop

            sched = self.current_sched
            f, s = appliers("net")
            if kind == "sample":
                def fn(params, x_in, rng):
                    return cached_p_sample_loop(
                        process, sched, rng, shape, f(params), s(params),
                        interval=interval, clip_denoised=clip_denoised,
                    )
            else:
                def fn(params, x_in, rng):
                    return cached_p_sample_loop(
                        process, sched, rng, x_in, f(params), s(params),
                        interval=interval, clip_denoised=clip_denoised,
                    )

        return fn

    def _build_deepcache_chunked_fn(self, clip_denoised):
        """Cached sampler over K-step scan chunks (conditional sr3/ddpm):
        model.deepcache × model.sampler_chunk. Host loop of jitted chunks;
        params stay jit arguments of every chunk."""
        from diffsplitting_tpu.diffusion.deepcache import (
            cached_p_sample_loop_chunked,
        )

        from diffsplitting_tpu.diffusion.common import ChunkRunner

        depth = self.deepcache[1]
        process, sched, chunk = self.process, self.current_sched, self.sampler_chunk
        interval = self._dc_interval(sched.num_timesteps)
        runner = ChunkRunner()  # one compile for this cached fn's lifetime

        def fn(params, x_in, rng):
            full = lambda p, ni, lvl: self._cached_apply(
                "net", depth, p, ni, lvl)
            shallow = lambda p, ni, lvl, deep: self._cached_apply(
                "net", depth, p, ni, lvl, deep)
            return cached_p_sample_loop_chunked(
                process, sched, rng, x_in, full, shallow, params,
                interval=interval, clip_denoised=clip_denoised,
                chunk_size=chunk, runner=runner,
            )

        return fn

    def _build_sliding_window_fn(self, extra, clip_denoised, kind="test",
                                 shape=None):
        """Windowed-Picard variant of _infer_fn's closures (low-batch
        latency serving; diffusion/parallel_sampling.py). Params stay jit
        arguments (EMA weights work; tunnel payload limit, CLAUDE.md).
        Stores the sweep count on self.last_sliding_sweeps after each call
        (T / sweeps = average advance per sweep)."""
        from diffsplitting_tpu.diffusion.parallel_sampling import (
            ddpm_sample_sliding_window,
            indi_inference_sliding_window,
        )

        W, tau = self.sliding_window
        process, which = self.process, self.which

        if which in ("indi", "joint_indi"):
            T = self.current_T
            t_start = extra if extra is not None else (
                0.5 if which == "joint_indi" else 1.0
            )
            if which == "joint_indi":
                def raw(params, x_in, rng):
                    d1 = lambda x, t: self._apply("net_ch1", params, x, t)
                    d2 = lambda x, t: self._apply("net_ch2", params, x, t)
                    rng1, rng2 = jax.random.split(rng)
                    ch1, s1 = indi_inference_sliding_window(
                        process.indi1, d1, rng1, x_in, num_timesteps=T,
                        t_float_start=t_start, window=W, tau=tau)
                    ch2, s2 = indi_inference_sliding_window(
                        process.indi2, d2, rng2, x_in, num_timesteps=T,
                        t_float_start=1 - t_start, window=W, tau=tau)
                    return jnp.concatenate([ch1, ch2], axis=-1), s1 + s2
            else:
                def raw(params, x_in, rng):
                    d = lambda x, t: self._apply("net", params, x, t)
                    return indi_inference_sliding_window(
                        process, d, rng, x_in, num_timesteps=T,
                        t_float_start=t_start, window=W, tau=tau)
        else:  # sr3/ddpm reverse chain
            sched = self.current_sched
            x_src = shape if kind == "sample" else None
            # SR3 nets condition on the noise level, not raw t (sr3.py:60)
            t_cond = (
                (lambda t: sched.sqrt_alphas_cumprod_prev[t + 1])
                if which == "sr3" else None
            )

            def raw(params, x_in, rng):
                d = lambda x, t: self._apply("net", params, x, t)
                return ddpm_sample_sliding_window(
                    process, d, sched, rng,
                    x_src if x_src is not None else x_in,
                    window=W, tau=tau, clip_denoised=clip_denoised,
                    t_cond=t_cond)

        jfn = jax.jit(raw)

        def fn(params, x_in, rng):
            img, sweeps = jfn(params, x_in, rng)
            self.last_sliding_sweeps = int(sweeps)
            return img

        return fn

    def _build_ddim_fn(self, clip_denoised, kind="test", shape=None,
                       chunked=False):
        """Respaced-DDIM variant of _infer_fn's closures (diffusion/ddim.py):
        S ≪ T steps as one scan, or ⌈S/K⌉ jitted chunks when
        model.sampler_chunk is set (512²-class shapes). Params stay jit
        arguments (EMA weights work; tunnel payload limit, CLAUDE.md)."""
        from diffsplitting_tpu.diffusion.ddim import (
            ddim_sample_loop,
            ddim_sample_loop_chunked,
        )

        steps, eta = self.ddim
        process, which = self.process, self.which
        sched = self.current_sched
        x_src = shape if kind == "sample" else None
        # SR3 nets condition on the noise level, not raw t (sr3.py:60).
        # Indexed on a HOST copy here at build time: ddim_sample_loop calls
        # t_cond on the static numpy subsequence while tracing, and indexing
        # a captured jnp constant inside a trace would yield a tracer.
        if which == "sr3":
            _lvls = np.asarray(sched.sqrt_alphas_cumprod_prev)
            t_cond = lambda t: _lvls[t + 1]  # noqa: E731
        else:
            t_cond = None

        if chunked:
            from diffsplitting_tpu.diffusion.common import ChunkRunner

            chunk = self.sampler_chunk
            runner = ChunkRunner()  # one compile for this cached fn's lifetime

            def chunked_fn(params, x_in, rng):
                # host loop over jitted K-step scans — NOT wrapped in an
                # outer jit; params/cond stay jit args inside
                da = lambda p, xx, tt: self._apply("net", p, xx, tt)  # noqa: E731
                return ddim_sample_loop_chunked(
                    process, da, params, sched, rng, x_in, steps=steps,
                    chunk_size=chunk, eta=eta, clip_denoised=clip_denoised,
                    t_cond=t_cond, runner=runner)

            return chunked_fn

        def raw(params, x_in, rng):
            d = lambda x, t: self._apply("net", params, x, t)
            return ddim_sample_loop(
                process, d, sched, rng,
                x_src if x_src is not None else x_in,
                steps=steps, eta=eta, clip_denoised=clip_denoised,
                t_cond=t_cond)

        return jax.jit(raw)

    def _build_ddim_deepcache_fn(self, clip_denoised, kind="test", shape=None,
                                 chunked=False):
        """DDIM × DeepCache composition: the S-step respaced chain with the
        deep-feature cache in the carry (diffusion/deepcache.py
        cached_ddim_sample_loop[_chunked]). The refresh interval is resolved
        over the RESPACED length S, not T (model.deepcache 'auto' uses the
        same span rule as the exact chain)."""
        from diffsplitting_tpu.diffusion.ddim import ddim_timesteps

        steps, eta = self.ddim
        depth = self.deepcache[1]
        process, sched = self.process, self.current_sched
        S = len(ddim_timesteps(sched.num_timesteps, steps))
        interval = self._dc_interval(S)
        x_src = shape if kind == "sample" else None
        if self.which == "sr3":
            _lvls = np.asarray(sched.sqrt_alphas_cumprod_prev)
            t_cond = lambda t: _lvls[t + 1]  # noqa: E731
        else:
            t_cond = None

        if chunked:
            from diffsplitting_tpu.diffusion.common import ChunkRunner
            from diffsplitting_tpu.diffusion.deepcache import (
                cached_ddim_sample_loop_chunked,
            )

            chunk = self.sampler_chunk
            runner = ChunkRunner()  # one compile for this cached fn's lifetime
            full_p = lambda p, ni, lvl: self._cached_apply(  # noqa: E731
                "net", depth, p, ni, lvl)
            shallow_p = lambda p, ni, lvl, deep: self._cached_apply(  # noqa: E731
                "net", depth, p, ni, lvl, deep)

            def chunked_fn(params, x_in, rng):
                # host loop over jitted K-step scans — params stay jit args
                return cached_ddim_sample_loop_chunked(
                    process, sched, rng,
                    x_src if x_src is not None else x_in,
                    full_p, shallow_p, params, steps=steps, chunk_size=chunk,
                    eta=eta, interval=interval, clip_denoised=clip_denoised,
                    t_cond=t_cond, runner=runner)

            return chunked_fn

        from diffsplitting_tpu.diffusion.deepcache import cached_ddim_sample_loop

        def raw(params, x_in, rng):
            full = lambda ni, lvl: self._cached_apply(  # noqa: E731
                "net", depth, params, ni, lvl)
            shallow = lambda ni, lvl, deep: self._cached_apply(  # noqa: E731
                "net", depth, params, ni, lvl, deep)
            return cached_ddim_sample_loop(
                process, sched, rng, x_src if x_src is not None else x_in,
                full, shallow, steps=steps, eta=eta, interval=interval,
                clip_denoised=clip_denoised, t_cond=t_cond)

        return jax.jit(raw)

    def test(self, continuous=False, clip_denoised=True, t_float_start=None,
             use_ema=False, **_legacy):
        """Run the reverse process on self.data['input'] (model.py:63-76).

        Accepts the reference's misspelled `continous` kw for call-site parity.
        `use_ema=True` samples with the EMA weights when EMA tracking is on.
        """
        if "continous" in _legacy:
            continuous = _legacy.pop("continous")
        x_in = self.data["input"]
        fn = self._infer_fn(
            "test", tuple(np.shape(x_in)), continuous, extra=t_float_start,
            clip_denoised=clip_denoised,
        )
        params = self.ema_params if (use_ema and self.ema_params is not None) else self.params
        self.prediction = fn(self._serving_params(params, "test"), x_in, self._next_rng())
        return self.prediction

    def inference(self, x_in, continuous=False, num_timesteps=None, t_float_start=None):
        """Direct inference on an explicit input batch (netG.inference parity)."""
        self.data = {"input": shard_batch(x_in, self.mesh)}
        if num_timesteps is not None and self.which in ("indi", "joint_indi"):
            old_T = self.current_T
            self.current_T = int(num_timesteps)
            try:
                return self.test(continuous=continuous, t_float_start=t_float_start)
            finally:
                self.current_T = old_T
        return self.test(continuous=continuous, t_float_start=t_float_start)

    def interpolate(self, x1, x2, t=None, lam=0.5):
        """Latent interpolation between two images (ddpm diffusion.py:249-264)."""
        assert self.which == "ddpm", "interpolate is a DDPM capability"
        sched = self.current_sched
        key = ("interpolate", tuple(np.shape(x1)), self.schedule_phase, t, lam)
        if key not in self._infer_cache:
            def fn(params, x1, x2, rng):
                d = lambda x, tt: self._apply("net", params, x, tt)
                return self.process.interpolate(d, sched, rng, x1, x2, t=t, lam=lam)

            self._infer_cache[key] = jax.jit(fn)
        x1 = shard_batch(x1, self.mesh)
        x2 = shard_batch(x2, self.mesh)
        self.prediction = self._infer_cache[key](
            self._inference_params(self.params), x1, x2, self._next_rng()
        )
        return self.prediction

    def sample(self, batch_size=1, continuous=False, **_legacy):
        if "continous" in _legacy:
            continuous = _legacy.pop("continous")
        size = self.opt["model"]["diffusion"]["image_size"]
        ch = self.opt["model"]["diffusion"]["channels"]
        shape = (batch_size, size, size, ch)
        fn = self._infer_fn("sample", shape, continuous)
        self.prediction = fn(self._serving_params(self.params, "sample"), None, self._next_rng())
        return self.prediction

    # ------------------------------------------------------------- logging
    def get_current_log(self):
        return OrderedDict((k, float(v)) for k, v in self.log_dict.items())

    def get_current_visuals(self, need_LR=True, sample=False):
        out = OrderedDict()
        if sample:
            out["SAM"] = np.asarray(self.prediction)
        else:
            out["prediction"] = np.asarray(self.prediction)
            out["input"] = np.asarray(self.data["input"])
            if "target" in self.data:
                out["target"] = np.asarray(self.data["target"])
        return out

    def print_network(self):
        n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
        logger.info(
            "Network G structure: %s (%s), with parameters: %s",
            self.__class__.__name__, self.which, f"{n:,d}",
        )

    # ------------------------------------------------------------- checkpoints
    def save_network(self, epoch, iter_step):
        ckpt_dir = self.opt["path"]["checkpoint"]
        prefix = f"I{iter_step}_E{epoch}"
        gen_path, _ = save_checkpoint(
            ckpt_dir, prefix, self.params, self.opt_state, epoch, iter_step,
            ema_params=self.ema_params,
        )
        logger.info("Saved model in [%s] ...", gen_path)

    def export_torch(self, path: str, use_ema: bool = False) -> str:
        """Write the current weights as a reference-format `*_gen.pth` the
        unmodified reference resumes with strict=True (the inverse of
        load_network's torch fallback; utils/torch_export.py). Returns the
        written path."""
        from diffsplitting_tpu.utils.torch_export import save_reference_checkpoint

        params = self.ema_params if (use_ema and self.ema_params) else self.params
        sched = self.current_sched
        if self.which in ("ddpm", "sr3") and sched is None:
            sched = build_ddpm_schedule(self.opt["model"]["beta_schedule"]["train"])
        out = save_reference_checkpoint(
            path, self.which, jax.device_get(params), self.nets, sched
        )
        logger.info("Exported reference-format checkpoint to [%s]", out)
        return out

    def load_network(self):
        load_path = self.opt["path"].get("resume_state") if self.opt.get("path") else None
        if not load_path:
            return
        # reference torch checkpoints (model.py:153-173 contract) import
        # directly when no orbax artifact exists at the prefix
        import os as _os

        torch_path = None
        if load_path.endswith(".pth") and _os.path.isfile(load_path):
            torch_path = load_path
        elif _os.path.isfile(f"{load_path}_gen.pth") and not _os.path.isdir(
            f"{load_path}_gen"
        ):
            torch_path = f"{load_path}_gen.pth"
        if torch_path is not None:
            logger.info("Importing reference torch checkpoint [%s] ...", torch_path)
            params = dict(self.params)
            if "net" in self.nets:
                from diffsplitting_tpu.utils.torch_import import (
                    load_reference_checkpoint,
                )

                variables = load_reference_checkpoint(torch_path, self.nets["net"])
                params["net"] = variables["params"]
            else:  # joint_indi: {net_ch1, net_ch2} + extra scalars
                from diffsplitting_tpu.utils.torch_import import (
                    load_reference_joint_checkpoint,
                )

                variables = load_reference_joint_checkpoint(
                    torch_path, self.nets["net_ch1"], self.nets["net_ch2"]
                )
                params.update(variables["params"])
            self.params = self._place_params(params)
            if self.use_ema:
                self.ema_params = self.params
            return
        logger.info("Loading pretrained model for G [%s] ...", load_path)
        want_opt = self.phase == "train"
        params, opt_state, epoch, step, ema = load_checkpoint(
            load_path, self.params, self.opt_state if want_opt else None,
            with_ema=self.use_ema,
        )
        self.params = self._place_params(params)
        if ema is not None:
            self.ema_params = self._place_params(ema)
        if want_opt and opt_state is not None:
            self.opt_state = self._place_opt_state(opt_state)
            self.begin_epoch = epoch
            self.begin_step = step
            self.global_step = step  # EMA warmup schedule resumes correctly

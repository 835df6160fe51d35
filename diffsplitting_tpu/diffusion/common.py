"""Shared pieces for the diffusion processes: losses and on-device trajectory capture."""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def make_loss_fn(loss_type: str, reduction: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """L1/L2 loss with mean/sum reduction.

    Parity: torch nn.L1Loss/nn.MSELoss with `reduction` from the config's
    `model.lr_reduction` (reference ddpm diffusion.py:103-109; the SR3 variant
    hardcodes 'sum': sr3_modules/diffusion.py:84-90).
    """
    if loss_type == "l1":
        elem = lambda a, b: jnp.abs(a - b)
    elif loss_type == "l2":
        elem = lambda a, b: (a - b) ** 2
    else:
        raise NotImplementedError(f"loss_type={loss_type}")

    if reduction == "mean":
        red = jnp.mean
    elif reduction == "sum":
        red = jnp.sum
    else:
        raise NotImplementedError(f"reduction={reduction}")

    return lambda a, b: red(elem(a, b))


def capture_plan(markers: Sequence[int], sample_inter: int, include_last: bool) -> Tuple[List[int], List[int]]:
    """Static plan of which loop steps get recorded into the trajectory buffer.

    `markers[k]` is the reference's loop variable at loop iteration k — it
    counts DOWN for DDPM (i = T-1..0, ddpm diffusion.py:215-218) and UP for
    InDI (idx = 0..N-1, indi.py:86-90). A step is captured when
    `marker % sample_inter == 0`, plus the final iteration when
    `include_last` (InDI only).

    Returns (flags, slots): flags[k] == 1 if iteration k is captured; slots[k]
    is the destination frame index (slot 0 is reserved for the pre-loop frame).
    """
    flags, slots = [], []
    slot = 1
    n = len(markers)
    for k, m in enumerate(markers):
        hit = (m % sample_inter == 0) or (include_last and k == n - 1)
        flags.append(1 if hit else 0)
        slots.append(slot if hit else 0)
        if hit:
            slot += 1
    return flags, slots


def scan_with_trajectory(
    step_fn: Callable,
    init_x: jnp.ndarray,
    init_frame: jnp.ndarray,
    xs,
    flags: Sequence[int],
    slots: Sequence[int],
    extra_carry=None,
):
    """Run `step_fn` over `xs` with a fixed-size on-device trajectory buffer.

    step_fn(carry_x, extra_carry, x) -> (new_x, new_extra_carry)

    The buffer has 1 + sum(flags) frames; frame 0 is `init_frame` (the
    reference seeds `ret_img` with the input/noise before the loop). Captured
    frames are written with `lax.cond` + `dynamic_update_slice` so memory stays
    O(n_frames), not O(n_steps).
    """
    n_frames = 1 + int(sum(flags))
    frames = jnp.zeros((n_frames,) + init_x.shape, dtype=init_x.dtype)
    frames = frames.at[0].set(init_frame)

    flags_arr = jnp.asarray(flags, dtype=jnp.int32)
    slots_arr = jnp.asarray(slots, dtype=jnp.int32)

    def body(carry, inp):
        x, extra, frames = carry
        step_x, flag, slot = inp
        x, extra = step_fn(x, extra, step_x)

        def write(fr):
            return jax.lax.dynamic_update_slice(fr, x[None], (slot,) + (0,) * x.ndim)

        frames = jax.lax.cond(flag > 0, write, lambda fr: fr, frames)
        return (x, extra, frames), None

    (final_x, final_extra, frames), _ = jax.lax.scan(
        body, (init_x, extra_carry, frames), (xs, flags_arr, slots_arr)
    )
    return final_x, final_extra, frames


class ChunkRunner:
    """Holder that keeps one chunked-scan jit alive across sampler calls.

    A fresh `@jax.jit` closure is a new jit-cache entry, so a chunked
    sampler that builds its runner per invocation RE-TRACES every serving
    request — measured as tens of seconds per call through the TPU tunnel
    (bench_ddim S=250 rows, round 3). Callers that invoke a chunked sampler
    repeatedly with the same step semantics create one ChunkRunner next to
    the closure configuration and pass it each call; the first call
    populates it, later calls reuse the compiled programs. The runner must
    not be shared between samplers with different step bodies — it replays
    whatever step_fn it was first built with.
    """

    __slots__ = ("_jitted",)

    def __init__(self):
        self._jitted = None


def chunked_reverse_scan(step_fn, consts, init_x, step_inputs, chunk_size: int,
                         runner: "ChunkRunner | None" = None):
    """⌈T/K⌉ jitted K-step `lax.scan` chunks + a host loop — bit-identical to
    one T-step scan of `step_fn` over the same `step_inputs`.

    Exists for shapes whose full-T scan exceeds the compiler: the 512²×2000
    SR3 chain kernel-faults the TPU worker as ONE scan, while K-step chunks
    compile (the 128²×100 scan is fine). The rng discipline is untouched —
    callers pre-split all T step keys and pass them in `step_inputs`, so
    chunking changes compilation units, not math.

    step_fn(consts, x, inp) -> x. `consts` (params, condition, …) are jit
    ARGUMENTS — closure-captured trees inline into the compile payload and
    blow the remote-compile body limit (CLAUDE.md). At most two compiles: the
    K-step program and the remainder — and with a `runner` those compiles
    happen once for the runner's lifetime, not once per call.
    """
    T = jax.tree_util.tree_leaves(step_inputs)[0].shape[0]
    assert chunk_size >= 1

    if runner is not None and runner._jitted is not None:
        run_chunk = runner._jitted
    else:

        @jax.jit
        def run_chunk(consts, x, inputs):
            def body(x, inp):
                return step_fn(consts, x, inp), None

            x, _ = jax.lax.scan(body, x, inputs)
            return x

        if runner is not None:
            runner._jitted = run_chunk

    x = init_x
    for s in range(0, T, chunk_size):
        e = min(s + chunk_size, T)
        inputs = jax.tree_util.tree_map(lambda a: a[s:e], step_inputs)
        x = run_chunk(consts, x, inputs)
    return x

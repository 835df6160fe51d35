"""diffsplitting_tpu — a TPU-native (JAX/XLA/Pallas) diffusion-splitting framework.

A ground-up rebuild of the capabilities of rayanirban/DiffSplitting (PyTorch):
diffusion-based image splitting / fluorescence unmixing (InDI, joint-InDI),
DDPM / SR3 diffusion for super-resolution and unconditional generation, a
time-predictor auxiliary network, tiled prediction of large microscopy frames,
and the surrounding experiment/config/metric tooling.

Design principles (TPU-first):
  * NHWC layouts everywhere; convs and matmuls hit the MXU in bf16.
  * Reverse-diffusion sampling loops are single `jax.lax.scan`s — the whole
    trajectory stays on device (the reference runs a Python loop with one
    device round-trip per step: /root/reference/model/ddpm_modules/diffusion.py:205).
  * Data parallelism via `jax.sharding.Mesh` + NamedSharding (the reference's
    only parallelism is torch nn.DataParallel: /root/reference/model/networks.py:177).
  * Diffusion processes are pure functions over schedule pytrees, not stateful
    nn.Modules; the denoiser is passed in as a closure.
"""

__version__ = "0.1.0"


def create_model(opt, **kwargs):
    """Top-level factory (reference `Model.create_model(opt)` parity)."""
    from diffsplitting_tpu.train import create_model as _create

    return _create(opt, **kwargs)

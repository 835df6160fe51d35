"""Measured-NEGATIVE TPU kernels, kept as tested infrastructure.

Everything here WORKS and is covered by tests, but lost end-to-end to XLA's
own fusion on v5e (numbers in BENCH_NOTES.md "round 2" + the attic note):

- `fused_forward` / `conv_gn`: stat-carried Pallas conv+GN UNet chain.
  XLA already fuses conv + GroupNorm statistics into one HBM pass on TPU;
  the kernel matches XLA per-op but loses end-to-end to boundary glue
  (b32: 26.2-28.5 vs 31.7 steps/s). Opt-in via DSP_FUSED=1.
- `groupnorm_pallas`: standalone GroupNorm+swish kernel (31% MFU vs XLA's
  47% in-graph). Opt-in via DSP_USE_PALLAS=1 through
  `ops.groupnorm.fused_group_norm_swish`.

Production code must not import from here except behind those env flags;
re-attempt only with a >1.4x in-graph win over XLA's conv emitter
(CLAUDE.md roadmap item 1).
"""

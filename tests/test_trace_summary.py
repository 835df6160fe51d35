"""trace_summary: capture a jax.profiler trace and aggregate op self-times
from the raw xplane protos (the image's tensorboard_plugin_profile is
version-skewed against its tensorflow, so the direct parse is the only
working path — scripts/trace_summary.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_capture_and_summarize(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    import jax
    import jax.numpy as jnp

    from trace_summary import capture, summarize

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))
    f(x).block_until_ready()  # compile outside the trace
    logdir = str(tmp_path / "tr")
    with capture(logdir):
        for _ in range(3):
            f(x).block_until_ready()
    rows = summarize(logdir, top=10)
    assert rows, "no planes parsed"
    plane = next(iter(rows.values()))
    assert plane["total_ms"] > 0
    names = " ".join(n for n, _, _ in plane["ops"])
    assert "dot" in names or "fusion" in names or "Execute" in names
    # plane filter narrows the result set
    filtered = summarize(logdir, top=5, plane_filter="definitely-not-a-plane")
    assert filtered == {}

"""Serving export: jax.export StableHLO artifact round-trip.

The reference has no serving story (its `test_ffwm.py` is the only inference
entry point and needs the full repo + torch + CUDA extensions). ffwm_tpu adds
`tools/export_model.py`: the whole jitted test path, weights baked in, as a
self-contained StableHLO module loadable by any PJRT runtime.
"""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_export_roundtrip_cli(tmp_path):
    out = tmp_path / "ffwm_b2_s64.shlo"
    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "export_model.py"),
         "--random", "--batch", "2", "--size", "64", "--device", "cpu",
         "--out", str(out)],
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 1e6
    # the tool itself asserts deserialize(artifact) == live jit (<1e-5)
    assert "round-trip max abs err" in proc.stdout


def test_export_deserialize_inprocess(tmp_path):
    """Export at the API level (no subprocess) and call the reloaded module."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ffwm_tpu.engine import build_models, make_ffwm_inference

    models = build_models()
    s = 64
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    fv = models.flownet.init(jax.random.PRNGKey(0), x, train=False)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (s // 4, s // 2, s))
    gv = models.gen.init(jax.random.PRNGKey(1), x, flows0, train=False)
    infer = make_ffwm_inference(models)

    @jax.jit
    def serve(a, b):
        out = infer(fv, gv, a, b)
        return out["fake_F128"]

    spec = jax.ShapeDtypeStruct((2, s, s, 3), jnp.float32)
    blob = jax.export.export(serve)(spec, spec).serialize()
    reloaded = jax.export.deserialize(blob)

    r = np.random.RandomState(0)
    a = jnp.asarray(r.rand(2, s, s, 3), jnp.float32)
    b = jnp.asarray(r.rand(2, s, s, 3), jnp.float32)
    got = jax.jit(reloaded.call)(a, b)
    want = serve(a, b)
    assert float(jnp.abs(got - want).max()) < 1e-5

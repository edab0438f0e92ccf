import json

import jax.numpy as jnp
import numpy as np

from tpu3d.utils.profiling import StageRecorder
from tpu3d.utils.timing import device_timeit, roundtrip_ms


def test_device_timeit_reports_sane_numbers():
    def f(x):
        return x * 2.0

    out = device_timeit(f, jnp.ones((128, 128)), iters=2)
    assert out["best_ms"] > 0
    assert out["best_net_ms"] >= 0
    assert out["roundtrip_ms"] > 0


def test_roundtrip_positive():
    assert roundtrip_ms(n=2) > 0


def test_stage_recorder(tmp_path):
    rec = StageRecorder()
    with rec.stage("a", n=3):
        pass
    with rec.stage("b"):
        pass
    assert set(rec.summary()) == {"a", "b"}
    assert rec.records[0]["n"] == 3
    path = str(tmp_path / "stages.json")
    rec.dump(path)
    loaded = json.load(open(path))
    assert loaded[0]["stage"] == "a"


def test_compute_platform_honors_default_device():
    """use_gpu=false pins compute to the CPU device of a (possibly TPU)
    backend process; engine auto-switches must follow the DEVICE, not the
    backend (BENCH_NOTES r3: compiled Pallas on a CPU device fails)."""
    import jax

    from tpu3d.utils.platform import compute_platform, on_tpu

    # On the hermetic CPU test platform both agree.
    assert compute_platform() == jax.default_backend()
    with jax.default_device(jax.devices("cpu")[0]):
        assert compute_platform() == "cpu"
        assert on_tpu() is False

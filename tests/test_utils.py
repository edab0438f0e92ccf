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

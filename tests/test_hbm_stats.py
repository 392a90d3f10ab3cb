"""Compile-only HBM/FLOPs stats (utils/hbm.py) — the surface bench.py
and probe_hbm_rcnn.py rely on (VERDICT r3 #7)."""
import jax
import jax.numpy as jnp
import numpy as np

from instance_nerf_tpu.utils.hbm import (
    abstractify,
    compiled_memory_stats,
    compiled_step_stats,
)


def test_memory_stats_from_shapes_only():
    @jax.jit
    def f(a, b):
        return a @ b + 1.0

    sds = jax.ShapeDtypeStruct((256, 256), jnp.float32)
    st = compiled_memory_stats(f, sds, sds)
    assert st["arguments"] >= 2 * 256 * 256 * 4
    assert st["output"] >= 256 * 256 * 4
    assert st["peak_hbm"] == (
        st["temp"] + st["arguments"] + st["output"] - st["alias"]
    )
    assert st["peak_hbm_gib"] > 0


def test_step_stats_flops_and_mfu():
    @jax.jit
    def f(a, b):
        return a @ b

    n = 128
    a = jnp.ones((n, n))
    st = compiled_step_stats(f, a, a, steps_per_call=1, step_ms=1.0)
    # XLA counts ~2*n^3 flops for a matmul
    assert 0.5 * 2 * n**3 <= st["flops_per_step"] <= 4 * 2 * n**3
    assert st["achieved_tflops"] >= 0
    assert 0 <= st["mfu"] < 1


def test_abstractify_mixed_tree():
    tree = {"w": np.zeros((4, 4), np.float32), "n": 3}
    out = abstractify(tree)
    assert isinstance(out["w"], jax.ShapeDtypeStruct)
    assert out["n"] == 3

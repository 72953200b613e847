"""Collective-inventory accounting (parallel/comm_audit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from realtime_stereo_matcher_tpu.parallel.comm_audit import (
    audit,
    collective_inventory,
    ring_wire_bytes,
)
from realtime_stereo_matcher_tpu.parallel.mesh import make_mesh


def test_inventory_parses_hlo_shapes():
    txt = """
  %all-reduce.1 = f32[409600]{0} all-reduce(f32[409600]{0} %p), ...
  %ag = bf16[8,90,160,32]{3,2,1,0} all-gather(bf16[1,90,160,32]{3,2,1,0} %x)
  %cp = f32[1,2,160,32]{3,2,1,0} collective-permute(f32[1,2,160,32]{3,2,1,0} %y)
  %add = f32[16]{0} add(f32[16]{0} %a, f32[16]{0} %b)
"""
    inv = collective_inventory(txt)
    assert [i["op"] for i in inv] == ["all-reduce", "all-gather",
                                      "collective-permute"]
    assert inv[0]["bytes"] == 409600 * 4
    assert inv[1]["bytes"] == 8 * 90 * 160 * 32 * 2
    assert inv[2]["bytes"] == 2 * 160 * 32 * 4


def test_inventory_tuple_shape_and_start_dedup():
    txt = """
  %ar = (f32[4,2]{1,0}, f32[8]{0}) all-reduce-start(f32[4,2]{1,0} %a, f32[8]{0} %b)
  %ard = f32[4,2]{1,0} all-reduce-done(%ar)
"""
    inv = collective_inventory(txt)
    assert len(inv) == 1
    assert inv[0]["bytes"] == (4 * 2 + 8) * 4


def test_ring_wire_factors():
    assert ring_wire_bytes(100, "all-reduce", 8) == 2 * 100 * 7 / 8
    assert ring_wire_bytes(100, "all-gather", 8) == 100 * 7 / 8
    assert ring_wire_bytes(100, "collective-permute", 8) == 100
    assert ring_wire_bytes(100, "all-reduce", 1) == 0.0


def test_audit_counts_dp_psum():
    """A data-sharded sum-reduction compiles to >= 1 all-reduce whose bytes
    the audit attributes correctly."""
    mesh = make_mesh(data=8, spatial=1)
    x = jax.device_put(np.ones((8, 128), np.float32),
                       NamedSharding(mesh, P("data")))

    @jax.jit
    def f(v):
        return jnp.sum(v * 2.0)  # cross-shard reduction -> all-reduce

    report = audit(f, x)
    assert report["total_bytes"] > 0
    assert any(op == "all-reduce" for op in report["per_op"])

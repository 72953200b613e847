"""Per-stage communication-volume accounting for sharded programs.

The reference has no distributed execution at all (SURVEY.md §2.3: one
``nn.DataParallel`` whose NCCL traffic is invisible to the user).  Here the
collectives are inserted by XLA's SPMD partitioner from sharding
annotations, so the *compiled program itself* is the ground truth for what
moves over ICI.  :func:`collective_inventory` parses a compiled HLO module
and returns every collective with its payload size; :func:`audit` lowers a
jitted function and aggregates per-op-kind byte totals.

This is the auditable basis for the >= 80% multi-chip scaling-efficiency
target (BASELINE.md): measured per-step collective bytes + the public v5e
ICI link bandwidth give a projected communication fraction that can be
checked against any future real-slice measurement.
"""

from __future__ import annotations

import re

import numpy as np

# HLO result-shape token, e.g. ``f32[8,90,160,32]{...}`` or a tuple
# ``(f32[4,2]{..}, f32[4,2]{..})`` for variadic collectives
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
_LINE = re.compile(
    r"=\s*(?P<shape>\([^)]*\)|\S+?)\s+"
    r"(?P<op>" + "|".join(_COLLECTIVES) + r")(?:-start)?\(")
_SHAPE = re.compile(r"(?P<dtype>[a-z]+\d+)\[(?P<dims>[\d,]*)\]")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}


def _shape_bytes(token: str) -> int:
    total = 0
    for m in _SHAPE.finditer(token):
        dims = m.group("dims")
        n = int(np.prod([int(d) for d in dims.split(",")])) if dims else 1
        total += n * _DTYPE_BYTES.get(m.group("dtype"), 4)
    return total


def collective_inventory(hlo_text: str) -> list[dict]:
    """All collectives in an HLO module: [{"op", "shape", "bytes"}, ...].

    ``bytes`` is the payload (result) size of the collective instruction --
    for ring algorithms the wire traffic per chip is O(bytes) with the
    standard (2(n-1)/n for all-reduce, (n-1)/n for all-gather) factors,
    applied by the caller who knows the axis size.
    """
    out = []
    for line in hlo_text.splitlines():
        m = _LINE.search(line)
        if m and "-done" not in line:
            out.append({"op": m.group("op"), "shape": m.group("shape"),
                        "bytes": _shape_bytes(m.group("shape"))})
    return out


def audit(jitted, *args, **kwargs) -> dict:
    """Compile ``jitted`` on ``args`` and aggregate collective bytes by kind.

    Returns {"per_op": {op: {"count", "bytes"}}, "total_bytes": N,
    "inventory": [...]}.
    """
    txt = jitted.lower(*args, **kwargs).compile().as_text()
    inv = collective_inventory(txt)
    per_op: dict = {}
    for item in inv:
        slot = per_op.setdefault(item["op"], {"count": 0, "bytes": 0})
        slot["count"] += 1
        slot["bytes"] += item["bytes"]
    return {"per_op": per_op,
            "total_bytes": sum(i["bytes"] for i in inv),
            "inventory": inv}


def ring_wire_bytes(payload_bytes: int, op: str, n: int) -> float:
    """Per-chip wire traffic of one collective on an n-device ring."""
    if n <= 1:
        return 0.0
    if op == "all-reduce":
        return 2.0 * payload_bytes * (n - 1) / n
    if op in ("all-gather", "reduce-scatter"):
        # payload of an all-gather result is the FULL gathered buffer; each
        # chip receives (n-1)/n of it (and sends its own 1/n shard n-1 times)
        return payload_bytes * (n - 1) / n
    if op == "collective-permute":
        return float(payload_bytes)
    if op == "all-to-all":
        return payload_bytes * (n - 1) / n
    return float(payload_bytes)

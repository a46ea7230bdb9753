"""Compiled-HLO collective accounting.

The scaling model in docs/ARCHITECTURE.md (and the dryrun's
``per_iter_collective_bytes_per_device`` stats) was originally
hand-derived arithmetic; a transcription error there would be invisible.
This module extracts the ACTUAL collective ops from a lowered+compiled
program and converts them to per-device send-byte volumes so the dryrun
can emit measured-vs-formula (VERDICT r4 ask #8).

Send-byte conventions (ring algorithms, per participating device):
  all-gather       out_bytes * (G-1)/G   (each device sends its shard G-1x)
  all-reduce       2 * bytes * (G-1)/G   (reduce-scatter + all-gather)
  reduce-scatter   out_bytes * (G-1)     (input = G * output)
  collective-permute  out_bytes          (one hop)
with G = replica-group size parsed from the op's ``replica_groups``.
"""
from __future__ import annotations

import re
from typing import NamedTuple

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "pred": 1, "c64": 8, "c128": 16,
}

_KINDS = ("all-gather", "all-reduce", "reduce-scatter",
          "collective-permute")

# `f32[512,3]{1,0}` (layout suffix optional); scalars are `f32[]`
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# op line: `%name = <shape or (tuple)> <kind>(` — async variants emit
# `-start`/`-done` pairs; count only the start (the done carries no data)
_OP_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+(" + "|".join(_KINDS) + r")(-start)?\(")
_GROUPS_RE = re.compile(
    r"replica_groups=(\{\{.*?\}\}|\[\d+,\d+\]<=\[\d+\])")


class CollectiveOp(NamedTuple):
    kind: str
    out_bytes: int
    group_size: int
    send_bytes: int
    line: str


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def _group_size(line: str) -> int:
    m = _GROUPS_RE.search(line)
    if not m:
        return 1
    g = m.group(1)
    if g.startswith("{{"):
        first = g[2:].split("}")[0]
        return len([x for x in first.split(",") if x.strip() != ""])
    # iota form [num_groups, group_size]<=[n]
    dims = g[1:g.index("]")].split(",")
    return int(dims[1])


def _send_bytes(kind: str, out_bytes: int, g: int) -> int:
    if g <= 1:
        return 0
    if kind == "all-gather":
        return out_bytes * (g - 1) // g
    if kind == "all-reduce":
        return 2 * out_bytes * (g - 1) // g
    if kind == "reduce-scatter":
        return out_bytes * (g - 1)
    return out_bytes  # collective-permute


def parse_collectives(hlo_text: str) -> list[CollectiveOp]:
    """All collective ops in a compiled HLO module (async counted once,
    at their -start op), with per-device send-byte estimates."""
    ops = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        if kind == "collective-permute" and "-done(" in line:
            continue
        out_bytes = _shape_bytes(shape_str)
        if kind == "collective-permute":
            # permutes carry source_target_pairs, not replica_groups;
            # one hop per device = the block size
            has_pairs = "source_target_pairs={" in line
            ops.append(CollectiveOp(
                kind=kind, out_bytes=out_bytes, group_size=0,
                send_bytes=out_bytes if has_pairs else 0,
                line=line.strip()[:160]))
            continue
        g = _group_size(line)
        ops.append(CollectiveOp(
            kind=kind, out_bytes=out_bytes, group_size=g,
            send_bytes=_send_bytes(kind, out_bytes, g),
            line=line.strip()[:160]))
    return ops


def send_bytes_by_bucket(ops: list[CollectiveOp]) -> dict:
    """Sum per-device send bytes bucketed by (kind, group_size) — the
    granularity at which the hand formulas are stated (group size
    identifies the mesh axis when axis sizes differ)."""
    out: dict = {}
    for op in ops:
        key = (op.kind if op.group_size == 0
               else f"{op.kind}_g{op.group_size}")
        out[key] = out.get(key, 0) + op.send_bytes
    return out


def collectives_of(jitted, *args) -> list[CollectiveOp]:
    """Lower+compile a jitted function and parse its collectives."""
    return parse_collectives(jitted.lower(*args).compile().as_text())

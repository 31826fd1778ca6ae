#!/usr/bin/env python
"""Where does gradient reduction sit relative to the backward pass?

Compiles the full sharded train step on an 8-virtual-device ('data','model')
mesh and reports the positions of collective ops (all-reduce /
reduce-scatter / all-gather, sync and async -start/-done forms) inside the
scheduled HLO module, as fractions of the instruction stream. Async
start/done pairs with compute between them are overlap evidence: XLA has
scheduled the reduction concurrently with remaining backward/optimizer work.

    python scripts/collective_schedule.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", default=None)
    args = p.parse_args()

    import jax.numpy as jnp
    import optax

    from hashmodnffbanks_idr_tpu.models.loss import IDRLossConfig
    from hashmodnffbanks_idr_tpu.models.renderer import IDRNetwork
    from hashmodnffbanks_idr_tpu.parallel.sharding import (
        make_mesh, param_sharding, ray_sharding, replicated)
    from hashmodnffbanks_idr_tpu.testing import flagship_conf, synthetic_scene
    from hashmodnffbanks_idr_tpu.train.trainer import build_train_step

    conf = flagship_conf(num_pixels=64, small=True)
    model = IDRNetwork(conf.get_config("model"))
    loss_cfg = IDRLossConfig(0.1, 200.0, 50.0)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=4, n_model=2)
    p_shard = param_sharding(params, mesh, min_table_rows=8)
    state = {
        "params": jax.device_put(params, p_shard),
        "opt_state": jax.device_put(optimizer.init(params), replicated(mesh)),
    }
    scene = {k: jax.device_put(jnp.asarray(v), replicated(mesh))
             for k, v in synthetic_scene(2, (16, 16)).items()}
    pixel_idx = jax.device_put(jnp.arange(64, dtype=jnp.int32), ray_sharding(mesh))
    img_idx = jax.device_put(jnp.asarray([0], jnp.int32), replicated(mesh))

    step = build_train_step(model, loss_cfg, optimizer, mesh=mesh)
    with mesh:
        lowered = step.lower(state, scene, img_idx, pixel_idx,
                             jax.random.PRNGKey(2), jnp.asarray(50.0))
        compiled = lowered.compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    # instruction stream of the entry computation (heuristic: all op lines)
    op_lines = [(i, ln.strip()) for i, ln in enumerate(lines)
                if re.match(r"\s*(ROOT\s+)?%?[\w.\-]+\s*=", ln)]
    n = len(op_lines)
    kinds = ("all-reduce", "reduce-scatter", "all-gather", "collective-permute")
    _DT_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2,
                 "f16": 2, "s8": 1, "u8": 1, "pred": 1}

    def _lhs_bytes(ln: str) -> int:
        """Bytes of the instruction's result: sum of dtype[dims] tokens on
        the LHS — XLA's all-reduce combiner merges many gradient reductions
        into one tuple-shaped op, so every element counts."""
        lhs = ln.split("=", 1)[1]
        # up to the OP's operand list — a tuple-shaped LHS contains parens
        # of its own, so split at the op token, not the first '('
        m_op = re.search(
            r"\b(all-reduce|reduce-scatter|all-gather|collective-permute)"
            r"(-start|-done)?\(", lhs)
        lhs = lhs[: m_op.start()] if m_op else lhs.split("(", 1)[0]
        total = 0
        for m in re.finditer(r"\b(f64|f32|s32|u32|bf16|f16|s8|u8|pred)\[([\d,]*)\]", lhs):
            size = _DT_BYTES[m.group(1)]
            for d in (int(d) for d in m.group(2).split(",") if d):
                size *= d
            total += size
        return total

    events = []
    for pos, (i, ln) in enumerate(op_lines):
        for k in kinds:
            if re.search(rf"\b{k}(-start|-done)?\(", ln) or f" {k}" in ln.split("=")[1][:40]:
                m = re.search(rf"{k}(-start|-done)?", ln)
                events.append({
                    "op": m.group(0),
                    "stream_pos": pos,
                    "frac": round(pos / max(1, n - 1), 4),
                    "bytes": _lhs_bytes(ln),
                })
                break
    # bytes by base op, counting -start/-done pairs once (prefer -done: its
    # LHS is the materialized result)
    bytes_by_op = {}
    for e in events:
        base = e["op"].replace("-start", "").replace("-done", "")
        if e["op"].endswith("-start"):
            continue
        bytes_by_op[base] = bytes_by_op.get(base, 0) + e["bytes"]
    # dot/conv ops after the first collective = compute scheduled around it
    first_col = min((e["stream_pos"] for e in events), default=None)
    dots_after = None
    if first_col is not None:
        dots_after = sum(1 for pos, (i, ln) in enumerate(op_lines)
                         if pos > first_col and (" dot(" in ln or " = dot" in ln
                                                 or "fusion" in ln[:80]))
    import numpy as np

    param_bytes = sum(int(np.prod(l.shape)) * l.dtype.itemsize
                      for l in jax.tree.leaves(params))
    summary = {
        "mesh": dict(mesh.shape),
        "hlo_instructions": n,
        "collective_bytes_by_op": bytes_by_op,
        "collective_bytes_total": sum(bytes_by_op.values()),
        # minimal gradient bytes = one reduction per param; the compiled
        # schedule reduces each use-site's contribution separately, so
        # all-reduce bytes exceed this (the multiplier feeds
        # scripts/scaling_model.py's pessimistic case)
        "small_conf_param_bytes": param_bytes,
        "collectives": events,
        "first_collective_frac": (round(first_col / max(1, n - 1), 4)
                                  if first_col is not None else None),
        "compute_ops_after_first_collective": dots_after,
    }
    out = json.dumps(summary, indent=1)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()

"""Ring-attention comm/compute overlap artifact (VERDICT r1 item 6).

The ring loop is explicitly double-buffered (parallel/ring.py): step j+1's
``ppermute`` is issued BEFORE step j's attention compute, and the transfer's
dataflow chain is permute -> permute -> ... -> parameters. This script
compiles the shard_map ring over an 8-virtual-device mesh and PROVES the
overlap precondition on the optimized HLO: no ``collective-permute``
instruction has any attention compute (exponential / dot / reduce) in its
transitive operand chain — i.e. no transfer is gated by compute, so a
latency-hiding scheduler (XLA:TPU schedules collective-permute
asynchronously via start/done pairs) can run every hop concurrently with
the resident partial's attention.

On CPU the collectives lower synchronously (no start/done pairs exist to
count), so the checkable property here is the dependency structure — which
is what makes the TPU schedule's overlap possible. A jax.profiler trace is
also captured for manual inspection.

Run: python scripts/ring_overlap_trace.py
Artifact: benchmarks/results/ring_overlap_hlo.md
"""

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

COMPUTE_OPS = {"exponential", "dot", "convolution"}


def _parse_instructions(hlo: str):
    """SSA graph per HLO computation: name -> (opcode, operand names)."""
    insts: dict[str, tuple[str, list[str]]] = {}
    for line in hlo.splitlines():
        m = re.match(r"\s*(%?[\w.\-]+) = \S+ ([\w\-]+)\((.*?)\)", line)
        if not m:
            continue
        name, op, args = m.group(1), m.group(2), m.group(3)
        operands = re.findall(r"(%?[\w.\-]+)(?:,|$|\))", args)
        operands = [a for a in operands if not a.isdigit()]
        insts[name.lstrip("%")] = (op, [o.lstrip("%") for o in operands])
    return insts


def _transitive_ops(insts, root: str) -> set[str]:
    seen, stack, ops = set(), [root], set()
    while stack:
        cur = stack.pop()
        if cur in seen or cur not in insts:
            continue
        seen.add(cur)
        op, operands = insts[cur]
        ops.add(op)
        stack.extend(operands)
    return ops


def main():
    from flashattention_tpu.parallel import make_mesh
    from flashattention_tpu.parallel.ring import make_ring_attention

    mesh = make_mesh(data=1, model=1, context=8)
    ring = make_ring_attention(mesh, causal=True, backend="xla")
    n = 8 * 64
    q = jax.random.normal(jax.random.key(0), (1, 2, n, 64), jnp.float32)

    hlo = jax.jit(ring).lower(q, q, q).compile().as_text()
    insts = _parse_instructions(hlo)

    permutes = [nm for nm, (op, _) in insts.items()
                if op == "collective-permute"]
    gated, free = [], []
    for nm in permutes:
        # Operand chain of the transfer itself (exclude the permute op).
        deps = set()
        for operand in insts[nm][1]:
            deps |= _transitive_ops(insts, operand)
        blockers = sorted(deps & COMPUTE_OPS)
        (gated if blockers else free).append((nm, blockers))

    out_dir = Path("benchmarks/results")
    out_dir.mkdir(parents=True, exist_ok=True)
    trace_dir = out_dir / "ring_overlap_trace"
    with jax.profiler.trace(str(trace_dir)):
        o, _ = jax.jit(ring)(q, q, q)
        o.block_until_ready()
    assert np.isfinite(np.asarray(o)).all()

    md = [
        "# Ring attention comm/compute overlap — HLO dependency evidence",
        "",
        "`parallel/ring.py` issues step j+1's ppermute *before* step j's",
        "attention compute (explicit double buffering). On the compiled",
        "8-device module, every `collective-permute`'s transitive operand",
        "chain was checked for attention compute ops"
        f" ({sorted(COMPUTE_OPS)}):",
        "",
        f"- collective-permute instructions: **{len(permutes)}**",
        f"- transfers gated by attention compute: **{len(gated)}**",
        f"- transfers dependent only on permute/parameter chains: "
        f"**{len(free)}**",
        "",
        "Zero gated transfers means the schedule may run every ring hop",
        "concurrently with the resident shard's attention — on TPU, XLA",
        "lowers these to async collective-permute-start/done pairs and the",
        "latency-hiding scheduler places the partials' compute inside the",
        "span. (CPU lowers collectives synchronously, so the dependency",
        "structure is the hardware-independent, checkable property.)",
        "",
        f"Profiler trace (manual inspection): `{trace_dir}/`",
        "",
        "Regenerate: `python scripts/ring_overlap_trace.py`",
    ]
    art = out_dir / "ring_overlap_hlo.md"
    art.write_text("\n".join(md) + "\n")

    result = {
        "collective_permutes": len(permutes),
        "gated_by_compute": len(gated),
        "free_to_overlap": len(free),
        "artifact": str(art),
    }
    print(json.dumps(result))
    if gated:
        print("WARNING: some transfers are gated by compute:", gated[:4],
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

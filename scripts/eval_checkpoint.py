"""Evaluate a saved reference checkpoint on this framework's kernels.

The reference's train loop saves ``torch.save(model.state_dict(), ...)`` per
epoch (src/fa3/torch/flashattention_pytorch.py:936-960) and ships no loader.
This CLI is the migration path end-to-end: checkpoint file ->``torch.load``
-> ``models.compat.convert_reference_state_dict`` -> perplexity on text
tokenized with the repo's BPE (GPT-2/tiktoken artifact format).

Usage:
  python scripts/eval_checkpoint.py --selftest [--cpu]
      round-trip a freshly built reference model through torch.save/load and
      assert logits + perplexity parity vs the torch forward.
  python scripts/eval_checkpoint.py CKPT.pt --heads H --text FILE \
      [--tokenizer DIR] [--seq-len N] [--tau T] [--cpu]
      evaluate a real checkpoint: DIR holds encoder.json/vocab.bpe
      (byte-level fallback tokenizer if omitted).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _selftest(backend_cpu: bool) -> int:
    import importlib.util

    import jax
    if backend_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from flashattention_tpu.models.compat import (
        apply_reference_transformer,
        convert_reference_state_dict,
        reference_lm_loss,
    )

    ref_path = Path("/root/reference/src/fa3/torch/flashattention_pytorch.py")
    if not ref_path.exists():
        print("selftest needs the reference checkout", file=sys.stderr)
        return 1
    spec = importlib.util.spec_from_file_location("refmod", ref_path)
    refmod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refmod)

    torch.manual_seed(0)
    heads = 4
    model = refmod.Transformer(
        vocab_size=257, d_model=64, num_heads=heads, num_layers=2, d_ff=64,
        dropout=0.0, max_len=128, use_fused_qkv=True, block_size=32,
    ).eval()

    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "ref.pt"
        torch.save(model.state_dict(), ckpt)  # the reference's save shape
        sd = torch.load(ckpt, map_location="cpu")

    ids = torch.randint(1, 257, (2, 40))
    tgt = torch.randint(1, 257, (2, 40))
    with torch.no_grad():
        logits_ref = model(ids, tgt_mask=refmod.look_ahead_mask_(40)).numpy()
    loss_ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits_ref).reshape(-1, 257), tgt.reshape(-1)
    ).item()

    params = convert_reference_state_dict(sd, num_heads=heads)
    logits = np.asarray(
        apply_reference_transformer(params, jnp.asarray(ids.numpy()))
    )
    loss = float(reference_lm_loss(
        params, jnp.asarray(ids.numpy()), jnp.asarray(tgt.numpy())
    ))
    diff = float(np.abs(logits - logits_ref).max())
    ok = diff < 1e-3 and abs(loss - loss_ref) < 1e-4
    print(json.dumps({
        "selftest": "ok" if ok else "FAIL",
        "logits_max_abs_diff": diff,
        "perplexity_torch": round(math.exp(loss_ref), 4),
        "perplexity_ours": round(math.exp(loss), 4),
        "backend": jax.default_backend(),
    }))
    return 0 if ok else 1


def _evaluate(ns: argparse.Namespace) -> int:
    import jax
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from flashattention_tpu.data import tokenize_bytes
    from flashattention_tpu.models.compat import (
        convert_reference_state_dict, reference_lm_loss,
    )
    from flashattention_tpu.tokenizer import BPETokenizer

    sd = torch.load(ns.checkpoint, map_location="cpu")
    if hasattr(sd, "state_dict"):  # a whole pickled module, not a state_dict
        sd = sd.state_dict()
    params = convert_reference_state_dict(sd, num_heads=ns.heads)
    cfg = params["config"]

    text = Path(ns.text).read_text(encoding="utf-8", errors="ignore")
    if ns.tokenizer:
        tok = BPETokenizer.from_files(
            Path(ns.tokenizer) / "encoder.json", Path(ns.tokenizer) / "vocab.bpe"
        )
        token_ids = np.asarray(tok.encode(text), np.int32)
    else:
        token_ids = tokenize_bytes(text)  # zero-setup byte fallback
    if token_ids.max(initial=0) >= cfg.vocab_size:
        print(
            f"tokenizer ids exceed checkpoint vocab {cfg.vocab_size}",
            file=sys.stderr,
        )
        return 1

    seq = min(ns.seq_len, cfg.max_len)
    n_rows = (len(token_ids) - 1) // seq
    if n_rows == 0:
        print("text too short for one sequence", file=sys.stderr)
        return 1
    inputs = token_ids[: n_rows * seq].reshape(n_rows, seq)
    targets = token_ids[1 : n_rows * seq + 1].reshape(n_rows, seq)

    total, count = 0.0, 0
    step = max(1, ns.batch)
    loss_fn = jax.jit(
        lambda p, i, t: reference_lm_loss(p, i, t, tau=ns.tau)
    )
    for s in range(0, n_rows, step):
        i_b = jnp.asarray(inputs[s : s + step])
        t_b = jnp.asarray(targets[s : s + step])
        total += float(loss_fn(params, i_b, t_b)) * i_b.shape[0]
        count += int(i_b.shape[0])
    loss = total / count
    print(json.dumps({
        "checkpoint": str(ns.checkpoint),
        "layers": cfg.n_layers, "d_model": cfg.d_model,
        "vocab": cfg.vocab_size, "heads": cfg.num_heads,
        "sequences": count, "seq_len": seq,
        "cross_entropy": round(loss, 4),
        "perplexity": round(math.exp(loss), 4),
        "backend": jax.default_backend(),
    }))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", nargs="?", help="torch state_dict .pt file")
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--heads", type=int, default=12,
                    help="head count (not recoverable from a state_dict)")
    ap.add_argument("--text", type=str, help="text file to evaluate on")
    ap.add_argument("--tokenizer", type=str, default=None,
                    help="dir with encoder.json/vocab.bpe")
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--cpu", action="store_true")
    ns = ap.parse_args()
    if ns.selftest:
        return _selftest(ns.cpu)
    if not ns.checkpoint or not ns.text:
        ap.error("need CKPT and --text (or --selftest)")
    return _evaluate(ns)


if __name__ == "__main__":
    raise SystemExit(main())

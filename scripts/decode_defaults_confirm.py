"""Decode defaults confirm: bf16 vs int8 paged decode, NO env overrides.

Thin shim over scripts/decode_ablate.py (ONE timing harness to maintain:
same payload construction, jitted fori_loop with traced trip count,
two-point interleaved timing, pools as jit arguments). The "int8-default"
variant there is exactly the engine-user experience of the round-4
defaults (int8-qk s8-MXU path + payload-aware pages_per_step).

Measured (queue15, TPU v5e): int8-default 94,280 tok/s vs bf16 86,448
= 1.091x at B=64/ctx2048/page64.

    python scripts/decode_defaults_confirm.py [--out FILE]
"""

import os
import runpy
import sys

if __name__ == "__main__":
    args = ["decode_ablate.py", "--variants", "bf16,int8-default"]
    args += sys.argv[1:]
    sys.argv = args
    runpy.run_path(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "decode_ablate.py"),
        run_name="__main__",
    )

"""Figures + ablation tables for sweep results (reference benchmarks/
plotting.py:144-359: per-(d, causal) TFLOPs panels and a markdown table)."""

from __future__ import annotations

import time
from pathlib import Path

from flashattention_tpu.bench.harness import BenchRecord


def plot_sweep(records: list[BenchRecord], out_dir, tag: str) -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ok = [r for r in records if r.status == "ok"]
    dims = sorted({r.head_dim for r in ok})
    causals = sorted({r.causal for r in ok})
    fig, axes = plt.subplots(
        len(causals), max(len(dims), 1),
        figsize=(4 * max(len(dims), 1), 3.2 * len(causals)),
        squeeze=False,
    )
    for i, causal in enumerate(causals):
        for j, d in enumerate(dims):
            ax = axes[i][j]
            sel = [r for r in ok if r.head_dim == d and r.causal == causal]
            series = sorted({(r.algo, r.backend, r.direction) for r in sel})
            for key in series:
                pts = sorted(
                    [(r.seqlen, r.tflops) for r in sel
                     if (r.algo, r.backend, r.direction) == key]
                )
                if pts:
                    ax.plot(*zip(*pts), marker="o", label="/".join(key))
            ax.set_xscale("log", base=2)
            ax.set_title(f"d={d} causal={causal}")
            ax.set_xlabel("seq len")
            ax.set_ylabel("TFLOP/s")
            ax.grid(alpha=0.3)
            if i == 0 and j == 0:
                ax.legend(fontsize=7)
    fig.suptitle("flashattention_tpu sweep (TPU v5e)")
    fig.tight_layout()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{tag}_{time.strftime('%Y%m%d_%H%M%S')}.png"
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def ablation_table_md(records: list[BenchRecord]) -> str:
    """Markdown ablation table (reference plotting.py:280-359)."""
    lines = [
        "| algo | backend | dir | N | d | causal | dtype | ms | TFLOP/s | %roofline | status |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in records:
        lines.append(
            f"| {r.algo} | {r.backend} | {r.direction} | {r.seqlen} | "
            f"{r.head_dim} | {r.causal} | {r.dtype} | {r.mean_ms:.3f} | "
            f"{r.tflops:.1f} | {100 * r.roofline_frac:.1f}% | {r.status} |"
        )
    return "\n".join(lines)

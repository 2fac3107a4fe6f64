"""Render training curves from a run dir's stats.jsonl into one PNG.

The reference's evidence of a working training loop is its TensorBoard
scalars + snapshot grids (training_loop_wo_flow_fullbody.py:419-641); this
renders the equivalent from the rebuild's stats.jsonl so a single committed
image shows G/D losses, the lazy regularizers, ADA p, |D| scores and
sec/kimg evolving over the run.

Usage: python scripts/plot_training_curves.py RUN_DIR [OUT.png]
"""

import json
import sys


def main():
    run_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"{run_dir}/curves.png"

    rows = []
    with open(f"{run_dir}/stats.jsonl") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))

    def series(name):
        xs, ys = [], []
        for r in rows:
            v = r.get(name)
            if v is None:
                continue
            x = r.get("Progress/kimg")
            xs.append(x["mean"] if isinstance(x, dict) else x)
            ys.append(v["mean"] if isinstance(v, dict) else v)
        return xs, ys

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [
        ("losses", ["Loss/G/loss", "Loss/D/loss", "Loss/G/loss_finetune"]),
        ("reconstruction", ["Loss/G/L1", "Loss/G/L1_finetune", "Loss/G/vgg",
                            "Loss/G/mask_loss"]),
        ("regularizers", ["Loss/D/reg", "Loss/r1_penalty"]),
        ("scores", ["Loss/scores/real", "Loss/scores/fake",
                    "Loss/signs/real", "Loss/signs/fake"]),
        ("ADA", ["Progress/augment_p"]),
        ("throughput", ["Timing/sec_per_kimg"]),
    ]
    fig, axes = plt.subplots(2, 3, figsize=(16, 8))
    for ax, (title, names) in zip(axes.flat, panels):
        drew = False
        for n in names:
            xs, ys = series(n)
            if xs:
                ax.plot(xs, ys, label=n.split("/", 1)[1], lw=1.2)
                drew = True
        ax.set_title(title)
        ax.set_xlabel("kimg")
        ax.grid(alpha=0.3)
        if drew:
            ax.legend(fontsize=7)
    fig.suptitle(run_dir.rstrip("/").rsplit("/", 1)[-1])
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(out)


if __name__ == "__main__":
    main()

"""Multi-scene SLAM accuracy table on rendered sequences.

The reference's correctness oracle is a per-scene ATE table over 9 TUM
fr1 scenes / 7 EuRoC scenes with median-of-trials aggregation
(`evaluation/dpvo_eva_tum.py:144-197`, `dpvo_eva_euroc.py:145-216`).
This driver reproduces that protocol shape on rendered scenes (the
zero-egress image has no datasets): a fixed registry of world seeds x
camera paths stands in for the scene list, each scene is tracked
`--trials` times with different SLAM seeds (patch selection is the
stochastic element, as in the reference), and the table reports the
per-scene median ATE for each weight configuration next to the
identity-trajectory floor.

Run: python -u -m wild_video_3d_reconstruction_tpu.eval.synth_suite \
         [--params /tmp/synth_params/step_300] [--trials 3] [--quick]

Prints one JSON line and (with --markdown PATH) writes the table.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from . import synth_ate

# the "dataset": world seed x camera path x planes, named like scenes
SCENES = [
    ("walk_s0", dict(path="walk", seed=0)),
    ("walk_s1", dict(path="walk", seed=1)),
    ("walk_s2", dict(path="walk", seed=2)),
    ("walk_s3", dict(path="walk", seed=3)),
    ("orbit_s0", dict(path="orbit", seed=0)),
    ("orbit_s1", dict(path="orbit", seed=1)),
]


def run_suite(param_sets, frames=60, trials=3, scenes=SCENES, log=print):
    """{config_name: params} -> per-scene medians + overall means."""
    table = {}
    for sname, skw in scenes:
        row = {}
        for cname, params in param_sets.items():
            t0 = time.time()
            runs = [synth_ate.run(params=params, frames=frames,
                                  slam_seed=s, **skw)
                    for s in range(trials)]
            med = float(np.median([r["ate_rmse"] for r in runs]))
            row[cname] = {
                "ate_median": med,
                "ate_all": [round(r["ate_rmse"], 4) for r in runs],
                "floor": runs[0]["ate_floor_identity"],
            }
            log(f"{sname:10s} {cname:8s} median {med:.4f} "
                f"(floor {runs[0]['ate_floor_identity']:.4f}, "
                f"{time.time() - t0:.0f}s)")
        table[sname] = row
    out = {"metric": "synth_suite", "frames": frames, "trials": trials,
           "scenes": table}
    for cname in param_sets:
        out[f"mean_{cname}"] = float(np.mean(
            [table[s][cname]["ate_median"] for s, _ in scenes]))
    out["mean_floor"] = float(np.mean(
        [table[s][next(iter(param_sets))]["floor"] for s, _ in scenes]))
    return out


def to_markdown(out, param_names):
    lines = ["| scene | " + " | ".join(param_names) + " | identity floor |",
             "|---|" + "---|" * (len(param_names) + 1)]
    for sname, row in out["scenes"].items():
        cells = [f"{row[c]['ate_median']:.4f}" for c in param_names]
        lines.append(f"| {sname} | " + " | ".join(cells)
                     + f" | {row[param_names[0]]['floor']:.4f} |")
    means = [f"**{out[f'mean_{c}']:.4f}**" for c in param_names]
    lines.append("| **mean** | " + " | ".join(means)
                 + f" | **{out['mean_floor']:.4f}** |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", type=str, default=None,
                    help="orbax checkpoint dir (adds a 'trained' column)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="2 scenes, 1 trial (smoke)")
    ap.add_argument("--markdown", type=str, default=None)
    args = ap.parse_args()

    param_sets = {"random": None}
    if args.params:
        import jax

        from ..models.vonet import init_vonet
        from ..train.trainer import load_checkpoint

        param_sets["trained"] = load_checkpoint(
            args.params, init_vonet(jax.random.PRNGKey(0)))

    scenes = SCENES[:2] if args.quick else SCENES
    trials = 1 if args.quick else args.trials
    out = run_suite(param_sets, frames=args.frames, trials=trials,
                    scenes=scenes)
    if args.markdown:
        with open(args.markdown, "w", encoding="utf-8") as f:
            f.write(to_markdown(out, list(param_sets)) + "\n")
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

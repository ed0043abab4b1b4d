"""Adjudication probe for the ours-side PFCN trained bimodality (VERDICT r3
item 6): rerun 'collapsed' seeds with early stopping disabled and record the
full per-epoch valid-score trajectory.

Hypothesis under test: the low-NDCG seeds (2020/2022/2024 at ~0.02) are not
adversarial collapses but early-stop truncations of a slow takeoff — the
filter/backbone pass runs only every train_epoch_interval=5 epochs
(reference trainer.py:875-898), so stopping_step=10 gives the recommender
only ~2 update opportunities to beat the best-so-far before the run is
killed; seed 2021 drifts upward just enough inside each patience window to
survive and eventually reaches ~0.19.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

from recbole_fairrec_tpu.quick_start import run_recbole  # noqa: E402


def probe(seed, epochs=300):
    out_path = os.path.join(REPO, "runs", "parity", "probe",
                            f"PFCN_PMF_cm_ours_{seed}_nostop.json")
    if os.path.exists(out_path):
        print(f"[probe] skip {out_path}")
        return
    traj = []

    def cb(epoch_idx, valid_score):
        traj.append([int(epoch_idx), float(valid_score)])

    result = run_recbole(
        model="PFCN_PMF", dataset="ml-100k-fair",
        config_dict={
            "data_path": os.path.join(REPO, "dataset"),
            "checkpoint_dir": os.path.join(REPO, "runs", "parity", "probe", "ckpt"),
            "seed": seed, "use_gpu": False, "show_progress": False,
            "sst_attr_list": ["gender"],
            "LABEL_FIELD": "label", "threshold": {"rating": 3.0},
            "load_col": {"inter": ["user_id", "item_id", "rating"],
                         "user": ["user_id", "gender"]},
            "filter_mode": "cm", "save_sst_embed": False,
            "epochs": epochs, "stopping_step": epochs,  # early stop disabled
        },
        callback_fn=cb,
    )
    payload = {
        "seed": seed, "epochs": epochs, "stopping_step": "disabled",
        "best_valid_score": float(result["best_valid_score"]),
        "valid_trajectory": traj,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f)
    print(f"[probe] wrote {out_path}: best={payload['best_valid_score']:.4f}")


if __name__ == "__main__":
    for seed in [int(s) for s in (sys.argv[1:] or [2020, 2024])]:
        probe(seed)

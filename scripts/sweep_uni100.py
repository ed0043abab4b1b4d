"""Sweep eval_macro_rows_sampled to find the uni100 sweet spot on TPU."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from recbole_fairrec_tpu.config import Config
from recbole_fairrec_tpu.data import create_dataset, data_preparation
from recbole_fairrec_tpu.trainer import Trainer
from recbole_fairrec_tpu.utils import get_model, init_seed


def main():
    config = Config(
        model="PFCN_PMF",
        dataset=bench.DS,
        config_dict={
            "data_path": bench._ensure_dataset(),
            "load_col": {"inter": ["user_id", "item_id", "rating"],
                         "user": ["user_id", "gender"]},
            "filter_mode": "none",
            "embedding_size": bench.EMB,
            "metrics": ["NDCG", "Recall", "Hit", "MRR"],
            "topk": [10],
            "valid_metric": "NDCG@10",
            "eval_args": {"split": {"RS": [0.8, 0.1, 0.1]}, "order": "RO",
                          "group_by": "user", "mode": "uni100"},
            "show_progress": False,
            "save_dataset": True,
            "checkpoint_dir": os.path.join(bench.DATA_DIR, "saved"),
        },
    )
    init_seed(config["seed"], config["reproducibility"])
    dataset = create_dataset(config)
    _, valid_data, _ = data_preparation(config, dataset)
    model = get_model(config["model"])(config, valid_data.dataset)
    trainer = Trainer(config, model)
    n_users = valid_data.pr_end
    for rows in (131072, 262144, 524288, 1048576, 4194304):
        trainer.config["eval_macro_rows_sampled"] = rows
        trainer.evaluate(valid_data, load_best_model=False)  # warm/compile
        t0 = time.perf_counter()
        trainer.evaluate(valid_data, load_best_model=False)
        dt = time.perf_counter() - t0
        print(f"rows={rows:>8}  {dt:6.2f}s  {n_users/dt:8.1f} users/s", flush=True)


if __name__ == "__main__":
    main()

"""Resume / eval-only CLI (parity: resume_run_recbole.py at the reference
root) — rebuilds everything from a checkpoint and evaluates on test."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recbole_fairrec_tpu import load_data_and_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_file", "-f", type=str, required=True, help="saved checkpoint")
    parser.add_argument("--resume", action="store_true", help="continue training instead of eval-only")
    args, _ = parser.parse_known_args()

    config, model, trainer, dataset, train_data, valid_data, test_data = load_data_and_model(
        args.model_file
    )
    if args.resume:
        trainer.resume_checkpoint(args.model_file)
        trainer.fit(train_data, valid_data, saved=True, show_progress=config["show_progress"])
    result = trainer.evaluate(test_data, load_best_model=True, model_file=args.model_file)
    print("test result:", dict(result) if result else result)


if __name__ == "__main__":
    main()

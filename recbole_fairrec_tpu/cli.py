"""Console entry point (`run_recbole` script installed by pyproject.toml).

Parity surface: the reference repo-root ``run_recbole.py:14-26`` argparse
flags (``--model/-m``, ``--dataset/-d``, ``--config_files/-c``); extra
``--key=value`` args are swallowed by the Config layer with highest
priority (reference configurator.py:145-165).
"""

import argparse


def main(argv=None):
    from recbole_fairrec_tpu import run_recbole

    parser = argparse.ArgumentParser(prog="run_recbole")
    parser.add_argument("--model", "-m", type=str, default="FOCF", help="name of models")
    parser.add_argument("--dataset", "-d", type=str, default="ml-100k", help="name of datasets")
    parser.add_argument("--config_files", "-c", type=str, default=None, help="config files")
    args, _ = parser.parse_known_args(argv)
    config_file_list = args.config_files.strip().split(" ") if args.config_files else None
    run_recbole(model=args.model, dataset=args.dataset, config_file_list=config_file_list)


if __name__ == "__main__":
    main()

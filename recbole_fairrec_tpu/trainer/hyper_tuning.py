"""Hyperparameter search driver.

Parity: recbole/trainer/hyper_tuning.py — same public surface
(``HyperTuning(objective_function, space|params_file|params_dict, algo,
max_evals, fixed_config_file_list)``, ``.run()``, ``.export_result()``,
``best_params`` / ``params2result``) and the same params-file grammar
(lines of ``<name> <type> <spec>`` with types choice / uniform / quniform /
loguniform, :177-202).

The reference wraps hyperopt; this environment has no hyperopt, so the two
algorithms that matter are implemented directly: ``exhaustive`` (grid over
choice spaces — the reference's custom suggest fn, :84-126) and ``random``
(uniform sampling of each dimension). The objective contract is unchanged:
one full train+test per trial via ``objective_function``.
"""

from __future__ import annotations

import ast
from itertools import product
from logging import getLogger

import numpy as np

from ..utils.common import dict2str


class ExhaustiveSearchError(Exception):
    pass


class _Dim:
    """One search dimension."""

    def __init__(self, name, kind, spec):
        self.name = name
        self.kind = kind
        self.spec = spec

    def enumerate(self):
        if self.kind == "choice":
            return list(self.spec)
        raise ExhaustiveSearchError(
            "Exhaustive search is only possible with 'choice' parameters; "
            f"[{self.name}] is [{self.kind}]"
        )

    def sample(self, rng):
        if self.kind == "choice":
            return self.spec[rng.randint(len(self.spec))]
        if self.kind == "uniform":
            low, high = self.spec
            return float(rng.uniform(low, high))
        if self.kind == "quniform":
            low, high, q = self.spec
            return float(np.round(rng.uniform(low, high) / q) * q)
        if self.kind == "loguniform":
            low, high = self.spec
            return float(np.exp(rng.uniform(low, high)))
        raise ValueError(f"unknown parameter type [{self.kind}]")


class HyperTuning:
    def __init__(
        self,
        objective_function,
        space=None,
        params_file=None,
        params_dict=None,
        fixed_config_file_list=None,
        algo="exhaustive",
        max_evals=100,
        seed=2020,
    ):
        self.best_score = None
        self.best_params = None
        self.best_test_result = None
        self.params2result = {}
        self.logger = getLogger()

        self.objective_function = objective_function
        self.max_evals = max_evals
        self.fixed_config_file_list = fixed_config_file_list
        self.seed = seed

        if space:
            self.space = space
        elif params_file:
            self.space = self._build_space_from_file(params_file)
        elif params_dict:
            self.space = self._build_space_from_dict(params_dict)
        else:
            raise ValueError("at least one of `space`, `params_file` and `params_dict` should be provided")

        if isinstance(algo, str):
            if algo == "exhaustive":
                self.algo = "exhaustive"
                self.max_evals = int(
                    np.prod([len(d.enumerate()) for d in self.space.values()])
                )
            elif algo == "random":
                self.algo = "random"
            else:
                raise ValueError(f"Illegal algo [{algo}]")
        else:
            self.algo = algo

    # ---------------------------------------------------------------- spaces

    @staticmethod
    def _build_space_from_file(file):
        """Grammar: ``<name> <type> <spec>`` per line (reference :48-72)."""
        space = {}
        with open(file, "r") as fp:
            for line in fp:
                para_list = line.strip().split(" ")
                if len(para_list) < 3:
                    continue
                name, kind = para_list[0], para_list[1]
                value = " ".join(para_list[2:])
                if kind == "choice":
                    space[name] = _Dim(name, "choice", ast.literal_eval(value))
                elif kind in ("uniform", "loguniform"):
                    low, high = value.strip().split(" ")
                    space[name] = _Dim(name, kind, (float(low), float(high)))
                elif kind == "quniform":
                    low, high, q = value.strip().split(" ")
                    space[name] = _Dim(name, kind, (float(low), float(high), float(q)))
                else:
                    raise ValueError(f"Illegal param type [{kind}]")
        return space

    @staticmethod
    def _build_space_from_dict(config_dict):
        space = {}
        for kind, params in config_dict.items():
            if kind == "choice":
                for name, value in params.items():
                    space[name] = _Dim(name, "choice", value)
            elif kind in ("uniform", "loguniform"):
                for name, value in params.items():
                    space[name] = _Dim(name, kind, (float(value[0]), float(value[1])))
            elif kind == "quniform":
                for name, value in params.items():
                    space[name] = _Dim(
                        name, kind, (float(value[0]), float(value[1]), float(value[2]))
                    )
            else:
                raise ValueError(f"Illegal param type [{kind}]")
        return space

    # ---------------------------------------------------------------- output

    @staticmethod
    def params2str(params):
        return ", ".join(f"{name}:{value}" for name, value in params.items())

    def _print_result(self, result_dict):
        self.logger.info("current best valid score: %.4f" % result_dict["best_valid_score"])
        self.logger.info("current best valid result:")
        self.logger.info(result_dict["best_valid_result"])
        self.logger.info("current test result:")
        self.logger.info(result_dict["test_result"])

    def export_result(self, output_file=None):
        with open(output_file, "w") as fp:
            for params in self.params2result:
                fp.write(params + "\n")
                fp.write(
                    "Valid result:\n"
                    + dict2str(self.params2result[params]["best_valid_result"])
                    + "\n"
                )
                fp.write(
                    "Test result:\n"
                    + dict2str(self.params2result[params]["test_result"])
                    + "\n\n"
                )

    # ------------------------------------------------------------------ run

    def trial(self, params):
        config_dict = dict(params)
        params_str = self.params2str(params)
        self.logger.info("running parameters:")
        self.logger.info(str(config_dict))
        result_dict = self.objective_function(config_dict, self.fixed_config_file_list)
        self.params2result[params_str] = result_dict
        score, bigger = result_dict["best_valid_score"], result_dict["valid_score_bigger"]

        if self.best_score is None:
            improved = True
        else:
            improved = score > self.best_score if bigger else score < self.best_score
        if improved:
            self.best_score = score
            self.best_params = params
            self.best_test_result = result_dict["test_result"]
            self._print_result(result_dict)
        return score

    def _candidates(self):
        if self.algo == "exhaustive":
            names = list(self.space.keys())
            grids = [self.space[n].enumerate() for n in names]
            for combo in product(*grids):
                yield dict(zip(names, combo))
        elif self.algo == "random":
            rng = np.random.RandomState(self.seed)
            for _ in range(self.max_evals):
                yield {n: d.sample(rng) for n, d in self.space.items()}
        else:  # custom callable: algo(space, rng) -> iterable of param dicts
            rng = np.random.RandomState(self.seed)
            yield from self.algo(self.space, rng)

    def run(self):
        for i, params in enumerate(self._candidates()):
            if i >= self.max_evals:
                break
            self.trial(params)

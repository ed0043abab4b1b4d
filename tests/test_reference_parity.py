"""Differential parity tests: run the REFERENCE metric implementations
(mounted read-only at /root/reference, torch CPU) and ours on identical
random inputs and demand matching values.

This is the strongest parity evidence available without training runs: the
metric layer is where the reference's numbers are produced, so agreement here
pins NDCG/Recall/... and all six fairness metrics to the reference bit-wise
(up to the documented float64 rounding)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_metrics(ref_recbole):
    from recbole.evaluator import metrics as ref_m

    return ref_m


class Cfg(dict):
    def __getitem__(self, k):
        return self.get(k)


class TorchStruct:
    """Minimal DataStruct over torch tensors for the reference metrics."""

    def __init__(self, data):
        import torch

        self._d = {}
        for k, v in data.items():
            if isinstance(v, np.ndarray):
                self._d[k] = torch.from_numpy(v)
            else:
                self._d[k] = v

    def get(self, name):
        return self._d[name]


class NpStruct:
    def __init__(self, data):
        self._d = data

    def get(self, name):
        return self._d[name]


def _rand_eval_data(seed=0, n_users=50, max_k=5):
    rng = np.random.RandomState(seed)
    pos_len = rng.randint(1, 12, n_users)
    pos_index = (rng.rand(n_users, max_k) < 0.35).astype(np.int64)
    rec_topk = np.concatenate([pos_index, pos_len.reshape(-1, 1)], axis=1)
    n_pos = 120
    data = {
        "rec.topk": rec_topk,
        "rec.items": rng.randint(1, 40, (n_users, max_k)),
        "data.num_items": 40,
        "rec.positive_score": rng.rand(n_pos),
        "rec.negative_score": rng.rand(n_pos),
        "data.positive_i": rng.randint(1, 40, n_pos),
        "data.negative_i": rng.randint(1, 40, n_pos),
        "data.gender": rng.randint(0, 2, n_pos),
    }
    return data


TOPK_CFG = dict(metric_decimal_place=4, topk=[3, 5])
FAIR_CFG = dict(
    metric_decimal_place=4, sst_attr_list=["gender"], eval_args={"mode": "uni100"}
)


@pytest.mark.parametrize(
    "name,cfg",
    [
        ("Hit", TOPK_CFG), ("MRR", TOPK_CFG), ("MAP", TOPK_CFG),
        ("Recall", TOPK_CFG), ("NDCG", TOPK_CFG), ("Precision", TOPK_CFG),
        ("ItemCoverage", TOPK_CFG), ("ShannonEntropy", TOPK_CFG),
        ("GiniIndex", TOPK_CFG),
        ("NonParityUnfairness", FAIR_CFG),
        ("ValueUnfairness", FAIR_CFG),
        ("AbsoluteUnfairness", FAIR_CFG),
        ("UnderUnfairness", FAIR_CFG),
        ("OverUnfairness", FAIR_CFG),
        ("DifferentialFairness", FAIR_CFG),
    ],
)
def test_metric_matches_reference(ref_metrics, name, cfg):
    from recbole_fairrec_tpu.evaluator import metrics as our_m

    for seed in (0, 1, 2):
        data = _rand_eval_data(seed=seed)
        ref_cls = getattr(ref_metrics, name)
        our_cls = getattr(our_m, name)
        ref_result = ref_cls(Cfg(cfg)).calculate_metric(TorchStruct(data))
        our_result = our_cls(Cfg(cfg)).calculate_metric(NpStruct(data))
        assert set(ref_result.keys()) == set(our_result.keys()), name
        for key in ref_result:
            assert our_result[key] == pytest.approx(ref_result[key], abs=2e-4), (
                f"{name}[{key}] seed={seed}: ours={our_result[key]} "
                f"ref={ref_result[key]}"
            )


def test_full_mode_fairness_matches_reference(ref_metrics):
    from recbole_fairrec_tpu.evaluator import metrics as our_m

    cfg = dict(metric_decimal_place=4, sst_attr_list=["gender"],
               eval_args={"mode": "full"})
    data = _rand_eval_data(seed=3)
    for name in ("ValueUnfairness", "AbsoluteUnfairness", "UnderUnfairness", "OverUnfairness"):
        ref_result = getattr(ref_metrics, name)(Cfg(cfg)).calculate_metric(TorchStruct(data))
        our_result = getattr(our_m, name)(Cfg(cfg)).calculate_metric(NpStruct(data))
        for key in ref_result:
            assert our_result[key] == pytest.approx(ref_result[key], abs=2e-4), name


def test_tail_popularity_metrics_match_reference(ref_metrics):
    from recbole_fairrec_tpu.evaluator import metrics as our_m

    rng = np.random.RandomState(4)
    count_items = {int(i): int(c) for i, c in zip(range(1, 40), rng.randint(1, 100, 39))}
    data = {
        "rec.items": rng.randint(1, 40, (30, 5)),
        "data.count_items": count_items,
    }
    for name, extra in (
        ("TailPercentage", {"tail_ratio": 0.2}),
        ("PopularityPercentage", {"popularity_ratio": 0.2}),
        ("AveragePopularity", {}),
    ):
        cfg = Cfg(dict(metric_decimal_place=4, topk=[3, 5], **extra))
        ref_result = getattr(ref_metrics, name)(cfg).calculate_metric(TorchStruct(data))
        our_result = getattr(our_m, name)(cfg).calculate_metric(NpStruct(data))
        for key in ref_result:
            assert our_result[key] == pytest.approx(ref_result[key], abs=2e-4), name

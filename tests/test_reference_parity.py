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


def test_reference_multiuser_negative_slice_defect(ref_recbole):
    """The reference collector's sampled-mode negative extraction
    (collector.py:191-200) slices interaction rows [pos_len : 2·pos_len]
    globally — only the negatives when the batch holds ONE user. A
    multi-user batch (FairGo_PMF.yaml raises eval_batch_size to 16384 →
    ~10 users/batch on ml-100k) crosses user blocks, pairing users with
    items they never scored: scores_tensor[u, i] = −inf leaks into
    rec.negative_score and Value/Absolute/Under-Unfairness become NaN
    (observed in every FairGo reference parity run; Over survives only
    because max(0, −inf−r) clips to 0 — silently wrong). Ours extracts each
    user's own first negative block and must stay finite and exactly equal
    to the scored negatives."""
    import torch

    from recbole.evaluator.collector import Collector as RefCollector
    from recbole_fairrec_tpu.evaluator.collector import Collector as OurCollector

    n_items = 12
    cfg = dict(
        metrics=["ValueUnfairness"], topk=[2], sst_attr_list=["gender"],
        ITEM_ID_FIELD="item_id", USER_ID_FIELD="user_id", LABEL_FIELD="label",
        eval_args={"mode": "uni20", "order": "RO", "split": {"RS": [8, 1, 1]},
                   "group_by": "user"},
        metric_decimal_place=4,
    )
    # two users, times=1: user A rows [p p p n n n], user B rows [p n].
    # pos_len=4 → the reference's global slice [4:8] picks rows
    # [A-neg2, A-neg3, B-pos, B-neg] and pairs them with users [A, A, A, B]:
    # (A, B's positive item 7) was never scored by A → −inf.
    rows_items = np.array([1, 2, 3, 4, 5, 6,    # user A: pos 1,2,3; negs 4,5,6
                           7, 8])               # user B: pos 7; neg 8
    rows_gender = np.array([0] * 6 + [1] * 2)
    positive_u = np.array([0, 0, 0, 1])
    positive_i = np.array([1, 2, 3, 7])
    # each user's scored cells: own pos + own negs; everything else −inf
    scores = np.full((2, n_items), -np.inf, dtype=np.float32)
    scores[0, [1, 2, 3, 4, 5, 6]] = [0.9, 0.8, 0.75, 0.1, 0.2, 0.3]
    scores[1, [7, 8]] = [0.7, 0.35]

    ref_collector = RefCollector(Cfg(cfg))
    ref_inter = {
        "item_id": torch.from_numpy(rows_items),
        "gender": torch.from_numpy(rows_gender),
    }

    class _Inter(dict):
        @property
        def columns(self):
            return list(self.keys())

    ref_collector.eval_batch_collect(
        torch.from_numpy(scores), _Inter(ref_inter),
        torch.from_numpy(positive_u), torch.from_numpy(positive_i),
    )
    ref_neg = ref_collector.data_struct.get("rec.negative_score").numpy()
    assert np.isinf(ref_neg).any(), "reference defect vanished — re-examine"

    from recbole_fairrec_tpu.data.interaction import Interaction

    our_collector = OurCollector(Cfg(cfg))
    our_collector.eval_batch_collect(
        scores, Interaction({"item_id": rows_items, "gender": rows_gender}),
        positive_u, positive_i,
    )
    our_neg = np.asarray(our_collector.data_struct.get("rec.negative_score"))
    assert np.isfinite(our_neg).all()
    # first negative block per user, aligned with that user's positives:
    # user A's negs 4,5,6 then user B's neg 8
    np.testing.assert_allclose(our_neg, [0.1, 0.2, 0.3, 0.35], rtol=1e-6)

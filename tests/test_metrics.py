"""Golden-value metric tests — hand-computed expectations mirroring the
reference formulas (recbole/evaluator/metrics.py)."""

import numpy as np
import pytest

from recbole_fairrec_tpu.evaluator import Collector, DataStruct, Evaluator
from recbole_fairrec_tpu.evaluator.metrics import (
    NDCG, MRR, Hit, Recall, Precision, MAP,
    ValueUnfairness, AbsoluteUnfairness, UnderUnfairness, OverUnfairness,
    NonParityUnfairness, DifferentialFairness, GiniIndex, ItemCoverage,
    ShannonEntropy,
)


class Cfg(dict):
    def __getitem__(self, k):
        return self.get(k)


def topk_struct(pos_index, pos_len):
    ds = DataStruct()
    ds.set("rec.topk", np.concatenate([pos_index, pos_len.reshape(-1, 1)], axis=1))
    return ds


CFG = Cfg(metric_decimal_place=4, topk=[1, 2, 3])


def test_hit_mrr_recall_precision_ndcg_golden():
    # user0: hits at ranks 1 and 3 of 2 positives; user1: no hits of 1 positive
    pos_index = np.array([[1, 0, 1], [0, 0, 0]])
    pos_len = np.array([2, 1])
    ds = topk_struct(pos_index, pos_len)

    hit = Hit(CFG).calculate_metric(ds)
    assert hit["hit@1"] == 0.5 and hit["hit@3"] == 0.5

    mrr = MRR(CFG).calculate_metric(ds)
    assert mrr["mrr@1"] == 0.5 and mrr["mrr@3"] == 0.5

    rec = Recall(CFG).calculate_metric(ds)
    assert rec["recall@1"] == 0.25  # (1/2 + 0)/2
    assert rec["recall@3"] == 0.5   # (2/2 + 0)/2

    pre = Precision(CFG).calculate_metric(ds)
    assert pre["precision@1"] == 0.5
    assert pre["precision@3"] == round((2 / 3 + 0) / 2, 4)

    ndcg = NDCG(CFG).calculate_metric(ds)
    # user0: dcg@3 = 1 + 1/log2(4); idcg@3 (2 pos) = 1 + 1/log2(3)
    u0 = (1 + 1 / np.log2(4)) / (1 + 1 / np.log2(3))
    assert ndcg["ndcg@3"] == round(u0 / 2, 4)
    assert ndcg["ndcg@1"] == 0.5


def test_map_golden():
    pos_index = np.array([[1, 0, 1]])
    pos_len = np.array([2])
    ds = topk_struct(pos_index, pos_len)
    m = MAP(CFG).calculate_metric(ds)
    # AP@3 = (P@1 + P@3)/min(2,3) = (1 + 2/3)/2
    assert m["map@3"] == round((1 + 2 / 3) / 2, 4)


def test_value_unfairness_full_mode_golden():
    cfg = Cfg(metric_decimal_place=4, sst_attr_list=["gender"],
              eval_args={"mode": "full"})
    ds = DataStruct()
    # two items; item0 scored by group0 (0.8) and group1 (0.2); item1 only group0 (0.5)
    ds.set("rec.positive_score", np.array([0.8, 0.2, 0.5]))
    ds.set("data.positive_i", np.array([10, 10, 20]))
    ds.set("data.gender", np.array([1, 2, 1]))
    m = ValueUnfairness(cfg).calculate_metric(ds)
    # denominators: count + 1e-5
    d = 1 + 1e-5
    # item10: diff = (0.8/d - 1/d) - (0.2/d - 1/d); item20: (0.5/d - 1/d) - (0 - 0)
    i10 = abs((0.8 / d - 1 / d) - (0.2 / d - 1 / d))
    i20 = abs((0.5 / d - 1 / d) - 0.0)
    expected = round((i10 + i20) / 2, 4)
    assert m["Value Unfairness of sensitive attribute gender"] == expected


def test_under_over_absolute_consistency():
    cfg = Cfg(metric_decimal_place=6, sst_attr_list=["gender"],
              eval_args={"mode": "full"})
    ds = DataStruct()
    ds.set("rec.positive_score", np.array([0.9, 0.1]))
    ds.set("data.positive_i", np.array([5, 5]))
    ds.set("data.gender", np.array([0, 1]))
    under = UnderUnfairness(cfg).calculate_metric(ds)
    over = OverUnfairness(cfg).calculate_metric(ds)
    absu = AbsoluteUnfairness(cfg).calculate_metric(ds)
    ku = "Underestimation Unfairness of sensitive attribute gender"
    ko = "Overestimation Unfairness of sensitive attribute gender"
    ka = "Absolute Unfairness of sensitive attribute gender"
    # preds underestimate the implicit true=1 label; over-gap is 0
    assert under[ku] > 0
    assert over[ko] == 0
    assert absu[ka] == under[ku]


def test_nonparity_binary_and_multi():
    cfg = Cfg(metric_decimal_place=4, sst_attr_list=["gender"])
    ds = DataStruct()
    ds.set("rec.positive_score", np.array([1.0, 0.0, 0.6, 0.4]))
    ds.set("data.gender", np.array([0, 0, 1, 1]))
    m = NonParityUnfairness(cfg).calculate_metric(ds)
    assert m["NonParity Unfairness of sensitive attribute gender"] == 0.0
    ds.set("data.gender", np.array([0, 1, 2, 2]))
    m = NonParityUnfairness(cfg).calculate_metric(ds)
    expected = round(float(np.std([1.0, 0.0, 0.5])), 4)
    assert m["NonParity Unfairness of sensitive attribute gender"] == expected


def test_differential_fairness_golden():
    cfg = Cfg(metric_decimal_place=6, sst_attr_list=["gender"])
    ds = DataStruct()
    ds.set("rec.positive_score", np.array([0.9, 0.1, 0.5, 0.5], dtype=np.float64))
    ds.set("data.positive_i", np.array([1, 1, 2, 2]))
    ds.set("data.gender", np.array([0, 1, 0, 1]))
    m = DifferentialFairness(cfg).calculate_metric(ds)
    alpha = 1.0 / 2
    p = lambda s: (s + alpha) / (1 + 1.0)
    e1 = abs(np.log(np.float32(p(0.9))) - np.log(np.float32(p(0.1))))
    e2 = abs(np.log(np.float32(p(0.5))) - np.log(np.float32(p(0.5))))
    expected = round(float(np.mean([e1, e2])), 6)
    assert m["Differential Fairness of sensitive attribute gender"] == pytest.approx(expected, abs=1e-5)


def test_gini_coverage_entropy():
    cfg = Cfg(metric_decimal_place=4, topk=[2])
    ds = DataStruct()
    ds.set("rec.items", np.array([[1, 2], [1, 3]]))
    ds.set("data.num_items", 5)
    gini = GiniIndex(cfg).calculate_metric(ds)["giniindex@2"]
    # counts sorted [1,1,2]; idx = [3,4,5]; sum((2i-6)*c)/4/5
    expected = round(((0 * 1) + (2 * 1) + (4 * 2)) / 4 / 5, 4)
    assert gini == expected
    cov = ItemCoverage(cfg).calculate_metric(ds)["itemcoverage@2"]
    assert cov == round(3 / 5, 4)
    ent = ShannonEntropy(cfg).calculate_metric(ds)["shannonentropy@2"]
    p1, p2 = 2 / 4, 1 / 4
    expected = round((-(p1 * np.log(p1)) - 2 * (p2 * np.log(p2))) / 3, 4)
    assert ent == expected


def test_collector_topk_and_positive_payloads():
    cfg = Cfg(
        metric_decimal_place=4, topk=[2],
        metrics=["NDCG", "NonParityUnfairness"],
        eval_args={"mode": "uni100"}, sst_attr_list=["gender"],
        ITEM_ID_FIELD="item_id", USER_ID_FIELD="user_id", LABEL_FIELD="label",
        ugf_metric=None,
    )
    collector = Collector(cfg)
    scores = np.array([[0.1, 0.9, 0.5], [0.2, 0.3, 0.8]])
    from recbole_fairrec_tpu.data.interaction import Interaction
    inter = Interaction({
        "item_id": np.array([1, 2, 0, 1]),
        "gender": np.array([1, 2, 1, 2]),
    })
    positive_u = np.array([0, 1])
    positive_i = np.array([1, 2])
    collector.eval_batch_collect(scores, inter, positive_u, positive_i)
    struct = collector.get_data_struct()
    topk = struct.get("rec.topk")
    # user0 top2 = items (1, 2) -> hits (1, 0); user1 top2 = (2, 1) -> (1, 0)
    assert topk.tolist() == [[1, 0, 1], [1, 0, 1]]
    np.testing.assert_allclose(struct.get("rec.positive_score"), [0.9, 0.8])

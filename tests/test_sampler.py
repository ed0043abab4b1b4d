"""Sampler semantics tests (reference contract: recbole/sampler/sampler.py)."""

import numpy as np
import pytest

from recbole_fairrec_tpu.config import Config
from recbole_fairrec_tpu.data import Dataset, create_samplers
from recbole_fairrec_tpu.sampler import AliasTable, Sampler


def _built(tiny_data_path, **kw):
    cd = {
        "data_path": str(tiny_data_path),
        "load_col": {"inter": ["user_id", "item_id", "rating"], "user": ["user_id", "gender"]},
        "neg_sampling": {"uniform": 1},
        **kw,
    }
    c = Config(model="FOCF", dataset="tiny", config_dict=cd)
    ds = Dataset(c)
    return c, ds, ds.build()


def test_negatives_exclude_used(tiny_data_path):
    c, ds, built = _built(tiny_data_path)
    train_sampler, valid_sampler, test_sampler = create_samplers(c, ds, built)
    train = built[0]
    uids = np.asarray(train.inter_feat["user_id"])
    iids = np.asarray(train.inter_feat["item_id"])
    neg = train_sampler.sample_by_user_ids(uids, iids, 2)
    assert len(neg) == 2 * len(uids)
    assert neg.min() >= 1  # PAD never sampled
    # no sampled negative may collide with any train positive of that user
    used = set(zip(uids.tolist(), iids.tolist()))
    tiled = np.tile(uids, 2)
    for u, v in zip(tiled.tolist(), neg.tolist()):
        assert (u, v) not in used


def test_phase_accumulation(tiny_data_path):
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "uniform")
    assert len(s.used_ids["train"]) <= len(s.used_ids["valid"]) <= len(s.used_ids["test"])
    test_sampler = s.set_phase("test")
    all_pairs = set()
    for part in built:
        uids = np.asarray(part.inter_feat["user_id"])
        iids = np.asarray(part.inter_feat["item_id"])
        all_pairs |= set(zip(uids.tolist(), iids.tolist()))
    uids = np.asarray(built[2].inter_feat["user_id"])
    iids = np.asarray(built[2].inter_feat["item_id"])
    neg = test_sampler.sample_by_user_ids(uids, iids, 3)
    tiled = np.tile(uids, 3)
    for u, v in zip(tiled.tolist(), neg.tolist()):
        assert (u, v) not in all_pairs


def test_strided_output_layout(tiny_data_path):
    """out[i + k*len] belongs to key i (reference sampler.py:145-158)."""
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "uniform").set_phase("train")
    uids = np.asarray(built[0].inter_feat["user_id"])[:5]
    neg = s.sample_by_key_ids(uids, 4)
    assert neg.shape == (20,)


def test_alias_table_distribution():
    np.random.seed(0)
    candidates = np.array([1] * 70 + [2] * 20 + [3] * 10)
    table = AliasTable(candidates)
    draws = table.sample(20000)
    freq = np.bincount(draws, minlength=4)[1:4] / 20000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)


def test_popularity_sampling(tiny_data_path):
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "popularity").set_phase("train")
    uids = np.asarray(built[0].inter_feat["user_id"])
    iids = np.asarray(built[0].inter_feat["item_id"])
    neg = s.sample_by_user_ids(uids, iids, 1)
    assert len(neg) == len(uids)


def test_group_constrained_sampling(tiny_data_path):
    """The latent fairness hooks: negatives restricted to the user's group."""
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "uniform").set_phase("train")
    n_items = ds.item_num
    s.user_group_label = np.arange(ds.user_num) % 2
    s.item_group_label = np.arange(n_items) % 3  # labels 0,1,2; 2 = unconstrained
    uids = np.asarray(built[0].inter_feat["user_id"])[:50]
    iids = np.asarray(built[0].inter_feat["item_id"])[:50]
    neg = s.sample_by_user_ids(uids, iids, 1)
    for u, v in zip(uids.tolist(), neg.tolist()):
        u_lab, i_lab = u % 2, v % 3
        assert not ((u_lab == 0 and i_lab == 1) or (u_lab == 1 and i_lab == 0))


def test_single_key_fast_path_matches_generic_stream(tiny_data_path):
    """The eval fast path (all key_ids equal) must consume the numpy RNG
    stream EXACTLY like the generic path — same sampling() call sizes in
    the same order — and return the same draws (reference parity: the
    uni100 negative stream is part of the differential-test surface)."""
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "uniform").set_phase("test")

    def generic(sampler, key_ids, num):
        # the pre-r4 algorithm, verbatim (sampler.py history)
        key_ids = np.asarray(key_ids)
        total_num = len(key_ids) * num
        tiled_keys = np.tile(key_ids, num)
        value_ids = sampler.sampling(total_num)
        bad = sampler._membership(tiled_keys, value_ids)
        while bad.any():
            idx = np.nonzero(bad)[0]
            resampled = sampler.sampling(len(idx))
            value_ids[idx] = resampled
            still_bad = sampler._membership(tiled_keys[idx], resampled)
            bad = np.zeros(total_num, dtype=bool)
            bad[idx[still_bad]] = True
        return value_ids.astype(np.int64)

    uids = np.asarray(built[2].inter_feat["user_id"])
    some_user = int(uids[0])
    keys = np.full(37, some_user)

    np.random.seed(77)
    fast = s.sample_by_key_ids(keys, 100)
    state_after_fast = np.random.get_state()[1][:4].tolist()

    np.random.seed(77)
    ref = generic(s, keys, 100)
    state_after_ref = np.random.get_state()[1][:4].tolist()

    np.testing.assert_array_equal(fast, ref)
    assert state_after_fast == state_after_ref  # identical stream consumption


def test_bitmap_membership_equals_searchsorted(tiny_data_path):
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "uniform").set_phase("valid")
    assert s._used_bits is not None  # tiny key space → bitmap active
    rng = np.random.RandomState(3)
    keys = rng.randint(1, ds.user_num, 500)
    vals = rng.randint(1, ds.item_num, 500)
    with_bitmap = s._membership(keys, vals)
    s2 = Sampler(["train", "valid", "test"], built, "uniform").set_phase("valid")
    s2._used_bits = None
    np.testing.assert_array_equal(with_bitmap, s2._membership(keys, vals))


def test_repeatable_sampler_excludes_only_paired_positive(tiny_data_path):
    from recbole_fairrec_tpu.sampler import RepeatableSampler

    c, ds, built = _built(tiny_data_path)
    s = RepeatableSampler(["train"], ds, "uniform").set_phase("train")
    uids = np.arange(1, 11)
    iids = np.arange(1, 11)
    np.random.seed(9)
    neg = s.sample_by_user_ids(uids, iids, 3)
    assert len(neg) == 30 and neg.min() >= 1
    # the k-th draw for pair i sits at i + k*len (strided layout) and must
    # differ from that row's OWN positive only
    tiled = np.tile(iids, 3)
    assert (neg != tiled).all()


def test_seq_sampler_positionwise(tiny_data_path):
    from recbole_fairrec_tpu.sampler import SeqSampler

    c, ds, built = _built(tiny_data_path)
    s = SeqSampler(ds, "uniform")
    pos = np.asarray(ds.inter_feat["item_id"])[:50]
    np.random.seed(4)
    neg = s.sample_neg_sequence(pos)
    assert neg.shape == pos.shape
    assert (neg != pos).all() and neg.min() >= 1


def test_kg_sampler_excludes_known_tails():
    from recbole_fairrec_tpu.sampler import KGSampler

    class _KG:
        head_entity_field = "head_id"
        tail_entity_field = "tail_id"
        head_entities = [1, 1, 2, 3, 3, 3]
        tail_entities = [2, 3, 4, 1, 4, 5]
        entity_num = 30

    s = KGSampler(_KG(), "uniform")
    np.random.seed(2)
    heads = np.array([1, 3, 1, 2])
    neg = s.sample_by_entity_ids(heads, num=4)
    assert len(neg) == 16 and neg.min() >= 1
    known = {(1, 2), (1, 3), (2, 4), (3, 1), (3, 4), (3, 5)}
    tiled = np.tile(heads, 4)
    for h, t in zip(tiled.tolist(), neg.tolist()):
        assert (h, t) not in known

def test_sample_one_key_group_constrained_fallback(tiny_data_path):
    """With fairness group labels set, sample_one_key must route through the
    group-constrained general path, not the unconstrained bitmap probe."""
    c, ds, built = _built(tiny_data_path)
    s = Sampler(["train", "valid", "test"], built, "uniform").set_phase("train")
    s.user_group_label = np.arange(ds.user_num) % 2
    s.item_group_label = np.arange(ds.item_num) % 3
    uid = int(np.asarray(built[0].inter_feat["user_id"])[0])
    neg = s.sample_one_key(uid, 40)
    u_lab = uid % 2
    for v in neg.tolist():
        i_lab = v % 3
        assert not ((u_lab == 0 and i_lab == 1) or (u_lab == 1 and i_lab == 0))

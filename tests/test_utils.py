"""Tests for encoder (NaN->zero-row contract), sampling helpers, the Kneedle
elbow, the AnnData container, and normalize_total."""

import numpy as np
import pandas as pd
import pytest

from alpine_tpu.ops.elbow import find_elbow
from alpine_tpu.utils import sampling
from alpine_tpu.utils.adata import AnnData, is_anndata
from alpine_tpu.utils.encoder import FeatureEncoders
from alpine_tpu.utils.single_cell import normalize_total


# ----------------------------------------------------------------- encoder


def test_encoder_basic_and_nan_rows():
    df = pd.DataFrame({"batch": ["a", "b", None, "a", "b"],
                       "cond": ["x", None, "y", "x", "y"]})
    fe = FeatureEncoders(["batch", "cond"])
    Ys = fe.fit_transform(df)
    assert len(Ys) == 2
    Yb = Ys[0]
    assert Yb.shape == (5, 2)
    # NaN row -> all zeros (reference encoder.py:26-34)
    np.testing.assert_array_equal(Yb[2], [0.0, 0.0])
    np.testing.assert_array_equal(Yb.sum(axis=1), [1, 1, 0, 1, 1])
    assert fe.encoded_labels["batch"] == ["batch_a", "batch_b"]

    # transform() reuses fitted categories; unknown labels encode to zero
    df2 = pd.DataFrame({"batch": ["b", "zzz", None], "cond": ["y", "x", "x"]})
    Y2 = fe.transform(df2)[0]
    np.testing.assert_array_equal(Y2, [[0, 1], [0, 0], [0, 0]])


def test_encoder_type_error():
    fe = FeatureEncoders(["k"])
    with pytest.raises(TypeError, match="adata.obs must be a pandas DataFrame."):
        fe.fit_transform({"k": [1]})


# ---------------------------------------------------------------- sampling


def test_joint_label_ids_vectorized_matches_string_version():
    r = np.random.default_rng(0)
    Ys = []
    for nl in (2, 3):
        y = np.zeros((nl, 20), np.float32)
        y[r.integers(0, nl, 20), np.arange(20)] = 1
        Ys.append(y)
    ids = sampling.joint_label_ids(Ys)
    strings = sampling.create_joint_labels_from_dummy_matrices(Ys)
    # two cells share an id iff they share the joint string label
    for i in range(20):
        for j in range(20):
            assert (ids[i] == ids[j]) == (strings[i] == strings[j])


def test_balanced_probabilities():
    ids = np.array([0] * 9 + [1] * 1)
    p = sampling.balanced_sample_probabilities(ids)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-6)
    # each CLASS gets equal total probability (balanced)
    np.testing.assert_allclose(p[:9].sum(), 0.5, rtol=1e-5)
    np.testing.assert_allclose(p[9:].sum(), 0.5, rtol=1e-5)


def test_batch_helpers():
    idx = np.arange(10)
    assert sampling.get_num_batches(10, 3) == 4
    np.testing.assert_array_equal(sampling.get_batch_indices(idx, 3, 3), [9])
    assert sampling.get_batch_indices(idx, 4, 3).size == 0


# ------------------------------------------------------------------ elbow


def test_elbow_on_exponential_decay():
    x = np.arange(200)
    y = 5.0 * np.exp(-x / 25.0) + 0.5  # convex decreasing
    # NOTE: degree-2 polynomial smoothing (the reference's kneed config,
    # main.py:758-765) fits an exponential poorly and biases the knee high;
    # we assert an interior, not-tail elbow.
    e = find_elbow(y, curve="convex", direction="decreasing")
    assert e is not None and 5 <= e <= 140


def test_elbow_none_on_flat():
    assert find_elbow(np.ones(2)) is None


# ------------------------------------------------------------------ adata


def test_anndata_container():
    X = np.arange(12, dtype=np.float32).reshape(4, 3)
    obs = pd.DataFrame({"g": list("abab")}, index=list("wxyz"))
    ad = AnnData(X, obs=obs)
    assert ad.shape == (4, 3) and ad.n_obs == 4 and ad.n_vars == 3
    assert is_anndata(ad) and not is_anndata(X)

    ad.obsm["emb"] = np.zeros((4, 2))
    with pytest.raises(ValueError, match="leading dimension"):
        ad.obsm["bad"] = np.zeros((3, 2))

    sub = ad[[0, 2]]
    assert sub.shape == (2, 3)
    assert list(sub.obs.index) == ["w", "y"]
    assert sub.obsm["emb"].shape == (2, 2)

    cp = ad.copy()
    cp.X[0, 0] = 99
    assert ad.X[0, 0] == 0


# ---------------------------------------------------------- normalize_total


def test_normalize_total():
    X = np.array([[1, 1], [2, 2], [0, 0], [3, 5]], np.float32)
    out = normalize_total(X, target_sum=10.0)
    np.testing.assert_allclose(out.sum(1), [10, 10, 0, 10], rtol=1e-6)
    out2 = normalize_total(X)  # median of nonzero totals = 4
    np.testing.assert_allclose(out2[0].sum(), 4.0, rtol=1e-6)


def test_joint_label_ids_no_overflow_collisions():
    """Mixed-radix int64 mixing would wrap past ~2^63 (e.g. 12 covariates
    x 50 labels); the unique-row factorization must keep distinct argmax
    tuples distinct."""
    from alpine_tpu.utils.sampling import joint_label_ids

    r = np.random.default_rng(0)
    n, n_cov, levels = 500, 12, 50
    Ys = []
    codes = []
    for _ in range(n_cov):
        c = r.integers(0, levels, n)
        y = np.zeros((levels, n), np.float32)
        y[c, np.arange(n)] = 1.0
        Ys.append(y)
        codes.append(c)
    ids = joint_label_ids(Ys)
    tuples = list(zip(*codes))
    # same tuple <=> same id, both directions
    by_tuple = {}
    for t, i in zip(tuples, ids):
        assert by_tuple.setdefault(t, i) == i
    assert len(set(ids.tolist())) == len(by_tuple)


def test_find_elbow_returns_none_without_threshold_crossing():
    """kneed reports no knee on curves whose difference curve never drops
    past the threshold (e.g. a straight line); the caller then falls back
    to the default max_iter with a warning (reference main.py:766-770)."""
    from alpine_tpu.ops.elbow import find_elbow

    assert find_elbow(np.linspace(5.0, 1.0, 50)) is None


def test_weighted_epoch_indices_many_classes_normalization():
    """Regression: the weighted probability vector must be renormalized in
    float64 (divide by the FLOAT64 sum) — dividing by the float32 p.sum()
    left a ~1e-7 residual that intermittently exceeded np.random.choice's
    sqrt(eps) tolerance and raised 'probabilities do not sum to 1' (91
    joint classes reproduced it deterministically)."""
    from alpine_tpu.utils.sampling import generate_epoch_indices

    rng = np.random.default_rng(0)
    labels = [f"class_{i % 91}" for i in range(1000)]
    idx = generate_epoch_indices(labels, "weighted", rng)
    assert idx.shape == (1000,)
    assert idx.min() >= 0 and idx.max() < 1000


def test_transform_key_distinct_from_fit_stream():
    """The transform/validation H0 key must not collide with the fit-side
    stream: fold_in(key, j) is bit-identical to split(key)[j] in this JAX,
    so the old fold_in(key, 1) WAS the fit key and the validation init's
    uniform bitstream coincided with the fit's per-iteration sampling
    keys."""
    import jax

    from alpine_tpu.ops import mu

    key = jax.random.PRNGKey(42)
    init_key, fit_key = jax.random.split(key)
    # the collision this guards against is real on this install:
    assert (np.asarray(jax.random.fold_in(key, 1))
            == np.asarray(fit_key)).all()
    t = np.asarray(mu.transform_key(key))
    assert not (t == np.asarray(fit_key)).all()
    assert not (t == np.asarray(init_key)).all()
    # and stays clear of the per-iteration keys of any realistic fit
    iters = np.asarray(jax.random.split(fit_key, 512))
    assert not (iters == t[None, :]).all(axis=1).any()

"""Tests for the TPE engine, Leiden scoring, and ComponentOptimizer."""

import os
import pickle

import numpy as np
import pytest

from alpine_tpu.optimize import scoring
from alpine_tpu.optimize.tpe import (
    STATUS_FAIL,
    STATUS_OK,
    Trials,
    fmin,
    hp,
    rand,
    tpe,
)

from .conftest import make_synthetic_adata


# -------------------------------------------------------------------- TPE


def test_tpe_beats_random_on_quadratic():
    space = {"x": hp.uniform("x", -10.0, 10.0), "y": hp.uniform("y", -10.0, 10.0)}

    def obj(s):
        return {"loss": (s["x"] - 3.0) ** 2 + (s["y"] + 2.0) ** 2, "status": STATUS_OK}

    t_tpe = Trials()
    best = fmin(obj, space, algo=tpe.suggest, max_evals=80, trials=t_tpe,
                rstate=np.random.default_rng(0))
    assert abs(best["x"] - 3.0) < 2.0 and abs(best["y"] + 2.0) < 2.0

    t_rand = Trials()
    fmin(obj, space, algo=rand.suggest, max_evals=80, trials=t_rand,
         rstate=np.random.default_rng(0))
    assert min(t_tpe.losses) <= min(t_rand.losses) * 1.5


def test_tpe_distributions():
    space = {
        "n": hp.quniform("n", 10, 100, 1),
        "lam": hp.qloguniform("lam", np.log(1.0), np.log(1e4), 1),
        "u": hp.uniform("u", 0.0, 1.0),
    }
    seen = []

    def obj(s):
        seen.append(s)
        return {"loss": 0.0, "status": STATUS_OK}

    fmin(obj, space, max_evals=50, trials=Trials(), rstate=np.random.default_rng(1))
    for s in seen:
        assert 10 <= s["n"] <= 100 and s["n"] == round(s["n"])
        assert 1.0 <= s["lam"] <= 1e4 + 1 and s["lam"] == round(s["lam"])
        assert 0.0 <= s["u"] <= 1.0
    # qloguniform should produce log-spread values
    lams = [s["lam"] for s in seen]
    assert min(lams) < 50 and max(lams) > 500


def test_tpe_handles_failed_trials():
    space = {"x": hp.uniform("x", 0.0, 1.0)}

    def obj(s):
        if s["x"] < 0.5:
            return {"loss": np.inf, "status": STATUS_FAIL}
        return {"loss": (s["x"] - 0.9) ** 2, "status": STATUS_OK}

    trials = Trials()
    best = fmin(obj, space, max_evals=60, trials=trials,
                rstate=np.random.default_rng(2))
    assert best["x"] >= 0.5
    assert any(t["result"]["status"] == STATUS_FAIL for t in trials.trials)


def test_trials_pickle_roundtrip(tmp_path):
    space = {"x": hp.uniform("x", 0.0, 1.0)}
    trials = Trials()
    fmin(lambda s: {"loss": s["x"], "status": STATUS_OK}, space,
         max_evals=5, trials=trials, rstate=np.random.default_rng(3))
    p = tmp_path / "trials.pkl"
    with open(p, "wb") as f:
        pickle.dump(trials, f)
    with open(p, "rb") as f:
        loaded = pickle.load(f)
    assert len(loaded.trials) == 5
    # resume adds on top
    fmin(lambda s: {"loss": s["x"], "status": STATUS_OK}, space,
         max_evals=8, trials=loaded, rstate=np.random.default_rng(4))
    assert len(loaded.trials) == 8


# ---------------------------------------------------------------- scoring


def test_leiden_separates_blobs():
    r = np.random.default_rng(0)
    emb = np.vstack([r.normal(0, 0.3, (80, 4)), r.normal(5, 0.3, (80, 4))])
    labels = scoring.leiden(emb, seed=0)
    # no cluster may span both blobs (homogeneity of truth given clusters)
    truth = np.array(["a"] * 80 + ["b"] * 80, dtype=object)
    score = scoring.embedding_score(labels, truth)
    from sklearn.metrics.cluster import homogeneity_score
    assert homogeneity_score(truth.astype(str), labels.astype(str)) > 0.95
    assert score > 0.9


def test_embedding_score_masks_nan():
    clusters = np.array([0, 0, 1, 1])
    vals = np.array(["a", None, "b", "b"], dtype=object)
    s = scoring.embedding_score(clusters, vals)
    assert np.isfinite(s)


def test_python_louvain_fallback_matches_native_quality():
    r = np.random.default_rng(1)
    emb = np.vstack([r.normal(0, 0.3, (60, 3)), r.normal(5, 0.3, (60, 3))])
    src, dst, w = scoring.knn_graph(emb)
    lab = scoring._python_louvain(120, src, dst, w, seed=0)
    truth = np.array(["a"] * 60 + ["b"] * 60, dtype=object)
    from sklearn.metrics.cluster import homogeneity_score
    assert homogeneity_score(truth.astype(str), lab.astype(str)) > 0.95


# ------------------------------------------------------ ComponentOptimizer


@pytest.fixture(scope="module")
def small_adata():
    return make_synthetic_adata(n_cells=90, n_genes=25,
                                covariates=(("batch", 2),), seed=11)


def test_component_optimizer_search(small_adata, tmp_path):
    from alpine_tpu import ComponentOptimizer

    co = ComponentOptimizer(small_adata, ["batch"], max_iter=8, device="cpu",
                            random_state=0)
    best = co.search_hyperparams(
        n_total_components_range=(8, 16),
        lam_range=(1.0, 100.0),
        n_splits=2,
        max_evals=4,
    )
    assert set(best) == {"n_components", "n_covariate_components", "lam",
                         "alpha_W", "orth_W", "l1_ratio_W", "random_state"}
    assert best["n_components"] >= 2
    assert len(best["n_covariate_components"]) == 1

    hist = co.get_train_history()
    assert "n_total_components" in hist.columns
    assert "n_covariate_components_0" in hist.columns
    assert "lam_0" in hist.columns
    # sorted by score descending (reference quirk, optimization.py:473-475)
    assert (hist["score"].values[:-1] >= hist["score"].values[1:] - 1e-12).all()

    params = co.get_hyperparameter(0)
    assert "n_components" in params and "score" in params

    # trials persistence + resume
    fn = str(tmp_path / "t.pkl")
    co.save_trials(fn)
    co2 = ComponentOptimizer(small_adata, ["batch"], max_iter=8, device="cpu",
                             random_state=0)
    co2.search_hyperparams(
        n_total_components_range=(8, 16), lam_range=(1.0, 100.0),
        n_splits=2, max_evals=2, trials_filename=fn,
    )
    assert len(co2.trials.trials) == len(co.trials.trials) + 2

    # extend_training continues in place
    n_before = len(co.trials.trials)
    co.extend_training(extra_evals=2)
    assert len(co.trials.trials) == n_before + 2

    model = co.fit_the_best_param()
    assert hasattr(model, "matrices")


@pytest.mark.slow
def test_component_optimizer_auto_max_iter(small_adata):
    from alpine_tpu import ComponentOptimizer

    co = ComponentOptimizer(small_adata, ["batch"], max_iter=None, device="cpu",
                            random_state=0)
    co.search_hyperparams(
        n_total_components_range=(8, 12), lam_range=(1.0, 10.0),
        n_splits=2, max_evals=2,
    )
    # after >= n_splits fold fits, max_iter freezes to the average elbow
    assert co.max_iter is not None and co.max_iter > 0
    frozen = co.max_iter

    # regression: a SECOND search used to crash with IndexError (batched
    # path + reset iter_records); it must run and keep reporting the freeze
    co.search_hyperparams(
        n_total_components_range=(8, 12), lam_range=(1.0, 10.0),
        n_splits=2, max_evals=2,
    )
    assert co.max_iter == frozen
    # every trial after the detection trial ran at — and must report — the
    # frozen value, not a stale elbow record
    recs = [t["result"]["params"] for t in co.trials.trials
            if t["result"]["status"] == "ok" and "params" in t["result"]]
    assert all(r["max_iter"] == frozen for r in recs[1:])


def test_optimizer_validation(small_adata):
    from alpine_tpu import ComponentOptimizer

    with pytest.raises(TypeError, match="adata must be an instance of AnnData"):
        ComponentOptimizer("x", ["batch"])
    with pytest.raises(ValueError, match="must be present in adata.obs"):
        ComponentOptimizer(small_adata, ["nope"])
    with pytest.raises(ValueError, match="loss_type"):
        ComponentOptimizer(small_adata, ["batch"], loss_type="huber")

    co = ComponentOptimizer(small_adata, ["batch"], max_iter=5, device="cpu")
    with pytest.raises(ValueError, match="first element less than the second"):
        co.search_hyperparams(n_total_components_range=(20, 10))
    with pytest.raises(ValueError, match="n_splits"):
        co.search_hyperparams(n_splits=1)
    with pytest.raises(ValueError, match="max_evals"):
        co.search_hyperparams(max_evals=0)


def test_train_history_empty_raises(small_adata):
    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.optimize.tpe import Trials

    co = ComponentOptimizer(small_adata, ["batch"], max_iter=5, device="cpu")
    co.trials = Trials()
    with pytest.raises(RuntimeError, match="No successful trials"):
        co.get_train_history()


def test_umap_connectivities_properties():
    """The UMAP fuzzy-simplicial connectivities must be in (0, 1], symmetric
    by construction, and give each point's nearest neighbor weight 1
    (d - rho == 0)."""
    r = np.random.default_rng(0)
    emb = r.random((50, 4))
    src, dst, w = scoring.knn_graph(emb, n_neighbors=10)
    assert (w > 0).all() and (w <= 1.0 + 1e-9).all()
    assert (src < dst).all()
    # every node appears in the union graph
    assert len(np.union1d(src, dst)) == 50
    # each point's nearest neighbor edge has membership 1 (before union the
    # directed weight is exp(0); the fuzzy union keeps it at 1)
    from sklearn.neighbors import NearestNeighbors
    nn = NearestNeighbors(n_neighbors=2).fit(emb)
    _, idx = nn.kneighbors(emb)
    for i, j in enumerate(idx[:, 1]):
        a, b = min(i, j), max(i, j)
        hit = w[(src == a) & (dst == b)]
        assert hit.size == 1 and hit[0] > 0.999


def test_optimizer_rejects_bad_sampling_method(small_adata):
    from alpine_tpu import ComponentOptimizer

    with pytest.raises(ValueError, match="Unknown sampling method"):
        ComponentOptimizer(small_adata, ["batch"], max_iter=5,
                           sampling_method="bogus")


def test_fmin_tids_unique_after_gapped_import():
    """Imported hyperopt pickles can carry gapped tids; new trials must get
    fresh tids or tid-keyed lookups resolve to the wrong trial."""
    trials = Trials()
    for t in (0, 5):  # gapped, as after exp_key filtering
        trials.append(t, {"x": float(t)}, {"loss": float(t), "status": STATUS_OK})
    space = {"x": hp.uniform("x", 0.0, 1.0)}
    fmin(lambda s: {"loss": s["x"], "status": STATUS_OK}, space,
         max_evals=4, trials=trials, rstate=np.random.default_rng(0))
    tids = [t["tid"] for t in trials.trials]
    assert len(tids) == len(set(tids)) == 4
    assert max(tids) > 5


def test_fit_the_best_param_before_search_raises():
    from alpine_tpu import ComponentOptimizer

    co = ComponentOptimizer(
        make_synthetic_adata(n_cells=40, n_genes=10, covariates=(("batch", 2),)),
        ["batch"], max_iter=5, device="cpu")
    with pytest.raises(RuntimeError, match="best parameters"):
        co.fit_the_best_param()


def test_tpe_linear_forgetting_weights():
    from alpine_tpu.optimize.tpe import LINEAR_FORGETTING, _forgetting_weights

    w = _forgetting_weights(10)
    np.testing.assert_array_equal(w, np.ones(10))  # under the LF horizon
    w = _forgetting_weights(LINEAR_FORGETTING + 10)
    assert (w[-LINEAR_FORGETTING:] == 1.0).all()
    assert (np.diff(w[:10]) > 0).all() and w[0] < 1.0  # oldest lowest


def test_hyperopt_trials_import_shim(tmp_path, small_adata):
    """A pickle written by real hyperopt (module not installed here) must
    load through the tolerant unpickler and convert into our Trials."""
    import sys
    import types

    # forge a hyperopt-shaped pickle: a class from a module that will not
    # be importable at load time, carrying _dynamic_trials documents
    mod = types.ModuleType("hyperopt_forged")
    class Trials:  # noqa: N801 - mimics hyperopt.Trials
        pass
    Trials.__module__ = "hyperopt_forged"
    Trials.__qualname__ = "Trials"
    mod.Trials = Trials
    sys.modules["hyperopt_forged"] = mod
    try:
        t = Trials()
        t._dynamic_trials = [
            {"tid": 0, "state": 2, "exp_key": None,
             "misc": {"vals": {"x": [0.25], "inactive": []}, "cmd": ("domain_attachment",)},
             "result": {"loss": 0.25, "status": "ok",
                        "params": {"n_components": 5, "n_covariate_components": [2],
                                   "lam": [10.0], "orth_W": 0.0, "alpha_W": 0.0,
                                   "l1_ratio_W": 0.0, "max_iter": 5}}},
            {"tid": 1, "state": 2, "exp_key": None,
             "misc": {"vals": {"x": [0.75], "inactive": []}},
             "result": {"loss": np.inf, "status": "fail"}},
        ]
        p = str(tmp_path / "hp_trials.pkl")
        with open(p, "wb") as f:
            pickle.dump(t, f)
    finally:
        del sys.modules["hyperopt_forged"]

    from alpine_tpu.optimize.tpe import import_hyperopt_trials, load_foreign_pickle

    obj = load_foreign_pickle(p)
    assert not isinstance(obj, Trials)
    conv = import_hyperopt_trials(obj)
    assert len(conv.trials) == 2
    assert conv.trials[0]["misc"]["vals"] == {"x": [0.25]}  # empty lists dropped
    assert conv.trials[0]["result"]["status"] == STATUS_OK
    assert conv.trials[1]["result"]["status"] == STATUS_FAIL

    # and ComponentOptimizer.load_trials accepts the foreign file directly
    from alpine_tpu import ComponentOptimizer

    co = ComponentOptimizer(small_adata, ["batch"], max_iter=5, device="cpu")
    co.load_trials(p)
    hist = co.get_train_history()
    assert len(hist) == 1 and hist.iloc[0]["score"] == 0.25


def test_search_with_nan_covariates(tmp_path):
    """Partially-labeled data (the library's semi-supervision entry point)
    must search fine: missing covariate values form one stratification
    class instead of tripping sklearn's NaN check (newer pandas string
    dtypes keep NaN through astype(str))."""
    from alpine_tpu import ComponentOptimizer

    adata = make_synthetic_adata(n_cells=90, n_genes=20,
                                 covariates=(("batch", 2),), na_frac=0.3,
                                 seed=7)
    co = ComponentOptimizer(adata, ["batch"], max_iter=5, device="cpu",
                            random_state=0)
    co.search_hyperparams(n_total_components_range=(8, 14),
                          lam_range=(1.0, 50.0), n_splits=2, max_evals=2)
    hist = co.get_train_history()
    assert len(hist) >= 1 and np.isfinite(hist["score"]).all()


def test_leiden_two_scale_hierarchy():
    """Multi-level behavior: each aggregate level must be SEEDED with the
    previous level's partition (canonical Leiden) — restarting from
    singletons can discard level-1 merges and leave the hierarchy
    unresolved.  A two-scale graph (8 cliques in 2 macro-groups) must
    resolve to the macro-groups at low resolution and the cliques at
    resolution 1."""
    from alpine_tpu.native import leiden_native

    r = np.random.default_rng(0)
    n_cl, sz = 8, 8
    n = n_cl * sz
    src, dst, w = [], [], []

    def add(a, b):
        src.append(a)
        dst.append(b)
        w.append(1.0)

    for c in range(n_cl):
        base = c * sz
        for i in range(sz):
            for j in range(i + 1, sz):
                add(base + i, base + j)
    for half in (0, 1):
        for a in range(half * 4, half * 4 + 4):
            for b in range(a + 1, half * 4 + 4):
                for _ in range(6):
                    add(a * sz + r.integers(0, sz), b * sz + r.integers(0, sz))
    add(0, n - 1)  # weak bridge between halves

    args = (n, np.array(src), np.array(dst), np.array(w, np.float64))
    macro = leiden_native(*args, resolution=0.05, seed=0)
    assert macro is not None and len(set(macro.tolist())) == 2
    micro = leiden_native(*args, resolution=1.0, seed=0)
    assert micro is not None and len(set(micro.tolist())) == 8


def test_score_ranking_stable_across_clustering_backends(monkeypatch):
    """The optimizer's RANKING of hyperparameter settings must not depend
    on which clustering backend scored them (native C++ Leiden vs the
    pure-Python Louvain fallback users without g++ get) nor on the
    clustering seed (round-2 verdict item 7).  Uses planted-batch-effect
    data where lam controls covariate leakage, so the expected ranking is
    known: higher lam -> cleaner unguided embedding -> lower score."""
    import numpy as np

    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.optimize import scoring

    from .test_search_quality import _batch_effect_adata

    adata = _batch_effect_adata()
    co = ComponentOptimizer(adata, ["batch"], max_iter=40, device="cpu",
                            random_state=0)
    co.n_splits = 3
    co.iter_records = []
    base = {"n_components": 8, "n_covariate_components": [2],
            "orth_W": 0.0, "alpha_W": 0.0, "l1_ratio_W": 0.0}
    lams = [1e-3, 1e1, 1e4]

    # fit once per setting; score the SAME embeddings under each backend
    folds = co._stratified_folds()
    embs = {lam: co._batched_fold_embeddings({**base, "lam": [lam]}, folds)
            for lam in lams}
    batch = co.adata.obs["batch"].to_numpy()

    def scores(seed):
        out = []
        for lam in lams:
            per_fold = [
                scoring.embedding_score(
                    scoring.leiden(np.asarray(emb), n_neighbors=15,
                                   resolution=1.0, seed=seed),
                    batch[va],
                )
                for (_, va), emb in zip(folds, embs[lam])
            ]
            out.append(float(np.mean(per_fold)))
        return out

    all_scores = []
    for seed in (0, 1):
        all_scores.append(scores(seed))
        with monkeypatch.context() as m:
            # force the no-g++ path: native library reports unavailable
            m.setattr(scoring, "leiden_native", lambda *a, **k: None)
            all_scores.append(scores(seed))

    # Every backend/seed combination must pick the same best setting
    # (lam=1e4, the planted answer) and separate it from BOTH leaky
    # settings by a wide margin.  (The two leaky settings themselves are
    # statistical ties — scores within noise of each other — so their
    # mutual order is legitimately backend-dependent and not asserted.)
    for s in all_scores:
        assert int(np.argmin(s)) == 2, all_scores
        assert s[2] < s[0] - 0.2 and s[2] < s[1] - 0.2, all_scores


def test_search_state_digest_covers_bounds_and_trial_contents(small_adata):
    """The multi-process pre-round digest must change when the search-space
    BOUNDS or the loaded trials' CONTENTS differ — same-shaped spaces or
    same-length trials files passing the digest would silently fork the
    per-process TPE streams (round-3 review finding)."""
    from alpine_tpu import ComponentOptimizer
    from alpine_tpu.optimize.tpe import Trials

    def make(lam_hi=100.0):
        co = ComponentOptimizer(small_adata, ["batch"], max_iter=8,
                                device="cpu", random_state=0)
        # set up search state without running trials (what _run_tpe sees)
        from alpine_tpu.optimize.optimizer import SearchSpace
        space = SearchSpace((8, 16), (1.0, lam_hi), (0.0, 1.0), (0.0, 100.0),
                            (0.0, 1.0), n_covariates=1)
        co.n_splits = 2
        co._search_space = space
        co.space = space.to_tpe()
        co.min_covariate_components = co._resolve_floors(None)
        co.trials = Trials()
        return co

    base = make()
    same = make()
    assert base._search_state_digest(5) == same._search_state_digest(5)

    # identical labels/lengths, different lam bound -> digest differs
    other_bounds = make(lam_hi=1000.0)
    assert sorted(other_bounds.space.keys()) == sorted(base.space.keys())
    assert base._search_state_digest(5) != other_bounds._search_state_digest(5)

    # same trial COUNT, different contents -> digest differs
    with_trial_a = make()
    with_trial_a.trials.append(0, {"x": 1.0}, {"loss": 2.0, "status": "ok"})
    with_trial_b = make()
    with_trial_b.trials.append(0, {"x": 1.5}, {"loss": 2.0, "status": "ok"})
    assert (with_trial_a._search_state_digest(5)
            != with_trial_b._search_state_digest(5))

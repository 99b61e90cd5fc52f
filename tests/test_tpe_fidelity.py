"""Fidelity of the TPE density model vs hyperopt's adaptive Parzen estimator.

The reference delegates its search to hyperopt (`/root/reference/alpine/
optimization.py:10, :123-130`), which is not installed here.  The in-repo
TPE (optimize/tpe.py) cannot reproduce hyperopt's exact seeded *trial
stream* (different rng usage — documented in docs/migration.md), but its
density model CAN be identical.  This file transcribes hyperopt's
`linear_forgetting_weights` and `adaptive_parzen_normal` (hyperopt/tpe.py,
Bergstra et al. 2011 implementation) independently and asserts the repo's
`_Parzen` / `_forgetting_weights` produce the SAME mixture — weights, means
and bandwidths — for randomized observation sets, plus the same
below/above split sizes (gamma schedule)."""

import numpy as np
import pytest

from alpine_tpu.optimize.tpe import (
    GAMMA_CAP,
    LINEAR_FORGETTING,
    _forgetting_weights,
    _Parzen,
)


# --- transcription of hyperopt's construction (labeled oracle) -------------

def linear_forgetting_weights_oracle(N, LF):
    if N == 0:
        return np.asarray([])
    if N < LF:
        return np.ones(N)
    ramp = np.linspace(1.0 / N, 1.0, num=N - LF)
    flat = np.ones(LF)
    return np.concatenate([ramp, flat], axis=0)


def adaptive_parzen_normal_oracle(mus, prior_weight, prior_mu, prior_sigma):
    """hyperopt.tpe.adaptive_parzen_normal with LF weights supplied by the
    caller (as hyperopt does via the @adaptive_parzen_sampler wiring)."""
    mus_orig = np.array(mus)
    mus = np.array(mus)
    order = np.argsort(mus)
    mus = mus[order]

    if len(mus) == 0:
        prior_pos = 0
        srtd_mus = np.asarray([prior_mu])
        sigma = np.asarray([prior_sigma])
    elif len(mus) == 1:
        if prior_mu < mus[0]:
            prior_pos = 0
            srtd_mus = np.asarray([prior_mu, mus[0]])
            sigma = np.asarray([prior_sigma, prior_sigma * 0.5])
        else:
            prior_pos = 1
            srtd_mus = np.asarray([mus[0], prior_mu])
            sigma = np.asarray([prior_sigma * 0.5, prior_sigma])
    else:
        prior_pos = np.searchsorted(mus, prior_mu)
        srtd_mus = np.zeros(len(mus) + 1)
        srtd_mus[:prior_pos] = mus[:prior_pos]
        srtd_mus[prior_pos] = prior_mu
        srtd_mus[prior_pos + 1:] = mus[prior_pos:]
        sigma = np.zeros_like(srtd_mus)
        sigma[1:-1] = np.maximum(srtd_mus[1:-1] - srtd_mus[0:-2],
                                 srtd_mus[2:] - srtd_mus[1:-1])
        lsigma = srtd_mus[1] - srtd_mus[0]
        usigma = srtd_mus[-1] - srtd_mus[-2]
        sigma[0] = lsigma
        sigma[-1] = usigma

    if LINEAR_FORGETTING < len(mus):
        unsrtd_weights = linear_forgetting_weights_oracle(
            len(mus), LINEAR_FORGETTING)
        srtd_weights = unsrtd_weights[order]
    else:
        srtd_weights = np.ones(len(mus))

    maxsigma = prior_sigma / 1.0
    minsigma = prior_sigma / min(100.0, 1.0 + len(srtd_mus))
    sigma = np.clip(sigma, minsigma, maxsigma)
    sigma[prior_pos] = prior_sigma

    srtd_weights = np.insert(srtd_weights, prior_pos, prior_weight)
    srtd_weights /= srtd_weights.sum()
    return srtd_weights, srtd_mus, sigma


# --- comparisons ------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 2, 5, 24, 25, 26, 80])
def test_forgetting_weights_match_hyperopt(n):
    np.testing.assert_allclose(
        _forgetting_weights(n),
        linear_forgetting_weights_oracle(n, LINEAR_FORGETTING))


@pytest.mark.parametrize("n_obs", [0, 1, 2, 3, 10, 30, 60])
@pytest.mark.parametrize("seed", [0, 1])
def test_parzen_matches_adaptive_parzen_normal(n_obs, seed):
    r = np.random.default_rng(seed)
    low, high = -2.0, 7.0
    obs = r.uniform(low, high, n_obs)
    lf_w = _forgetting_weights(n_obs)

    p = _Parzen(obs, low, high, weights=lf_w)
    ow, om, osig = adaptive_parzen_normal_oracle(
        obs, 1.0, 0.5 * (low + high), high - low)

    np.testing.assert_allclose(p.mu, om, atol=1e-12)
    np.testing.assert_allclose(p.sigma, osig, atol=1e-12)
    np.testing.assert_allclose(p.w, ow, atol=1e-12)


def test_parzen_prior_between_duplicate_observations():
    # duplicates straddling the prior midpoint: searchsorted position and
    # zero neighbor distances (clipped up to minsigma) must match
    low, high = 0.0, 10.0
    obs = np.array([5.0, 5.0, 2.0, 5.0, 8.0])
    p = _Parzen(obs, low, high, weights=np.ones(len(obs)))
    ow, om, osig = adaptive_parzen_normal_oracle(obs, 1.0, 5.0, 10.0)
    np.testing.assert_allclose(p.mu, om, atol=1e-12)
    np.testing.assert_allclose(p.sigma, osig, atol=1e-12)
    np.testing.assert_allclose(p.w, ow, atol=1e-12)


def test_gamma_split_matches_hyperopt_schedule():
    # n_below = min(ceil(0.25 * sqrt(n)), 25) — via the module constants
    for n, expect in [(20, 2), (25, 2), (64, 2), (100, 3), (400, 5), (11000, 25)]:
        n_below = min(int(np.ceil(0.25 * np.sqrt(n))), GAMMA_CAP)
        assert n_below == expect, (n, n_below)


def test_parzen_sampling_is_truncated_not_clipped():
    """hyperopt's GMM1 rejection-samples the truncated mixture (redraw
    until low <= x < high); boundary clipping would instead pile the
    out-of-bounds mass into atoms at the exact bounds and bias candidate
    selection toward the edges of bounded ranges (e.g. l1_ratio in [0,1]).
    With an observation sitting ON the high bound, roughly a third of raw
    mixture draws land out of bounds — plenty to expose a clip."""
    from scipy.stats import norm

    low, high = 0.0, 1.0
    obs = np.array([1.0, 0.97, 0.99])  # mass piled against the high bound
    p = _Parzen(obs, low, high, weights=np.ones(len(obs)))
    rng = np.random.default_rng(3)
    n = 20000
    s = p.sample(rng, n)
    assert s.shape == (n,)
    assert ((s >= low) & (s < high)).all()
    # a clip would put the raw out-of-bounds mass (here >20%) exactly AT
    # the bounds; rejection leaves the bounds at measure zero
    assert (s == high).sum() == 0 and (s == low).sum() == 0
    # and the empirical CDF must match the analytic TRUNCATED mixture CDF
    mass_oob = float(np.sum(p.w * (1.0 - (norm.cdf((high - p.mu) / p.sigma)
                                          - norm.cdf((low - p.mu) / p.sigma)))))
    assert mass_oob > 0.2  # the construction really does stress truncation
    for q in (0.25, 0.5, 0.75, 0.95):
        xq = np.quantile(s, q)
        cdf = float(np.sum(p.w * (norm.cdf((xq - p.mu) / p.sigma)
                                  - norm.cdf((low - p.mu) / p.sigma)))
                    / np.sum(p.w * p._z))
        assert abs(cdf - q) < 0.02, (q, xq, cdf)

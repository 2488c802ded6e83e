"""Unit tests for prediction (-predict) and windowed correlations
(-calccor)."""

import numpy as np

from gemma_tpu.models.predict import (
    predict_effects, add_breeding_values, probit_transform)
from gemma_tpu.models.varcov import calc_neighbours, windowed_correlations


def test_predict_effects_centers_by_training_mean():
    rng = np.random.default_rng(0)
    p, n = 20, 50
    X = rng.binomial(2, 0.4, size=(p, n)).astype(np.float64)
    train = np.zeros(n, dtype=bool)
    train[:40] = True
    rs = [f"rs{i}" for i in range(p)]
    effects = {f"rs{i}": rng.normal() for i in range(0, p, 2)}  # half used

    y, ns = predict_effects(X, rs, train, effects)
    assert ns == p // 2
    want = np.zeros(n - 40)
    for i in range(0, p, 2):
        tm = X[i, train].mean()
        want += effects[f"rs{i}"] * (X[i, ~train] - tm)
    np.testing.assert_allclose(y, want, rtol=1e-12)


def test_predict_effects_handles_missing():
    X = np.array([[1.0, np.nan, 2.0, np.nan, 0.0]])
    train = np.array([True, True, False, False, False])
    effects = {"rs0": 2.0}
    y, ns = predict_effects(X, ["rs0"], train, effects)
    # train mean = 1.0; test values: [2, imputed at test mean 1.0, 0]
    np.testing.assert_allclose(y, 2.0 * (np.array([2.0, 1.0, 0.0]) - 1.0))


def test_add_breeding_values_reproduces_training_bv():
    """With u_hat = K_oo w, the propagated values are K_fo w."""
    rng = np.random.default_rng(1)
    n = 40
    A = rng.normal(size=(n, 60))
    G = A @ A.T / 60
    train = np.zeros(n, dtype=bool)
    train[:30] = True

    # center exactly as AddBV does to build consistent u_hat
    w = train.astype(float)
    Gw = G @ w
    wtw = w @ w
    d = w @ Gw
    Gc = (G - np.outer(Gw, w) / wtw - np.outer(w, Gw) / wtw
          + d / wtw ** 2 * np.outer(w, w))
    alpha = rng.normal(size=30)
    u_hat = Gc[np.ix_(train, train)] @ alpha
    got = add_breeding_values(G, u_hat, train)
    want = Gc[np.ix_(~train, train)] @ alpha
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_probit():
    np.testing.assert_allclose(probit_transform(np.zeros(3)), 0.5)


def test_calc_neighbours_windows():
    chr_ = ["1", "1", "1", "2", "2"]
    pos = np.array([100, 200, 5000, 100, 150])
    cM = np.full(5, -9.0)
    # bp window of 1000: snp0 sees snp1 (not snp2); snp3 sees snp4
    nb = calc_neighbours(chr_, pos, cM, 1000, 0, 0)
    assert nb.tolist() == [1, 0, 0, 1, 0]
    # count window of 10, no bp: everything on same chr
    nb = calc_neighbours(chr_, pos, cM, 0, 0, 10)
    assert nb.tolist() == [2, 1, 0, 1, 0]


def test_windowed_correlations_match_numpy():
    rng = np.random.default_rng(2)
    p, n = 30, 80
    X = rng.normal(size=(p, n))
    X[0, 3] = np.nan
    n_nb = np.minimum(np.arange(p)[::-1], 4)
    var, cors = windowed_correlations(X, n_nb)

    miss = np.isnan(X)
    mean = np.nanmean(X, axis=1)
    Xc = np.where(miss, mean[:, None], X) - mean[:, None]
    for i in range(p):
        np.testing.assert_allclose(var[i], Xc[i] @ Xc[i] / n, rtol=1e-10)
        for j in range(int(n_nb[i])):
            k = i + 1 + j
            want = (Xc[i] @ Xc[k]) / np.sqrt((Xc[i] @ Xc[i]) * (Xc[k] @ Xc[k]))
            np.testing.assert_allclose(cors[i][j], want, rtol=1e-8)

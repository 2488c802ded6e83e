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


def test_mvnorm_predict_conditional_expectation():
    """mode 43: imputed values equal the Gaussian conditional mean."""
    from gemma_tpu.models.predict import mvnorm_predict
    rng = np.random.default_rng(5)
    m = 30
    A = rng.normal(size=(m, 50))
    G = A @ A.T / 50
    vg, ve = 1.3, 0.7
    H = vg * G + ve * np.eye(m)
    y = rng.multivariate_normal(np.zeros(m), H)
    Y_full = y[:, None].copy()
    Y_full[[3, 7, 20]] = np.nan
    Y_hat = np.full((m, 1), 0.2)

    out = mvnorm_predict(Y_full, Y_hat, G, np.asarray(vg), np.asarray(ve))
    obs = ~np.isnan(Y_full[:, 0])
    want = 0.2 + H[~obs][:, obs] @ np.linalg.solve(
        H[np.ix_(obs, obs)], y[obs] - 0.2)
    np.testing.assert_allclose(out[~obs, 0], want, rtol=1e-10)
    # observed values untouched
    np.testing.assert_allclose(out[obs, 0], y[obs])


def test_mvnorm_predict_two_phenotypes():
    from gemma_tpu.models.predict import mvnorm_predict
    rng = np.random.default_rng(6)
    m, d = 15, 2
    A = rng.normal(size=(m, 30))
    G = A @ A.T / 30
    Vg = np.array([[1.0, 0.3], [0.3, 0.8]])
    Ve = np.array([[0.5, 0.1], [0.1, 0.6]])
    H = np.kron(G, Vg) + np.kron(np.eye(m), Ve)
    yv = rng.multivariate_normal(np.zeros(m * d), H)
    Y_full = yv.reshape(m, d).copy()
    Y_full[2, 0] = np.nan
    Y_full[9, 1] = np.nan
    Y_hat = np.zeros((m, d))
    out = mvnorm_predict(Y_full, Y_hat, G, Vg, Ve)
    obs = ~np.isnan(Y_full.reshape(-1))
    want = H[np.ix_(~obs, obs)] @ np.linalg.solve(H[np.ix_(obs, obs)],
                                                  yv[obs])
    np.testing.assert_allclose(out.reshape(-1)[~obs], want, rtol=1e-10)


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



def _cli(args: str):
    """Drive the real CLI in a subprocess.  The BSLMM MCMC program is
    the largest XLA:CPU compile in the suite and this image's compiler
    segfaults non-deterministically building it inside a long-lived
    process with hundreds of prior compilations; a fresh process per
    invocation sidesteps that and tests the true CLI surface."""
    import os
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-m", "gemma_tpu"] + args.split(),
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
        env=dict(os.environ), timeout=900)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])


def test_bslmm_predict_staged_workflow(tmp_path):
    """The reference's staged composition (SURVEY §5.4): -bslmm writes
    .param.txt, -predict consumes it via -epm and imputes the NA
    phenotypes; with strong causal SNPs the predictions correlate with
    the held-out truth (demo.txt workflow)."""
    import numpy as np

    rng = np.random.default_rng(71)
    n, p = 150, 60
    X = rng.binomial(2, 0.35, size=(p, n)).astype(float)
    causal = [5, 20, 41]
    g = sum(X[c] for c in causal) * 0.9
    y_true = g + rng.normal(0, 0.5, n)

    test = np.zeros(n, dtype=bool)
    test[rng.choice(n, 50, replace=False)] = True

    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}, A, T, " + ", ".join(map(str, X[j])) + "\n")
    with open(tmp_path / "pheno.txt", "w") as fh:
        for i in range(n):
            fh.write("NA\n" if test[i] else f"{y_true[i]:.6f}\n")

    out = str(tmp_path)
    common = (f"-g {geno} -p {tmp_path}/pheno.txt -outdir {out} "
              f"-notsnp -no-check -precision float64")
    _cli(common + " -bslmm 1 -w 500 -s 1500 -seed 3 -o fit")
    assert (tmp_path / "fit.param.txt").exists()

    # -emu consumes the previous run's log file (ReadFile_log)
    assert "estimated mean" in (tmp_path / "fit.log.txt").read_text()
    _cli(common + f" -epm {out}/fit.param.txt -emu {out}/fit.log.txt "
         f"-predict 1 -o pr")
    lines = (tmp_path / "pr.prdt.txt").read_text().splitlines()
    assert len(lines) == n
    yhat = np.array([float(v) if v != "NA" else np.nan for v in lines])
    # training rows are NA; test rows get predictions
    assert np.all(np.isnan(yhat[~test]))
    assert np.all(np.isfinite(yhat[test]))
    r = np.corrcoef(yhat[test], y_true[test])[0, 1]
    assert r > 0.5, r


def test_gblup_predict_with_breeding_values(tmp_path):
    """-bslmm 2 (ridge/GBLUP) → -predict with -epm + -ebv + -k: the
    kinship-propagated breeding values (AddBV, prdt.cpp:133-205) carry
    the polygenic signal to the held-out individuals."""
    import numpy as np

    rng = np.random.default_rng(81)
    n, p = 160, 400
    X = rng.binomial(2, 0.35, size=(p, n)).astype(float)
    Xc = X - X.mean(axis=1, keepdims=True)
    beta = rng.normal(0, 1, p)
    g = Xc.T @ beta / np.sqrt(p)
    g = g / g.std()
    y_true = g + rng.normal(0, 0.35, n)     # strongly polygenic

    test = np.zeros(n, dtype=bool)
    test[rng.choice(n, 50, replace=False)] = True

    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}, A, T, " + ", ".join(map(str, X[j])) + "\n")
    with open(tmp_path / "pheno.txt", "w") as fh:
        for i in range(n):
            fh.write("NA\n" if test[i] else f"{y_true[i]:.6f}\n")

    out = str(tmp_path)
    common = (f"-g {geno} -p {tmp_path}/pheno.txt -outdir {out} "
              f"-notsnp -no-check -precision float64")
    _cli(common + " -gk -o K")
    _cli(common + f" -bslmm 2 -k {out}/K.cXX.txt -o gb")
    assert (tmp_path / "gb.bv.txt").exists()

    _cli(common + f" -epm {out}/gb.param.txt -ebv {out}/gb.bv.txt "
         f"-k {out}/K.cXX.txt -predict 1 -o pr")
    lines = (tmp_path / "pr.prdt.txt").read_text().splitlines()
    yhat = np.array([float(v) if v != "NA" else np.nan for v in lines])
    assert np.all(np.isfinite(yhat[test]))
    r = np.corrcoef(yhat[test], y_true[test])[0, 1]
    assert r > 0.3, r

"""One tiny dataset through EVERY analysis mode via the real CLI
dispatch (batch_run) — guards the flag→runner wiring end-to-end."""

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(101)
    n, p = 80, 50
    X = rng.binomial(2, 0.35, size=(p, n)).astype(float)
    y = X[3] * 0.8 + rng.normal(size=n)
    with open(tmp / "geno.txt", "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}, A, T, " + ", ".join(map(str, X[j])) + "\n")
    np.savetxt(tmp / "pheno.txt", np.column_stack([y, rng.normal(size=n)]))
    with open(tmp / "anno.txt", "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}\t{1000 * j}\t{1 + j % 2}\n")
    Xc = X - X.mean(axis=1, keepdims=True)
    z = (Xc / Xc.std(axis=1, keepdims=True)) @ (y - y.mean()) \
        / (y.std() * np.sqrt(n))
    with open(tmp / "beta.txt", "w") as fh:
        fh.write("rs\ta1\ta0\tz\tn\n")
        for j in range(p):
            fh.write(f"rs{j}\tA\tT\t{z[j]:.6f}\t{n}\n")
    return tmp


def _run(tmp, extra, out):
    argv = (f"-g {tmp}/geno.txt -p {tmp}/pheno.txt -outdir {tmp} "
            f"-notsnp -no-check -precision float64 -silence "
            f"-o {out}").split() + extra.split()
    batch_run(parse_args(argv), argv=["gemma-tpu"] + argv)


def test_cli_mode_matrix(data):
    tmp = data
    _run(tmp, "-gk 1", "k")                                  # 21
    _run(tmp, "-gk 2", "s")                                  # 22
    _run(tmp, f"-k {tmp}/k.cXX.txt -eigen", "e")             # 31
    _run(tmp, f"-k {tmp}/k.cXX.txt -lmm 4", "l4")            # 1-4
    _run(tmp, f"-k {tmp}/k.cXX.txt -lmm 5", "l5")            # 5
    _run(tmp, f"-u {tmp}/e.eigenU.txt -d {tmp}/e.eigenD.txt "
              f"-lmm 9", "l9")                               # 9
    _run(tmp, f"-k {tmp}/k.cXX.txt -lmm 2 -n 1 2", "mv")     # mvLMM
    _run(tmp, "-lm 4", "lm")                                 # 51-54
    _run(tmp, f"-k {tmp}/k.cXX.txt -vc 1", "v1")             # 61
    _run(tmp, f"-k {tmp}/k.cXX.txt -vc 2", "v2")             # 62
    _run(tmp, f"-k {tmp}/k.cXX.txt -vc 3", "v3")             # 63
    _run(tmp, "-gs", "gs")                                   # 25
    _run(tmp, f"-gq -beta {tmp}/beta.txt", "gq")             # 27
    _run(tmp, f"-vc 1 -beta {tmp}/beta.txt", "vb")           # MQS
    _run(tmp, f"-ci 1 -beta {tmp}/beta.txt -ref {tmp}/gs "
              f"-pve 0.3", "ci")                             # 66
    _run(tmp, "-bslmm 1 -w 100 -s 200 -seed 1", "b1")        # 11
    _run(tmp, f"-bslmm 2 -k {tmp}/k.cXX.txt", "b2")          # 12
    _run(tmp, "-bslmm 4 -hmin 0.2 -hmax 0.8", "b4")          # 14
    # GEMMA's -bf READER expects dap-g format (`rs block BF...`),
    # which differs from its own bf WRITER's layout (documented
    # reference quirk, bslmmdap.cpp:139 vs 334) — reformat b4's
    # output into the reader's format before chaining to -bslmm 5
    with open(tmp / "b4.bf.txt") as src, \
            open(tmp / "b4.bfin.txt", "w") as dst:
        header = src.readline().split()
        n_bf = len(header) - 4
        dst.write("rs\tblock\t" +
                  "\t".join(f"BF{i}" for i in range(n_bf)) + "\n")
        for i, line in enumerate(src):
            toks = line.split()
            dst.write(toks[1] + f"\tb{i // 20}\t" +
                      "\t".join(toks[4:]) + "\n")
    _run(tmp, f"-bslmm 5 -hyp {tmp}/b4.hyp.txt "
              f"-bf {tmp}/b4.bfin.txt", "b5")                # 15
    _run(tmp, f"-epm {tmp}/b1.param.txt -emu {tmp}/b1.log.txt "
              f"-predict 1", "p1")                           # 41
    _run(tmp, f"-k {tmp}/k.cXX.txt -predict 3", "p3")        # 43
    _run(tmp, f"-a {tmp}/anno.txt -calccor", "cc")           # 71
    _run(tmp, f"-a {tmp}/anno.txt -gw", "gw")                # 72

    for out, suffix in [("k", "cXX"), ("s", "sXX"), ("e", "eigenU"),
                        ("l4", "assoc"), ("mv", "assoc"), ("lm", "assoc"),
                        ("gs", "S"), ("gq", "q"), ("b1", "hyp"),
                        ("b2", "param"), ("b4", "bf"), ("p1", "prdt"),
                        ("p3", "prdt"), ("cc", "cor")]:
        assert (tmp / f"{out}.{suffix}.txt").exists(), (out, suffix)
    for out in ("l5",):
        assert (tmp / f"{out}.residU.txt").exists()
    # every run leaves a log
    for out in ("k", "l4", "v3", "ci", "b5", "gw"):
        assert (tmp / f"{out}.log.txt").exists()

"""TPR@threshold surrogate grid (tools/compare_cache_quality.py --tpr).

Validates the decision tool VERDICT r3 #6 asked for: detection TPR at a
fixed p-value threshold under token-erosion surrogates must (a) be 1.0 for
strongly watermarked codes at identity, (b) decay monotonically (weakly)
with erosion rate, (c) report ~0 FPR on unwatermarked codes — so that
equal TPR columns across cache dtypes are a meaningful equivalence claim.
"""

import io
import sys

import jax
import jax.numpy as jnp
import numpy as np

from wmar_tpu.core import HashGreenlist, WatermarkSpec
from wmar_tpu.core.spec import SeedStrategy, SplitStrategy

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from tools.compare_cache_quality import tpr_table  # noqa: E402

VOCAB = 64
SPEC = WatermarkSpec(vocab_size=VOCAB, seed_strategy=SeedStrategy.LINEAR,
                     split_strategy=SplitStrategy.RANDOM, context_size=1,
                     delta=2.0, gamma=0.25)


def _green_rich_codes(greenlist, n, t, hit=0.9, seed=0):
    """Construct codes whose tokens are green w.p. ~hit (given the previous
    token), by rejection over candidate targets — a stand-in for sampled
    watermarked output without running a model."""
    rng = np.random.default_rng(seed)
    codes = np.zeros((n, t), np.int32)
    codes[:, 0] = rng.integers(0, VOCAB, n)
    cand = rng.integers(0, VOCAB, size=(n, t, 24))
    want_green = rng.random((n, t)) < hit
    for step in range(1, t):
        keys = jnp.asarray(codes[:, step - 1])
        picked = cand[:, step, 0].copy()
        found = np.zeros(n, bool)
        for j in range(cand.shape[2]):
            cj = jnp.asarray(cand[:, step, j])
            g = np.asarray(greenlist.green_lookup(keys, cj))
            take = ~found & (g == want_green[:, step])
            picked[take] = cand[take, step, j]
            found |= take
        codes[:, step] = picked
    return codes


def test_tpr_table_sane(capsys):
    greenlist = HashGreenlist(SPEC)
    n, t = 16, 256
    strong = _green_rich_codes(greenlist, n, t, hit=0.9)
    results = {"packed": {"codes": strong}, "packed4": {"codes": strong.copy()}}
    tpr_table(SPEC, greenlist, results, VOCAB)
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    rows = {}
    for ln in lines:
        if ln.startswith(("token-noise", "crop", "FPR")):
            parts = ln.rsplit(None, 2)
            if ln.startswith("FPR"):
                rows["fpr"] = float(ln.split()[-1])
            else:
                name = ln[:22].strip()
                rows[name] = [float(x) for x in ln[22:].split()]
    assert rows["token-noise 0%"] == [1.0, 1.0]
    # monotone (weak) decay with erosion; identical columns (same codes)
    seq = [rows[f"token-noise {r}%"][0] for r in (0, 10, 25, 40, 60)]
    assert all(a >= b - 1e-9 for a, b in zip(seq, seq[1:])), seq
    assert rows["fpr"] <= 1 / 16 + 1e-9
    for k, v in rows.items():
        if k != "fpr":
            assert v[0] == v[1], (k, v)  # identical inputs -> identical TPR

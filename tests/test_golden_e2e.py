"""Golden-output regression: a tiny deterministic generate run must produce
exactly the same tokens and detection results as the checked-in golden file.

Locks the sampler / greenlist / attack-grid / detection stack end-to-end so
refactors cannot silently shift outputs (VERDICT r2 #7). The run is the
tiny-model counterpart of the reference's generate entry
(reference generate.py:239-420): sample -> classic attack grid ->
re-tokenize -> detect.

Regenerate after an *intentional* behavior change with:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tests/test_golden_e2e.py --regen
"""

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

GOLDEN_PATH = os.path.join(REPO, "assets", "golden_e2e.json")

ARGV = [
    "--tiny", "--model", "taming",
    "--conditioning", "0,1",
    "--num_samples_per_conditioning", "1",
    "--batch_size", "2",
    "--wm_method", "gentime",
    "--wm_seed_strategy", "linear", "--wm_split_strategy", "stratifiedrand",
    "--wm_context_size", "1", "--wm_delta", "2.0", "--wm_gamma", "0.25",
    "--seed", "42",
]


def run_and_collect(outdir: str) -> dict:
    import generate

    generate.main(ARGV + ["--outdir", outdir])
    out = {"records": {}, "codes": {}}
    for path in sorted(glob.glob(os.path.join(outdir, "c=*", "*.json"))):
        rel = os.path.relpath(path, outdir)
        rec = json.load(open(path))
        out["records"][rel] = {"pvalue": rec["pvalue"], "l0": rec["l0"]}
    # Re-tokenized codes are saved next to each attack record; locking them
    # locks sampling AND the attack->retokenize path.
    for path in sorted(glob.glob(os.path.join(outdir, "c=*", "*.npy"))):
        rel = os.path.relpath(path, outdir)
        out["codes"][rel] = np.load(path).ravel().astype(int).tolist()
    assert out["records"] and out["codes"]
    return out


def test_golden_e2e(tmp_path):
    got = run_and_collect(str(tmp_path))
    golden = json.load(open(GOLDEN_PATH))
    assert sorted(got["codes"]) == sorted(golden["codes"]), "code-file set changed"
    for rel, toks in golden["codes"].items():
        assert got["codes"][rel] == toks, f"generated tokens changed: {rel}"
    assert sorted(got["records"]) == sorted(golden["records"]), "record set changed"
    for rel, rec in golden["records"].items():
        g = got["records"][rel]
        assert g["l0"] == rec["l0"], f"l0 changed: {rel}"
        assert np.isclose(g["pvalue"], rec["pvalue"], rtol=1e-6, atol=1e-12), (
            f"pvalue changed: {rel}: {g['pvalue']} vs {rec['pvalue']}"
        )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            blob = run_and_collect(td)
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(blob, f, indent=0, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}: {len(blob['records'])} records, "
              f"{len(blob['codes'])} code files")
    else:
        print(__doc__)

"""Golden-output regression for the audio path: a tiny deterministic
``wmar_audio_eval`` run must reproduce exactly the checked-in token streams
and detection records.

The audio counterpart of ``tests/test_golden_e2e.py``: locks the Moshi
generation loop (temporal + depformer + delays), the Maryland watermark
fused into sampling, Mimi encode/decode, and the scoring stack, so
refactors cannot silently shift outputs. Mirrors the reference's
``wmar_audio/evals/main_wm.py`` flow at smoke scale.

Regenerate after an *intentional* behavior change with:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tests/test_golden_audio_e2e.py --regen
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pytest

pytestmark = pytest.mark.slow  # heavyweight: run the fast tier with -m "not slow"

GOLDEN_PATH = os.path.join(REPO, "assets", "golden_audio_e2e.json")

ARGV = [
    "--tiny",
    "--steps", "24",
    "--batch_size", "1",
    "--wm_method", "maryland",
    "--wm_streams", "0,1,2,3,4,5,6,7,8",
    "--wm_delta", "8.0",
    "--wm_gamma", "0.25",
    "--wm_seed", "0",
    "--temperature", "0.8",
    "--top_k", "250",
    "--seed", "42",
    "--no_augs",
    "--save_tokens",
]

RECORD_KEYS = ("pvalue", "token_match")


def run_and_collect(outdir: str) -> dict:
    import wmar_audio_eval

    records = wmar_audio_eval.main(ARGV + ["--output_dir", outdir])
    out = {
        "text_tokens": np.load(os.path.join(outdir, "text_tokens.npy"))
        .ravel().astype(int).tolist(),
        "audio_tokens": np.load(os.path.join(outdir, "audio_tokens.npy"))
        .ravel().astype(int).tolist(),
        "records": {
            f"{r['aug']}/{r['param']}/b{r['batch']}/s{r['stream']}":
                {k: r[k] for k in RECORD_KEYS}
            for r in records
        },
    }
    assert out["records"] and out["audio_tokens"]
    return out


def test_golden_audio_e2e(tmp_path):
    got = run_and_collect(str(tmp_path))
    golden = json.load(open(GOLDEN_PATH))
    assert got["text_tokens"] == golden["text_tokens"], "text stream changed"
    assert got["audio_tokens"] == golden["audio_tokens"], "audio streams changed"
    assert sorted(got["records"]) == sorted(golden["records"]), "record set changed"
    for rel, rec in golden["records"].items():
        g = got["records"][rel]
        assert np.isclose(g["token_match"], rec["token_match"], atol=1e-9), (
            f"token_match changed: {rel}: {g['token_match']} vs {rec['token_match']}"
        )
        if rec["pvalue"] is None:
            assert g["pvalue"] is None, f"pvalue appeared: {rel}"
        else:
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
              f"{len(blob['audio_tokens'])} audio tokens")
    else:
        print(__doc__)

"""The example scripts are runnable documentation — keep them running.

Counterparts of the reference's notebooks (`notebooks/colab.ipynb`,
`syncseal/notebooks/standalone.ipynb`): each example must execute end to
end at tiny scale on CPU.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_standalone_sync_example(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "standalone_sync.py"),
         "--tiny", "--img_size", "64", "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "corner error" in out.stdout and "unwarp PSNR" in out.stdout
    assert (tmp_path / "sync_ok.png").exists()
    assert (tmp_path / "sync_hard.png").exists()

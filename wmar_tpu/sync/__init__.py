"""Geometric synchronization (WAM-quadrant + SyncSeal ports).

Modules (reference: ``wmar/watermarking/synchronization.py``, ``syncseal/``):

* ``wam_logic`` / ``wam_exact`` — WAM quadrant sync + the weight-compatible
  WAM model port.
* ``syncseal`` / ``syncseal_models`` — SyncSeal embedder/extractor, the
  reference-spec training loop, eval grids, SIFT+RANSAC baseline.
* ``homography`` — corner-homography solve/warp/unwarp.
* ``baselines`` — baseline watermark bank behind one embed/detect wrapper
  (``syncseal/evals/baselines.py``).
* ``eval_wm`` — watermark robustness evaluated through the sync layer
  (``syncseal/evals/eval_wm.py``).
"""

from __future__ import annotations


def load_sync_manager(path):
    from wmar_tpu.sync.manager import SyncManager

    return SyncManager.from_path(path)

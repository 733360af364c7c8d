"""SyncManager: dispatch between WAM-based and SyncSeal synchronization.

Reference: ``wmar/watermarking/synchronization.py:386-409`` dispatches on
the checkpoint filename ("wam" vs "sync") and exposes
``add_sync``/``remove_sync`` with timing logs.
"""

from __future__ import annotations

import time

from wmar_tpu.sync.wam_logic import WamSync


class SyncManager:
    def __init__(self, impl, log_fn=None):
        self.impl = impl
        self.log_fn = log_fn or (lambda *_: None)

    @staticmethod
    def from_path(path: str, embedder=None, image_size: int = 256) -> "SyncManager":
        """Dispatch on filename like the reference. ``embedder`` supplies the
        pixel-watermark backbone (converted WAM weights / SyncSeal model)."""
        if path is None or "wam" in path.lower():
            if embedder is None:
                import os

                if path is None or not os.path.exists(path):
                    raise ValueError(
                        "WAM sync needs the wam_mit.pth checkpoint (path not found: "
                        f"{path!r}) or a custom embedder"
                    )
                from wmar_tpu.sync.wam_exact import WamExact

                embedder = WamExact.load(path)
            return SyncManager(WamSync(embedder, image_size=image_size))
        if "sync" in path.lower():
            if path.endswith((".pt", ".pth", ".safetensors")):
                from wmar_tpu.sync.syncseal import SyncSealRef

                return SyncManager(SyncSealRef.load_torch(path))
            from wmar_tpu.sync.syncseal import SyncSealModel

            return SyncManager(SyncSealModel.load(path))
        raise ValueError(f"Cannot infer sync model type from path: {path}")

    def add_sync(self, imgs):
        t0 = time.time()
        out = self.impl.add_sync(imgs)
        self.log_fn(f"add_sync time: {time.time() - t0:.2f}s")
        return out

    def remove_sync(self, imgs):
        t0 = time.time()
        out = self.impl.remove_sync(imgs)
        self.log_fn(f"remove_sync time: {time.time() - t0:.2f}s")
        return out

"""Geometric synchronization (WAM-quadrant + SyncSeal ports).

Round-1 status: interface + dispatcher; model ports land next
(reference: ``wmar/watermarking/synchronization.py``, ``syncseal/``).
"""

from __future__ import annotations


def load_sync_manager(path):
    from wmar_tpu.sync.manager import SyncManager

    return SyncManager.from_path(path)

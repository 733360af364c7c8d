"""precompute_imagenet_codes.py: dataset tokenization CLI (reference
``precompute_imagenet_codes.py`` incl. the custom split-file path used for
512px Chameleon, ``:57-130``)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def image_tree(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("n01", "n02"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{cls}_{i}.JPEG")
    return tmp_path


def test_precompute_writes_code_files(image_tree):
    import precompute_imagenet_codes as pc

    out = image_tree / "codes"
    pc.main([
        "--model", "taming", "--tiny", "--datapath", str(image_tree / "data"),
        "--outdir", str(out), "--per_class", "2", "--batch_size", "2",
    ])
    files = sorted(os.listdir(out))
    assert len(files) == 4  # 2 classes x per_class 2
    codes = np.load(out / files[0])
    assert codes.dtype.kind == "i" and codes.ndim == 1


def test_precompute_split_file(image_tree):
    import precompute_imagenet_codes as pc

    split = image_tree / "split.txt"
    split.write_text("img_n01_0.JPEG\nimg_n02_1\n")  # with and without ext
    out = image_tree / "codes_split"
    pc.main([
        "--model", "taming", "--tiny", "--datapath", str(image_tree / "data"),
        "--outdir", str(out), "--split_file", str(split),
    ])
    files = sorted(os.listdir(out))
    assert files == ["n01_img_n01_0.npy", "n02_img_n02_1.npy"]

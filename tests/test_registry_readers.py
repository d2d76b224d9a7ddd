"""Dataset-reader tests beyond the split-JSON path: FGVCAircraft annotation
files, eval-only ImageNet variants with label_map remapping."""

import os

import numpy as np
import pytest
from PIL import Image

from uml_tpu.data.fewshot import get_label_map, get_testset
from uml_tpu.data.registry import dataset_classes, read_classnames


def _touch_img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (8, 8)).save(path)


@pytest.fixture()
def fgvc_dir(tmp_path):
    ds = tmp_path / "fgvc_aircraft"
    (ds / "images").mkdir(parents=True)
    (ds / "variants.txt").write_text("Boeing 707\nA340-300\n")
    for split, rows in (("train", ["img1 Boeing 707", "img2 A340-300"]),
                        ("val", ["img3 Boeing 707"]),
                        ("test", ["img4 A340-300"])):
        (ds / f"images_variant_{split}.txt").write_text("\n".join(rows) + "\n")
    for i in range(1, 5):
        _touch_img(str(ds / "images" / f"img{i}.jpg"))
    return str(tmp_path)


def test_fgvc_reader(fgvc_dir):
    bm = dataset_classes["fgvc_aircraft"](fgvc_dir)
    assert bm.num_classes == 2
    assert bm.classnames == ["Boeing 707", "A340-300"]
    assert bm.train[0]["impath"].endswith("img1.jpg")
    assert bm.train[1]["label"] == 1
    assert len(bm.val) == 1 and len(bm.test) == 1


@pytest.fixture()
def imagenet_variant_dir(tmp_path):
    # original imagenet classnames: 4 wnids
    imagenet = tmp_path / "imagenet"
    imagenet.mkdir()
    (imagenet / "classnames.txt").write_text(
        "n01 tench\nn02 goldfish\nn03 shark\nn04 ray\n")
    # imagenet-a subset holds wnids n02, n04 (labels map to 1, 3)
    adv = tmp_path / "imagenet-adversarial"
    (adv / "imagenet-a").mkdir(parents=True)
    (adv / "classnames.txt").write_text("n02 goldfish\nn04 ray\n")
    (adv / "imagenet-a" / "README.txt").parent.mkdir(exist_ok=True)
    (adv / "imagenet-a" / "README.txt").write_text("ignore me")
    for wnid in ("n02", "n04"):
        _touch_img(str(adv / "imagenet-a" / wnid / "x.jpg"))
    return str(tmp_path)


def test_imagenet_a_label_map(imagenet_variant_dir):
    bm = dataset_classes["imagenet_a"](imagenet_variant_dir)
    # subset labels 0,1 map back to original labels 1,3 (imagenet_a.py:30-51)
    assert bm.label_map == [1, 3]
    assert len(bm.test) == 2
    assert bm.test[0]["classname"] == "goldfish"
    # README.txt ignored
    assert all("README" not in it["impath"] for it in bm.test)
    assert get_label_map(imagenet_variant_dir, "imagenet_a") == [1, 3]
    assert get_label_map(imagenet_variant_dir, "caltech101") is None


def test_read_classnames_ordered(tmp_path):
    f = tmp_path / "classnames.txt"
    f.write_text("n0z two words name\nn0a single\n")
    names = read_classnames(str(f))
    assert list(names.items()) == [("n0z", "two words name"), ("n0a", "single")]


def test_get_testset_unknown():
    with pytest.raises((NotImplementedError, AssertionError, KeyError)):
        get_testset("nope", "/tmp")

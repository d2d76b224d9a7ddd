"""Data-layer tests: registry readers, few-shot sampling, byte-parity with
the reference's generate_fewshot pipeline, transforms."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from uml_tpu.data.benchmarks import (
    generate_fewshot_dataset,
    get_lab2cname,
    read_split,
    save_split,
    split_trainval,
)
from uml_tpu.data.registry import dataset_classes
from uml_tpu.utils.io import save_as_json
from uml_tpu.utils.seeding import set_random_seed

REFERENCE = "/root/reference/vision_language"


def make_caltech_fixture(root, n_classes=4, per_class=(10, 5, 6)):
    """A fake caltech-101 tree + split_zhou_Caltech101.json with real files."""
    ds = os.path.join(root, "caltech-101")
    img_dir = os.path.join(ds, "101_ObjectCategories")
    classes = [f"class_{c}" for c in range(n_classes)]
    split = {"train": [], "val": [], "test": []}
    for label, cname in enumerate(classes):
        os.makedirs(os.path.join(img_dir, cname), exist_ok=True)
        counter = 0
        for part, n in zip(("train", "val", "test"), per_class):
            for _ in range(n):
                rel = f"{cname}/img_{counter:03d}.jpg"
                Image.new("RGB", (8, 8), (label * 10, counter, 0)).save(
                    os.path.join(img_dir, rel)
                )
                split[part].append((rel, label, cname))
                counter += 1
    save_as_json(split, os.path.join(ds, "split_zhou_Caltech101.json"))
    return root


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return str(make_caltech_fixture(str(root)))


def test_registry_reads_split(data_dir):
    bm = dataset_classes["caltech101"](data_dir)
    assert bm.num_classes == 4
    assert len(bm.train) == 40 and len(bm.val) == 20 and len(bm.test) == 24
    assert bm.classnames == [f"class_{c}" for c in range(4)]
    assert all(os.path.isfile(it["impath"]) for it in bm.train)


def test_registry_has_all_15():
    assert len(dataset_classes) == 15
    for name in ["oxford_pets", "oxford_flowers", "fgvc_aircraft", "dtd",
                 "eurosat", "stanford_cars", "food101", "sun397", "caltech101",
                 "ucf101", "imagenet", "imagenetv2", "imagenet_sketch",
                 "imagenet_a", "imagenet_r"]:
        assert name in dataset_classes


def test_fewshot_sampling_counts(data_dir):
    bm = dataset_classes["caltech101"](data_dir)
    set_random_seed(1)
    fs = generate_fewshot_dataset(bm.train, bm.val, num_shots=3, max_val_shots=4)
    assert len(fs["train"]["data"]) == 4 * 3
    # val shots = min(4, 3) = 3
    assert len(fs["val"]["data"]) == 4 * 3
    # more shots than available -> take all, no repeat
    set_random_seed(1)
    fs16 = generate_fewshot_dataset(bm.train, bm.val, num_shots=16)
    assert len(fs16["train"]["data"]) == 4 * 10
    assert len(fs16["val"]["data"]) == 4 * 4


def test_fewshot_deterministic(data_dir):
    bm = dataset_classes["caltech101"](data_dir)
    outs = []
    for _ in range(2):
        set_random_seed(7)
        outs.append(generate_fewshot_dataset(bm.train, bm.val, num_shots=3))
    assert outs[0] == outs[1]
    set_random_seed(8)
    other = generate_fewshot_dataset(bm.train, bm.val, num_shots=3)
    assert other != outs[0]


@pytest.mark.heavy
@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_fewshot_byte_parity_with_reference(data_dir, tmp_path):
    """The emitted shot_{n}-seed_{s}.json must be byte-identical to what the
    reference pipeline (engine.datasets.benchmark + save_as_json) produces."""
    ref_script = f"""
import sys, json
sys.path.insert(0, {REFERENCE!r})
from engine.tools.utils import set_random_seed, save_as_json
from engine.datasets.benchmark import generate_fewshot_dataset
from engine.datasets import dataset_classes
set_random_seed(3)
bm = dataset_classes["caltech101"]({data_dir!r})
fs = generate_fewshot_dataset(bm.train, bm.val, num_shots=3, max_val_shots=4)
save_as_json(fs, {str(tmp_path / 'ref.json')!r})
"""
    subprocess.run([sys.executable, "-c", ref_script], check=True,
                   capture_output=True)

    from uml_tpu.cli.generate_fewshot import build_parser, main
    args = build_parser().parse_args([
        "--data_dir", data_dir, "--indices_dir", str(tmp_path / "indices"),
        "--dataset", "caltech101", "--train-shot", "3", "--seed", "3",
    ])
    ours_path = main(args)
    ref = (tmp_path / "ref.json").read_bytes()
    ours = open(ours_path, "rb").read()
    assert ref == ours


def test_split_roundtrip(data_dir, tmp_path):
    bm = dataset_classes["caltech101"](data_dir)
    prefix = os.path.join(data_dir, "caltech-101", "101_ObjectCategories")
    out = tmp_path / "rt.json"
    save_split(bm.train, bm.val, bm.test, str(out), prefix)
    train, val, test = read_split(str(out), prefix)
    assert train == bm.train and val == bm.val and test == bm.test


def test_split_trainval():
    items = [{"impath": f"i{k}", "label": k % 2, "classname": str(k % 2)}
             for k in range(20)]
    set_random_seed(0)
    train, val = split_trainval(items, p_val=0.2)
    assert len(train) == 16 and len(val) == 4
    assert {id(x) for x in train}.isdisjoint({id(x) for x in val})


def test_lab2cname():
    items = [{"impath": "a", "label": 1, "classname": "b"},
             {"impath": "c", "label": 0, "classname": "a"}]
    mapping, names = get_lab2cname(items)
    assert mapping == {0: "a", 1: "b"} and names == ["a", "b"]


def test_transforms_shapes_and_normalization(data_dir):
    from uml_tpu.data.transforms import build_transform, load_uint8, PIXEL_MEAN, PIXEL_STD

    bm = dataset_classes["caltech101"](data_dir)
    impath = bm.train[0]["impath"]
    for aug in ("crop", "flip", "randomcrop", "randomresizedcrop"):
        out = build_transform(aug, seed=0)(impath)
        assert out.shape == (224, 224, 3) and out.dtype == np.float32
    u8 = load_uint8(impath)
    assert u8.shape == (224, 224, 3) and u8.dtype == np.uint8
    # normalize(u8) == transform output for deterministic crop
    got = build_transform("crop")(impath)
    expected = (u8.astype(np.float32) / 255.0 - PIXEL_MEAN) / PIXEL_STD
    np.testing.assert_allclose(got, expected, atol=1e-6)
    # flip is mirror of crop
    flipped = build_transform("flip")(impath)
    np.testing.assert_allclose(flipped, got[:, ::-1], atol=1e-6)
    with pytest.raises(ValueError):
        build_transform("bogus")


def test_text_feature_set():
    from uml_tpu.data.fewshot import TextFeatureSet

    feats = np.arange(24, dtype=np.float32).reshape(12, 2)
    labels = np.repeat(np.arange(3), 4)
    eots = np.arange(12)
    full = TextFeatureSet(feats, labels, eots)
    assert len(full) == 12
    set_random_seed(0)
    two = TextFeatureSet(feats, labels, eots, n_shots=2)
    assert len(two) == 6
    assert np.bincount(two.labels, minlength=3).tolist() == [2, 2, 2]
    avg = TextFeatureSet(feats, labels, eots, n_shots="average")
    assert len(avg) == 3
    np.testing.assert_allclose(avg.features[0], feats[:4].mean(0))
    with pytest.raises(ValueError):
        TextFeatureSet(feats, labels, eots, n_shots=1.5)

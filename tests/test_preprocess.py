"""Offline preprocessing on synthetic Face++ JSONs + raw images."""

import json
import os

import cv2
import numpy as np
import pytest

from ffwm_tpu.data.preprocess import (
    camera2ang,
    crop_and_resize,
    get_valid_index,
    parse_facepp_json,
    process_multipie_image,
    process_multipie_train_split,
    resize_landmarks,
)


def _synthetic_facepp_json(path, rng, w=640, h=480, cx=320, cy=200,
                           eye_spread=(20.0, 20.0)):
    """Minimal but complete thousandlandmark JSON around (cx, cy)."""
    def pt(dx=60, dy=60):
        return {"x": float(cx + rng.uniform(-dx, dx)),
                "y": float(cy + rng.uniform(-dy, dy))}

    def eye_pt(side):
        spread = eye_spread[0] if side == "left" else eye_spread[1]
        sign = -1 if side == "right" else 1
        return {"x": float(cx + sign * 40 + rng.uniform(-spread, spread)),
                "y": float(cy - 30 + rng.uniform(-5, 5))}

    face = {}
    for i in range(64):
        face[f"face_contour_right_{i}"] = pt()
        face[f"face_contour_left_{i}"] = pt()
    for i in range(144):
        face[f"face_hairline_{i}"] = pt()
    out = {"face": face}
    for group, n, maker in (
        ("left_eyebrow", 64, pt), ("right_eyebrow", 64, pt),
        ("left_eye_eyelid", 64, pt), ("right_eye_eyelid", 64, pt),
    ):
        out[group] = {f"{group}_{i}": maker() for i in range(n)}
    out["left_eye"] = {f"left_eye_{i}": eye_pt("left") for i in range(63)}
    out["left_eye"]["left_eye_pupil_center"] = eye_pt("left")
    out["right_eye"] = {f"right_eye_{i}": eye_pt("right") for i in range(63)}
    out["right_eye"]["right_eye_pupil_center"] = eye_pt("right")
    nose = {f"nose_left_{i}": pt(20, 20) for i in range(63)}
    nose.update({f"nose_right_{i}": pt(20, 20) for i in range(63)})
    nose.update({f"nose_midline_{i}": pt(5, 40) for i in range(60)})
    nose["left_nostril"] = pt(10, 10)
    nose["right_nostril"] = pt(10, 10)
    out["nose"] = nose
    mouth = {}
    for i in range(64):
        mouth[f"upper_lip_{i}"] = pt(30, 10)
        mouth[f"lower_lip_{i}"] = pt(30, 10)
    out["mouth"] = mouth

    with open(path, "w") as f:
        json.dump({"face": {"landmark": out}}, f)


def _write_raw(path, rng, w=640, h=480):
    img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture
def raw_root(tmp_path):
    rng = np.random.RandomState(0)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    lm_dir = tmp_path / "lms"
    for d in (img_dir, mask_dir, lm_dir):
        d.mkdir()
    for ident in ("001", "002"):
        for cam in ("051", "080"):
            name = f"{ident}_01_01_{cam}_06.png"
            _write_raw(str(img_dir / name), rng)
            mask = np.zeros((480, 640), np.uint8)
            cv2.circle(mask, (320, 220), 150, 255, -1)
            cv2.imwrite(str(mask_dir / f"{name[:-7]}_07.png"), mask)
            # profile cameras get a collapsed right eye (half-face case)
            spread = (20.0, 20.0) if cam == "051" else (20.0, 0.5)
            _synthetic_facepp_json(str(lm_dir / f"{name[:-7]}.json"),
                                   rng, eye_spread=spread)
    return tmp_path


def test_parse_facepp_json(raw_root):
    lm = parse_facepp_json(str(raw_root / "lms" / "001_01_01_051.json"))
    assert len(lm["el"]) == 64 and len(lm["er"]) == 64
    assert len(lm["ml"]) == 64 and len(lm["mr"]) == 64
    assert len(lm["fl"]) == 136 and len(lm["fr"]) == 136
    assert len(lm["nm"]) == 60
    # 580-pt layout: el64+ml64+ebl64+nl64+fl136+nm60+er64+mr64+ebr64+nr64+fr136+nm60 = 904?
    total = sum(len(lm[k]) for k in
                ("el", "ml", "ebl", "nl", "fl", "nm")) * 2
    assert total > 0


def test_camera2ang():
    assert camera2ang("05_1") == 0
    assert camera2ang("24_0") == 90
    assert camera2ang("11_0") == -90


def test_get_valid_index():
    el = [[x, 0] for x in np.linspace(0, 100, 10)]
    er_flat = [[50.0, 0]] * 10  # no spread -> invalid half
    lo, hi = get_valid_index(er_flat, el, 580)
    assert (lo, hi) == (0, 290)
    er = [[x, 0] for x in np.linspace(0, 100, 10)]
    assert get_valid_index(er, el, 580) == (0, 580)


def test_resize_landmarks_bounds():
    lm = np.array([[100.0, 100.0], [500.0, 400.0]])
    out = resize_landmarks(lm, 320, 240, 200, 128)
    assert out.min() >= 0 and out.max() <= 127


def test_crop_and_resize_padding(rng):
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    out = crop_and_resize(img, 10, 10, 100, 128)  # crop far out of bounds
    assert out.shape == (128, 128, 3)


def test_process_multipie_image(raw_root):
    lm, gate, idx, mask, img = process_multipie_image(
        str(raw_root / "images" / "001_01_01_080_06.png"),
        str(raw_root / "masks" / "001_01_01_080_07.png"),
        str(raw_root / "lms" / "001_01_01_080.json"))
    assert img.shape == (128, 128, 3)
    assert mask.shape == (128, 128)
    assert lm.shape[1] == 2 and lm.shape[0] == gate.shape[0]
    assert set(np.unique(gate)) <= {0.0, 1.0}
    # collapsed right eye -> half-face gate window
    assert idx in [(0, lm_half * 2 // 2) for lm_half in [lm.shape[0] // 2]] or idx[0] == 0


@pytest.mark.reference
def test_golden_vs_reference_pipeline(raw_root):
    """Byte-identical landmarks/gates/masks/images vs the reference
    data_process/process.py run on the same synthetic Face++ inputs."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_process", "/root/reference/data_process/process.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    # the reference keeps these as script-level globals (process.py:402-409)
    ref.load_size = 128
    ref.lm_dir = str(raw_root / "lms")
    ref.mask_dir = str(raw_root / "masks")

    for ident in ("001", "002"):
        for cam in ("051", "080"):
            name = f"{ident}_01_01_{cam}_06.png"
            img_path = str(raw_root / "images" / name)
            lm_r, gate_r, idx_r, mask_r, img_r = ref.process_multipie_train(img_path)
            lm, gate, idx, mask, img = process_multipie_image(
                img_path,
                str(raw_root / "masks" / f"{name[:-7]}_07.png"),
                str(raw_root / "lms" / f"{name[:-7]}.json"))
            assert tuple(idx) == tuple(idx_r), name
            np.testing.assert_array_equal(lm, lm_r, err_msg=name)
            np.testing.assert_array_equal(gate, gate_r, err_msg=name)
            np.testing.assert_array_equal(mask, mask_r, err_msg=name)
            np.testing.assert_array_equal(img, img_r, err_msg=name)
            # the frontal pair path (idx_face propagated from the profile)
            lm_rf, gate_rf, _, _, _ = ref.process_multipie_train(
                str(raw_root / "images" / f"{ident}_01_01_051_06.png"), idx_r)
            lm_f, gate_f, _, _, _ = process_multipie_image(
                str(raw_root / "images" / f"{ident}_01_01_051_06.png"),
                str(raw_root / "masks" / f"{ident}_01_01_051_07.png"),
                str(raw_root / "lms" / f"{ident}_01_01_051.json"),
                idx_face=idx)
            np.testing.assert_array_equal(lm_f, lm_rf, err_msg=name)
            np.testing.assert_array_equal(gate_f, gate_rf, err_msg=name)


def test_full_train_split(raw_root, tmp_path):
    save = tmp_path / "out"
    n = process_multipie_train_split(
        str(raw_root / "images"), str(raw_root / "masks"),
        str(raw_root / "lms"), str(save))
    assert n == 4  # every non-081/191 image pairs with its frontal
    lms = np.load(str(save / "landmarks.npy"), allow_pickle=True).item()
    assert set(lms) == {"lm_S", "lm_F", "gate"}
    key = next(iter(lms["lm_S"]))
    assert lms["lm_S"][key].shape[1] == 2
    assert os.path.isdir(save / "images") and os.path.isdir(save / "masks")
    # the produced tree is loadable by FaceDataset
    from ffwm_tpu.data import FaceDataset

    root = tmp_path / "ds"
    (root / "multipie").mkdir(parents=True)
    os.rename(save, root / "multipie" / "train")
    ds = FaceDataset(str(root), phase="train")
    item = ds[0]
    assert item["img_S"].shape == (128, 128, 3)
    assert item["lm_S"].shape == item["gate"].shape[:1] + (2,)

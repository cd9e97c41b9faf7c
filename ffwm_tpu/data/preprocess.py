"""Offline dataset preprocessing — raw Multi-PIE/LFW -> training layout.

Clean-room rebuild of data_process/process.py: converts raw images plus
Face++ "thousandlandmark" JSONs into the 128x128 crops, masks and the
580-point landmark arrays the training pipeline consumes.

Pipeline per image:
  1. parse the Face++ landmark groups into the reference's fixed layout
     ``[el, ml, ebl, nl, fl, nm, er, mr, ebr, nr, fr, nm]`` (290 per half,
     580 total — see models/ffwm_model.py:222-224 for the part indices that
     depend on this exact layout),
  2. roll-correct frontal (and LFW) images by the inter-pupil angle,
  3. crop a square around the nose-top center with radius = max vertical
     landmark extent, zero-pad at borders, resize to load_size (cubic),
  4. compute the half-face validity window from the eye-x variance ratio
     (<= 0.2 -> only half the landmarks are trusted),
  5. synthesize extra hair/neck landmarks offset outward from the face
     contour (pose-ratio-scaled), gated by the face mask,
  6. final ``gate = gate_S * gate_F`` per pair.
"""

from __future__ import annotations

import json
import os
from os.path import basename, join
from typing import Dict, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ffwm_tpu.data.face_dataset import s2f

CAMERA_ANGLES = {
    "24_0": 90, "01_0": 75, "20_0": 60, "19_0": 45, "04_1": 30, "05_0": 15,
    "05_1": 0, "14_0": -15, "13_0": -30, "08_0": -45, "09_0": -60,
    "12_0": -75, "11_0": -90, "08_1": -30, "19_1": 45,
}


def camera2ang(camera_id: str) -> int:
    return CAMERA_ANGLES[camera_id]


def _pts(group: dict, pattern: str, n: int) -> list:
    return [[group[pattern.format(i)]["x"], group[pattern.format(i)]["y"]]
            for i in range(n)]


def parse_facepp_json(path: str) -> Dict:
    """Face++ thousandlandmark JSON -> named landmark groups + crop center."""
    with open(path) as f:
        lm = json.load(f)["face"]["landmark"]

    face = lm["face"]
    frl = _pts(face, "face_contour_right_{}", 64)
    fll = _pts(face, "face_contour_left_{}", 64)
    hair = _pts(face, "face_hairline_{}", 144)
    fru, flu = hair[:72], hair[72:]
    fr = frl + fru
    fl = flu + fll[::-1]

    ebl = _pts(lm["left_eyebrow"], "left_eyebrow_{}", 64)
    ebr = _pts(lm["right_eyebrow"], "right_eyebrow_{}", 64)

    el = _pts(lm["left_eye"], "left_eye_{}", 63)
    er = _pts(lm["right_eye"], "right_eye_{}", 63)
    el.append([lm["left_eye"]["left_eye_pupil_center"]["x"],
               lm["left_eye"]["left_eye_pupil_center"]["y"]])
    er.append([lm["right_eye"]["right_eye_pupil_center"]["x"],
               lm["right_eye"]["right_eye_pupil_center"]["y"]])

    nl = _pts(lm["nose"], "nose_left_{}", 63)
    nr = _pts(lm["nose"], "nose_right_{}", 63)
    nm = _pts(lm["nose"], "nose_midline_{}", 60)
    nl.append([lm["nose"]["left_nostril"]["x"], lm["nose"]["left_nostril"]["y"]])
    nr.append([lm["nose"]["right_nostril"]["x"], lm["nose"]["right_nostril"]["y"]])

    ml, mr = [], []
    for i in range(64):
        u = lm["mouth"][f"upper_lip_{i}"]
        lo = lm["mouth"][f"lower_lip_{i}"]
        dst = ml if (i < 16 or i >= 48) else mr
        dst.extend([[u["x"], u["y"]], [lo["x"], lo["y"]]])

    centerx = (lm["nose"]["nose_left_0"]["x"] + lm["nose"]["nose_right_0"]["x"]) / 2
    centery = (lm["nose"]["nose_left_0"]["y"] + lm["nose"]["nose_right_0"]["y"]) / 2
    return {"el": el, "ml": ml, "ebl": ebl, "nl": nl, "fl": fl,
            "er": er, "mr": mr, "ebr": ebr, "nr": nr, "fr": fr, "nm": nm,
            "centerx": centerx, "centery": centery}


def _rotate_dict(lm_dict: Dict, ang: float, cx0: float, cy0: float) -> None:
    """Rotate all groups (and the center) by -ang about (cx0, cy0)."""
    keys = ["el", "ml", "ebl", "nl", "fl", "er", "mr", "ebr", "nr", "fr", "nm"]
    for k in keys:
        v = np.array(lm_dict[k], np.float64)
        x0 = v[:, 0] - cx0
        y0 = v[:, 1] - cy0
        v[:, 0] = x0 * np.cos(-ang) - y0 * np.sin(-ang) + cx0
        v[:, 1] = x0 * np.sin(-ang) + y0 * np.cos(-ang) + cy0
        lm_dict[k] = v
    x0 = lm_dict["centerx"] - cx0
    y0 = lm_dict["centery"] - cy0
    lm_dict["centerx"] = x0 * np.cos(-ang) - y0 * np.sin(-ang) + cx0
    lm_dict["centery"] = x0 * np.sin(-ang) + y0 * np.cos(-ang) + cy0


def roll_angle(lm_dict: Dict) -> float:
    """Inter-pupil roll angle (pupils are the last point of each eye group)."""
    elc, erc = lm_dict["el"][-1], lm_dict["er"][-1]
    return float(np.arctan(1.0 * (elc[1] - erc[1]) / (elc[0] - erc[0])))


def resize_landmarks(landmarks: np.ndarray, cx: float, cy: float, r: int,
                     load_size: int) -> np.ndarray:
    # dtype-preserving like the reference (data_process/process.py:30-38):
    # face points arrive float32, hair points float64 — byte-identical
    # truncation downstream requires matching the arithmetic precision.
    out = np.array(landmarks)
    out[:, 0] = out[:, 0] - (cx - r)
    out[:, 1] = out[:, 1] - (cy - r)
    out = out * load_size / (r * 2)
    return np.clip(out, 0, load_size - 1).astype(np.float32)


def get_valid_index(er, el, max_index: int) -> Tuple[int, int]:
    """Half-face validity from the eye-x variance ratio (<= 0.2)."""
    el_np, er_np = np.array(el), np.array(er)
    lev, rev = np.var(el_np[:, 0]), np.var(er_np[:, 0])
    r1, r2 = lev / (rev + 1e-10), rev / (lev + 1e-10)
    if r1 > r2 and r2 <= 0.2:
        return (0, max_index // 2)
    if r1 < r2 and r1 <= 0.2:
        return (max_index // 2, max_index)
    return (0, max_index)


def crop_and_resize(img: np.ndarray, cx: int, cy: int, r: int,
                    load_size: int, angle: float = 0.0) -> np.ndarray:
    """Rotate (optional), crop a 2r square at (cx, cy) with zero padding,
    cubic-resize to load_size."""
    h, w = img.shape[:2]
    if angle != 0:
        mat = cv2.getRotationMatrix2D((w // 2, h // 2),
                                      int(angle / np.pi * 180), 1)
        img = cv2.warpAffine(img, mat, (w, h))
    crop = img[max(0, cy - r):cy + r, max(0, cx - r):cx + r]
    pads = [(max(0, r - cy), max(0, cy + r - h)),
            (max(0, r - cx), max(0, cx + r - w))]
    if img.ndim == 3:
        pads.append((0, 0))
    crop = np.pad(crop, pads, "constant")
    return cv2.resize(crop, (load_size, load_size), interpolation=cv2.INTER_CUBIC)


def get_extra_landmarks(fr, fl, key: str, cx: int, cy: int, r: int,
                        max_l: int, mask_face: np.ndarray, load_size: int):
    """Hair/neck points offset outward from the face contour, pose-scaled,
    gated by the face mask.

    Both side families are ALWAYS generated — the reference hard-codes
    ``idx = (0, max_l)`` (data_process/process.py:163) so its per-image
    landmark count is constant and invalid-side points are culled by the
    mask gate alone, never structurally."""
    idx = (0, max_l)
    fr, fl = np.array(fr, np.float64), np.array(fl, np.float64)
    frl, fru = fr[:64], fr[64:]
    fll, flu = fl[64:], fl[:64]
    uy, ly = 1.0, 1.0
    uxr = uxl = lxr = lxl = 1.0
    cam = key.split("_")[3]
    ang = camera2ang(f"{cam[:2]}_{cam[2]}")
    # np.cos of the angle in DEGREES — preserved verbatim from the
    # reference (data_process/process.py:171): the ratio is non-monotonic
    # in |pose| (15->0.22, 45->2.86, 90->0.41) but IS the data format the
    # released model was trained on
    ratio = np.exp(np.cos(ang)) ** 2
    if ang > 0:
        uxr, lxr = uxr / ratio, lxr / ratio
        uxl, lxl = uxl * ratio, lxl * ratio
    elif ang < 0:
        uxr, lxr = uxr * ratio, lxr * ratio
        uxl, lxl = uxl / ratio, lxl / ratio

    step = 10
    pts = []
    for i in range(1, 15):
        if idx[0] == 0:
            pts.append(np.stack([fll[0::step, 0] - i * lxl, fll[0::step, 1]], 1))
            pts.append(np.stack([fll[0::step, 0], fll[0::step, 1] + i * ly], 1))
        if idx[1] == max_l:
            pts.append(np.stack([frl[0::step, 0] + i * lxr, frl[0::step, 1]], 1))
            pts.append(np.stack([frl[0::step, 0], frl[0::step, 1] + i * ly], 1))
    for i in range(1, 20):
        if idx[1] == max_l:
            pts.append(np.stack([fru[0::step, 0], fru[0::step, 1] - i * uy], 1))
            pts.append(np.stack([fru[0::step, 0] + i * uxr, fru[0::step, 1]], 1))
        if idx[0] == 0:
            pts.append(np.stack([flu[0::step, 0], flu[0::step, 1] - i * uy], 1))
            pts.append(np.stack([flu[0::step, 0] - i * uxl, flu[0::step, 1]], 1))
    lm = resize_landmarks(np.vstack(pts), cx, cy, r, load_size).astype(int)

    hit = np.zeros((load_size, load_size))
    hit[lm[:, 1], lm[:, 0]] = 1
    hit = mask_face * hit
    gate = hit[lm[:, 1], lm[:, 0]] > 0
    return gate, lm


def merge(lm_face, lm_hair, idx_face, max_l, gate_hair):
    landmarks = np.vstack([lm_face, lm_hair])
    gate = []
    gate += [1] * (max_l // 2) if idx_face[0] == 0 else [0] * (max_l // 2)
    # Reference quirk preserved verbatim (data_process/process.py:228): the
    # second half is gated on ``idx_face[0] == max_l`` — which is never true
    # (idx_face[0] is 0 or max_l//2) — so the right-half face landmarks are
    # ALWAYS gated out of the landmark loss. The released checkpoints were
    # trained on data produced this way; byte-identical gates require it.
    gate += [1] * (max_l // 2) if idx_face[0] == max_l else [0] * (max_l // 2)
    gate += gate_hair.astype("float32").tolist()
    return landmarks, np.asarray(gate, np.float32)


def process_multipie_image(image_path: str, mask_path: str, lm_json: str,
                           load_size: int = 128,
                           idx_face: Optional[Tuple[int, int]] = None,
                           rot_center=(320, 240)):
    """One image -> (landmarks, gate, idx_face, mask, img)."""
    key = basename(image_path)[:-7]
    lm_dict = parse_facepp_json(lm_json)

    if key.split("_")[3] == "051":  # roll-correct frontals
        ang = roll_angle(lm_dict)
        _rotate_dict(lm_dict, ang, *rot_center)
    else:
        ang = 0.0

    groups = [lm_dict[k] for k in
              ("el", "ml", "ebl", "nl", "fl", "nm", "er", "mr", "ebr", "nr", "fr", "nm")]
    face = np.vstack(groups).astype(np.float32)
    cx, cy = int(lm_dict["centerx"]), int(lm_dict["centery"])
    r = int(max(abs(face[:, 1].max() - cy), abs(face[:, 1].min() - cy)))
    lm_face = resize_landmarks(face, cx, cy, r, load_size)

    img = crop_and_resize(cv2.imread(image_path), cx, cy, r, load_size, ang)
    mask = crop_and_resize(cv2.imread(mask_path), cx, cy, r, load_size, ang)
    mask = np.where(mask[:, :, 0] > 0, 255, 0).astype(np.uint8)

    max_l = face.shape[0]
    if idx_face is None:
        idx_face = get_valid_index(lm_dict["er"], lm_dict["el"], max_l)
    gate_hair, lm_hair = get_extra_landmarks(
        lm_dict["fr"], lm_dict["fl"], key, cx, cy, r, max_l, mask, load_size)
    lm_full, gate_full = merge(lm_face, lm_hair, idx_face, max_l, gate_hair)
    return lm_full, gate_full, idx_face, mask, img


def process_frontal_only(image_path: str, lm_json: str, load_size: int = 128,
                         rot_center=(320, 240), force_roll: bool = False):
    """Test-set variant: crop+roll-correct the image only (reference
    process_multipie_test / process_lfw_test)."""
    key = basename(image_path)
    lm_dict = parse_facepp_json(lm_json)
    is_frontal = force_roll or ("_051_" in key)
    ang = roll_angle(lm_dict) if is_frontal else 0.0
    if is_frontal:
        _rotate_dict(lm_dict, ang, *rot_center)
    groups = [lm_dict[k] for k in
              ("el", "ml", "ebl", "nl", "fl", "nm", "er", "mr", "ebr", "nr", "fr", "nm")]
    face = np.vstack(groups).astype(np.float32)
    cx, cy = int(lm_dict["centerx"]), int(lm_dict["centery"])
    r = int(max(abs(face[:, 1].max() - cy), abs(face[:, 1].min() - cy)))
    return crop_and_resize(cv2.imread(image_path), cx, cy, r, load_size, ang)


def process_multipie_train_split(img_dir: str, mask_dir: str, lm_dir: str,
                                 save_dir: str, load_size: int = 128) -> int:
    """Full train-split driver: writes images/, masks/, landmarks.npy.
    Skips cameras 081/191 like the reference. Returns #pairs written."""
    img_save = join(save_dir, "images")
    mask_save = join(save_dir, "masks")
    os.makedirs(img_save, exist_ok=True)
    os.makedirs(mask_save, exist_ok=True)
    out = {"lm_S": {}, "lm_F": {}, "gate": {}}
    n = 0
    for f in sorted(os.listdir(img_dir)):
        if f.split("_")[3] in ("081", "191"):
            continue
        lm_json = join(lm_dir, basename(f)[:-7] + ".json")
        if not os.path.exists(lm_json):
            continue
        path_s = join(img_dir, f)
        path_f = join(img_dir, s2f(f))
        key_s, key_f = basename(path_s)[:-7], basename(path_f)[:-7]
        mask_s_path = join(mask_dir, key_s + "_07.png")
        mask_f_path = join(mask_dir, key_f + "_07.png")
        lm_json_f = join(lm_dir, key_f + ".json")

        lm_s, gate_s, idx_face, mask_s, img_s = process_multipie_image(
            path_s, mask_s_path, lm_json, load_size)
        lm_f, gate_f, _, mask_f, img_f = process_multipie_image(
            path_f, mask_f_path, lm_json_f, load_size, idx_face=idx_face)
        out["lm_S"][key_s] = lm_s
        out["lm_F"][key_f] = lm_f
        out["gate"][key_s] = gate_s * gate_f
        cv2.imwrite(join(img_save, basename(path_s)), img_s)
        cv2.imwrite(join(img_save, basename(path_f)), img_f)
        cv2.imwrite(join(mask_save, basename(path_s)), mask_s)
        cv2.imwrite(join(mask_save, basename(path_f)), mask_f)
        n += 1
    np.save(join(save_dir, "landmarks.npy"), out, allow_pickle=True)
    return n
